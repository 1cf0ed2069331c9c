"""As-of and range joins — temporal operators Spark lacks natively.

The reference performs no joins at all (SURVEY.md §2.3); these are the
two temporal join shapes a change-stream consumer asks for first
("what was the reference value when this event happened", "which
events fall inside this interval"), built as compositions of existing
DataFrame ops in their scalable forms:

- ``asof_join``: union both sides tagged, sort once within key
  partitions, carry the reference row forward with a running
  last-non-null window. One shuffle on the key, linear work per
  partition — never the per-key-quadratic inequality-join rewrite.
- ``range_join``: quantize time into fixed buckets; the interval side
  explodes into the buckets it overlaps, the point side hashes into
  one — turning the inequality predicate into an equi-join on
  (key, bucket) plus a residual filter. Shuffle-partitioned like any
  equi-join; never a nested-loop join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_KIND = "__asof_kind"
_BUCKET = "__range_bucket"


def _secs(col: F.Column) -> F.Column:
    """Epoch seconds from timestamp / timestamp_ntz / numeric columns.
    timestamp_ntz has no direct double cast; route via timestamp —
    exact, since the engine session timezone is pinned UTC
    (mypipe_spark.session.get_spark)."""
    return col.cast("timestamp").cast("double")


def _micros(col: F.Column) -> F.Column:
    """Epoch MICROSECONDS as a BIGINT — the exact form for boundary
    comparisons. A double epoch-second at ~1.7e9 carries ~1.2e-7 s of
    representation error, enough to flip a staleness test for a pair
    exactly at the tolerance (the oracle-gate flake class); integer
    micros are the timestamp's native precision, no rounding at
    all."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the latest ``right`` row of the
    same key with ``right_ts`` at-or-before ``left_ts`` (backward
    as-of, inclusive). Right value columns come back null when no
    reference row precedes the event (left-join semantics).

    ``tolerance_seconds`` additionally nulls matches older than the
    tolerance (pandas ``merge_asof`` semantics).

    Ties: a right row at exactly ``left_ts`` matches. If several right
    rows share (key, ts), pre-collapse them first (e.g. groupBy max) —
    otherwise which one wins is unspecified, same as pandas.

    All matched columns come from the *same* right row (the reference
    is carried as one struct), so a NULL in one right value column is
    returned as-is rather than stitched from an older row, and the
    tolerance test uses that same row's timestamp.

    NULL join keys never match (SQL/merge_asof semantics): a left row
    with a NULL key keeps left-join NULLs in the right value columns,
    and a right row with a NULL key is never carried — round-8 review:
    Window.partitionBy groups NULLs into ONE partition, so NULL keys
    previously matched each other, diverging from every join-stated
    oracle.

    Scale: one exchange hash-partitions both sides by ``on``; the
    window is a single sort + linear scan per partition. Carried state
    never exceeds one row (the running reference), so hot keys cost
    sort time, not memory."""
    keys = [on] if isinstance(on, str) else list(on)
    lvals = [c for c in left.columns if c not in keys and c != left_ts]
    rvals = [c for c in right.columns if c not in keys and c != right_ts]
    # a right value column named like a LEFT value column OR like the
    # output timestamp would emit two same-named columns (the round-8
    # review case: right carries its own 'ts' beside right_ts); the
    # internal tag names are reserved on both sides
    reserved = {"__t", "__rt", "__ref", _KIND}
    overlap = (set(rvals) & (set(lvals) | {left_ts})) | (
        (set(rvals) | set(lvals)) & reserved
    )
    if overlap:
        raise ValueError(f"rename overlapping right columns: {sorted(overlap)}")
    # NULL-keyed reference rows must never be carried: drop them here
    # (NULL-keyed LEFT rows still flow — their partition simply has no
    # references, so the right values come back NULL, the left-join
    # contract)
    r_nonnull = right
    for k in keys:
        r_nonnull = r_nonnull.filter(F.col(k).isNotNull())
    right = r_nonnull

    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias(_KIND),
        F.col(right_ts).alias("__rt"),
        *[F.col(c) for c in rvals],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lvals],
    )
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias(_KIND),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rvals],
        *[F.col(c) for c in lvals],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", _KIND)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the whole right row as ONE struct (null on left-tagged rows,
    # so ignorenulls skips them): every matched column and the timestamp
    # used for the tolerance test come from the same right row — never a
    # composite stitched from different rows when some value is NULL.
    ref = F.when(
        F.col(_KIND) == 0,
        F.struct(F.col("__rt").alias("__rt"), *[F.col(c).alias(c) for c in rvals]),
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        F.last(ref, ignorenulls=True).over(w).alias("__ref"),
    )
    out = carried.filter(F.col(_KIND) == 1)
    if tolerance_seconds is not None:
        # integer-microsecond staleness test: exact at the tolerance
        # boundary where the float-second form could round past it
        stale = (
            _micros(F.col("__t")) - _micros(F.col("__ref.__rt"))
        ) > int(round(tolerance_seconds * 1_000_000))
        picked = [
            F.when(stale, F.lit(None)).otherwise(F.col(f"__ref.{c}")).alias(c)
            for c in rvals
        ]
    else:
        picked = [F.col(f"__ref.{c}").alias(c) for c in rvals]
    return out.select(
        *keys, F.col("__t").alias(left_ts), *[F.col(c) for c in lvals], *picked
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: str | list[str] | None = None,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner-join ``left`` points to ``right`` intervals:
    ``right_start <= left_ts < right_end`` (plus optional equi-keys
    ``on``). The interval side explodes into every bucket of width
    ``bucket_seconds`` it overlaps; the point side computes its single
    bucket — the join becomes an equi-join on (keys, bucket) with the
    exact range predicate as a residual filter.

    Pick ``bucket_seconds`` near the typical interval length: the
    explode factor is ~len(interval)/bucket + 1, and the bucket
    equi-join prunes everything farther apart than one bucket. Compare
    the naive formulation — a pure inequality join that Spark can only
    execute as a nested-loop — which this never produces (asserted in
    tests)."""
    # same input guards as the sibling bucketed_interval_join
    # (operators/intervals.py) — round-8 review: bucket_seconds<=0
    # previously produced NULL buckets on both sides and a silently
    # EMPTY join, and shared non-key column names surfaced later as
    # AMBIGUOUS_REFERENCE at the residual filter
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be >= 1 (got {bucket_seconds})")
    keys = [on] if isinstance(on, str) else list(on or [])
    shared = (set(left.columns) & set(right.columns)) - set(keys)
    if shared:
        raise ValueError(
            f"rename columns present on both sides: {sorted(shared)}"
        )
    lb = left.withColumn(
        _BUCKET, F.floor(_secs(F.col(left_ts)) / bucket_seconds)
    )
    # inverted/NULL-interval guard (round-10 review, mirroring
    # intervals.py): one corrupt row with right_end < right_start
    # would otherwise explode into a huge DESCENDING bucket sequence
    # (Spark's sequence(a, b) auto-steps -1 when a > b — ~500k
    # elements for a zeroed-sentinel end at bucket_seconds=3600).
    # Filtering is exact for this inner join: the residual
    # ts >= start AND ts < end discards every such row anyway.
    rb = right.filter(
        F.col(right_start).isNotNull()
        & F.col(right_end).isNotNull()
        & (F.col(right_end) >= F.col(right_start))
    ).withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(_secs(F.col(right_start)) / bucket_seconds),
                F.floor(_secs(F.col(right_end)) / bucket_seconds),
            )
        ),
    )
    joined = lb.join(rb, keys + [_BUCKET]).filter(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) < F.col(right_end))
    )
    return joined.drop(_BUCKET)
