"""Scale toolkit: shuffle-elimination and skew-mitigation helpers.

The reference never joins (SURVEY.md §2.3), so it never faces the two
dominant costs of a 100 TB join: the shuffle itself and the straggler
partition a hot key creates. These helpers package the standard Spark
remedies so pipelines built on this engine apply them declaratively:

- ``write_bucketed`` / co-located reads: pre-shuffle a table ONCE at
  write time (hash-bucketed by join key, sorted within buckets); every
  later join/aggregation on that key reads bucket-aligned partitions
  and skips its exchange entirely (proved by plan assertion in
  tests/test_scale.py).
- ``salted_join``: spread each hot key over ``n_salt`` sub-keys by
  salting the skewed side and replicating the other side, bounding the
  largest shuffle partition at 1/n_salt of the hot key's rows. AQE's
  skew-join handles most cases automatically (split-on-read of
  oversized partitions); explicit salting remains the tool when one
  key exceeds what a single task can hold even post-split, or when
  AQE is unavailable (e.g. inside a streaming foreachBatch).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) by ``key``.

    This is the pay-once side of shuffle elimination: two tables
    bucketed by their join key with the same bucket count join with
    NO exchange on either side — the scan itself is the partitioning.
    The parquet files land at ``path``; the table is registered in the
    session catalog under ``table`` (external, so dropping the table
    keeps the files)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.option("path", path).format("parquet").saveAsTable(table)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (the side with hot keys) to ``other`` on the
    equi-key(s) ``on``, spreading every key across ``n_salt`` shuffle
    sub-partitions.

    The skewed side gets a uniform random salt in [0, n_salt); the
    other side is replicated once per salt value via an exploded
    sequence (so its shuffle volume grows n_salt×: keep ``other`` the
    smaller side, and prefer plain broadcast when it fits). Supported
    ``how``: inner / left / left_semi / left_anti — the salted column
    pair extends the equi-join, which preserves exactly those
    semantics; right/full would need the salt on the other side.

    The salt is drawn with a fixed seed: correctness never depends on
    WHICH salt a row gets (every salt value of a key meets every
    replicated row of that key), so task retries re-drawing a
    different value are harmless."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    left = skewed.withColumn(_SALT, (F.rand(42) * n_salt).cast("int"))
    right = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    joined = left.join(right, keys + [_SALT], how)
    return joined.drop(_SALT)


def exact_ntile(
    df: DataFrame,
    k: int,
    order_cols: list[str],
    partitions: int | None = None,
    out_col: str = "ntile",
) -> DataFrame:
    """Distributed exact NTILE(k) over a GLOBAL ordering — the
    scale-safe form of ``ntile(k).over(Window.orderBy(...))``, which
    Spark plans as a single-partition window (the whole table sorts
    through one task; the one operator shape that cannot survive a
    100x scale-up).

    Single-axis convenience over :func:`exact_ntile_multi` — ONE
    implementation of the two-pass distributed ranking (round-8
    review retired this function's older eager localCheckpoint +
    per-partition-count form, whose partition-assignment determinism
    hazard and two build jobs the multi-axis operator was explicitly
    designed to remove; every contract — bit-equality with the window
    NTILE, NULLS FIRST, strict-total-order requirement — now lives in
    one place).

    ``order_cols`` must be a strict total order (include a unique
    tiebreak column) — the same requirement that makes the
    single-partition NTILE deterministic in the first place.

    NOTE: construction still runs ONE driver job when called (the
    shared boundary sketch; see exact_ntile_multi) — callers composing
    lazy pipelines should use :func:`exact_ntile_fn`."""
    return exact_ntile_multi(df, k, [(out_col, order_cols)], partitions)


def exact_ntile_fn(
    k: int,
    order_cols: list[str],
    partitions: int | None = None,
    out_col: str = "ntile",
) -> Callable[[DataFrame], DataFrame]:
    """Deferred form of :func:`exact_ntile` for callers that COMPOSE
    pipelines rather than execute them immediately (foreachBatch
    bodies, repeatedly-rebuilt plans): returns a ``df -> DataFrame``
    closure, so the eager two-job offset computation (range-partition
    materialize + P-scalar collect) is paid when the closure runs on a
    concrete batch — by construction per EXECUTION, never at pipeline
    build. Building the closure itself runs zero Spark jobs (pinned by
    tests/test_scale.py). Typical use::

        bucketize = exact_ntile_fn(10, ["balance", "id"])
        stream.writeStream.foreachBatch(
            lambda batch, _id: sink(bucketize(batch))).start()
    """
    def apply(df: DataFrame) -> DataFrame:
        return exact_ntile(df, k, order_cols, partitions, out_col)

    return apply


def exact_ntile_multi(
    df: DataFrame,
    k: int,
    axes: list[tuple[str, list[str]]],
    partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE(k) over SEVERAL independent global orderings of the
    same relation, for ONE driver job at build — the multi-axis form
    :func:`exact_ntile` callers (RFM segmentation: recency, frequency,
    monetary) would otherwise pay two eager jobs PER AXIS for.

    ``axes`` is ``[(out_col, order_cols), ...]`` where
    ``order_cols[0]`` is the axis's numeric ranking key and the rest
    the unique tiebreak (same strict-total-order requirement as
    exact_ntile).

    Mechanism — same two-pass distributed ranking idea, restructured
    so everything data-dependent is IN-PLAN:

    1. ONE aggregate collects approximate quantile boundaries for ALL
       axes (percentile_approx is a mergeable sketch — this is the
       sampling pass of a classic distributed sort). The boundaries
       only need to BALANCE the buckets, never to be exact: they are
       frozen into the plan as literals, so every subtree that
       derives a row's coarse bucket derives the identical one — no
       localCheckpoint, and no reliance on exchange reuse, is needed
       for the two passes to agree (the exact_ntile determinism
       hazard this operator retires).
    2. Per axis, the coarse bucket is ``Σ[key > boundary]`` (monotone
       in the key, so buckets are contiguous key ranges); per-bucket
       counts roll up map-side, prefix-sum through a window over the
       ~P count rows (index metadata, not data), and broadcast back.
       global rank = bucket offset + per-bucket row_number; the
       NTILE bucket follows from pure integer arithmetic
       (``ceil(a/b) = (a+b-1) div b`` — engine-exact, no doubles).

    Scale shape: one boundary-sketch pass over the relation at build,
    then per axis one map-side-combinable count aggregate, one
    broadcast join, and one window sort partitioned by the ~P coarse
    buckets — never a single-partition window over the data. NULL
    ranking keys land in the lowest bucket and rank first, matching
    Spark's ascending NULLS FIRST window order (callers comparing
    against engines that default NULLS LAST must pre-filter, the
    house convention)."""
    from pyspark.sql import Window

    P = partitions or df.sparkSession.sparkContext.defaultParallelism
    fracs = [i / P for i in range(1, P)]
    # P == 1 → no interior boundaries to sketch: skip the collect
    # entirely and let every axis take the lit(0) single-bucket path
    # (percentile_approx over an empty F.array() would otherwise lean
    # on array<null>→array<double> coercion for a discarded aggregate
    # — an analysis-failure risk on single-core sessions)
    bounds_row = (
        df.agg(
            *[
                F.percentile_approx(
                    order_cols[0],
                    F.array(*[F.lit(f) for f in fracs]),
                    F.lit(10_000),
                ).alias(f"_b{i}")
                for i, (_out, order_cols) in enumerate(axes)
            ]
        ).collect()[0]
        if fracs
        else None
    )

    def _bound_lit(b) -> str:
        # typed SQL literals so the frozen boundaries compare exactly:
        # longs stay integral (L), decimals stay decimal (BD), floats
        # round-trip through repr
        import decimal

        if isinstance(b, bool):
            raise TypeError("boolean ranking keys are not orderable buckets")
        if isinstance(b, int):
            return f"{b}L"
        if isinstance(b, decimal.Decimal):
            return f"{b}BD"
        return f"CAST('{b!r}' AS DOUBLE)"

    out = df
    for i, (out_col, order_cols) in enumerate(axes):
        key = order_cols[0]
        bounds = (
            sorted({b for b in (bounds_row[f"_b{i}"] or []) if b is not None})
            if bounds_row is not None
            else []
        )
        if bounds:
            # NO lambdas here, by hard-won necessity: the offs subtree
            # and the assignment subtree both contain the base
            # relation, and when their join is analyzed Spark's
            # DeduplicateRelations rewrites one branch's attribute
            # ids — references nested under a HigherOrderFunction
            # (filter/transform lambda) are left behind and the plan
            # dies with INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND (at
            # analysis with a python-built lambda, at RUNTIME with an
            # expr-built one — both observed; pinned by
            # tests/test_scale.py's raw-relation and NULL-key cases).
            # A flat CASE sum survives the rewrite and codegens fine
            # at any realistic P. NULL keys fail every comparison and
            # land in bucket 0, ranking first (NULLS FIRST).
            bucket = F.expr(
                "("
                + " + ".join(
                    f"(CASE WHEN {key} > {_bound_lit(b)} THEN 1 ELSE 0 END)"
                    for b in bounds
                )
                + ")"
            )
        else:  # P == 1 or empty input: one coarse bucket
            bucket = F.lit(0)
        bk, off, tot, rk = f"_bk{i}", f"_off{i}", f"_n{i}", f"_rk{i}"
        out = out.withColumn(bk, bucket)
        # counts from the ORIGINAL relation, not the progressively
        # joined `out`: the bucket depends only on base columns and
        # frozen literals, and building axis i's counts on `out`
        # would nest every earlier axis's join/offset subtree inside
        # it (re-deriving the whole chain per axis absent exchange
        # reuse) for identical numbers
        counts = df.withColumn(bk, bucket).groupBy(bk).agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        # one partition+order spec for both frames so the prefix sum
        # and the total fuse into a SINGLE Window node over the ~P
        # count rows (a second spec would add a whole extra Window)
        wp = Window.partitionBy(F.lit(0)).orderBy(bk)
        offs = counts.select(
            bk,
            F.coalesce(
                F.sum("_cnt").over(
                    wp.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias(off),
            F.sum("_cnt")
            .over(
                wp.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias(tot),
        )
        rank = F.col(off) + F.row_number().over(
            Window.partitionBy(bk).orderBy(*order_cols)
        )
        # NTILE arithmetic on exact ranks: with n rows the first
        # n mod k buckets take (n div k)+1 rows, the rest n div k —
        # all-integer ceil division (ceil(a/b) = (a+b-1) div b) keeps
        # the buckets bit-identical to the window function.
        ntile = F.expr(
            f"CAST(CASE WHEN {rk} <= ({tot} % {k}) * ({tot} div {k} + 1)"
            f" THEN ({rk} + {tot} div {k}) div ({tot} div {k} + 1)"
            f" ELSE {tot} % {k}"
            f"  + ({rk} - ({tot} % {k}) * ({tot} div {k} + 1)"
            f"     + greatest({tot} div {k}, 1) - 1)"
            f"    div greatest({tot} div {k}, 1)"
            f" END AS INT)"
        )
        out = (
            out.join(F.broadcast(offs), bk)
            .withColumn(rk, rank)
            .withColumn(out_col, ntile)
            .drop(bk, off, tot, rk)
        )
    return out
