"""Distributed interval-overlap join via time-bucket equi-keys.

Spark has no interval/overlap join operator: the naive spelling
``left JOIN right ON l_start <= r_end AND r_start <= l_end`` has no
equi-key, so Catalyst plans a BroadcastNestedLoopJoin / cartesian —
O(|L|*|R|) and exactly the shape the catalog's plan gates forbid. The
standard scale-out re-expression (the same trick as range-join
bucketing in Spark's own SQL guides) is:

1. explode every interval into the fixed-width time buckets it
   covers (bounded fanout: ceil(duration / bucket) + 1 rows);
2. equi-join on the bucket id — a plain shuffle join Catalyst can
   hash/sort-merge and AQE can skew-split;
3. keep only truly overlapping pairs, and keep each pair ONCE by
   anchoring it to a canonical bucket: the bucket containing the
   overlap's START (``greatest(l_start, r_start)``). A pair sharing
   k buckets matches k times on the equi-key but exactly one match
   survives the anchor predicate — no distinct shuffle needed.

Works in whole microseconds (BIGINT); timestamps must be
non-negative (epoch micros are), because integral ``div`` truncates
toward zero, which equals floor only for non-negative operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__ibucket"


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_us: int,
) -> DataFrame:
    """Inner-join ``left`` and ``right`` on closed-interval overlap
    (``l_start <= r_end AND r_start <= l_end``), each overlapping
    pair exactly once, carrying every column of both inputs.

    ``bucket_us`` trades fanout for key selectivity: pick it near the
    TYPICAL interval duration so each row explodes into a handful of
    buckets while a bucket pairs only temporal neighbors.

    Precondition: rows are meant to be WELL-FORMED intervals
    (start <= end, both non-NULL). Degenerate rows are treated as
    EMPTY — they produce no pairs. Note this is NOT what the raw
    closed-interval predicate would say about an inverted interval
    (``l_start=60, l_end=40`` vs ``[0, 1000]`` satisfies
    ``l_start <= r_end AND r_start <= l_end``!): an oracle stated as
    the naive theta join only matches this operator when the inputs
    respect the precondition — derive interval endpoints as
    MIN/MAX-shaped bounds (ordered by construction) or filter first.
    """
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(
            f"left/right column names must be disjoint, both have: {sorted(dup)}"
        )

    def explode_buckets(df: DataFrame, start: str, end: str) -> DataFrame:
        seq = F.expr(
            f"""
            CASE WHEN {start} IS NULL OR {end} IS NULL
                  OR {end} < {start} THEN array()
                 ELSE sequence({start} div {bucket_us},
                               {end} div {bucket_us}) END
            """
        )
        return df.withColumn(_BUCKET, F.explode(seq))

    lb = explode_buckets(left, l_start, l_end)
    rb = explode_buckets(right, r_start, r_end).withColumnRenamed(
        _BUCKET, _BUCKET + "_r"
    )
    anchor = F.expr(
        f"greatest({l_start}, {r_start}) div {bucket_us} = {_BUCKET}"
    )
    overlap = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    return (
        lb.join(
            rb,
            (F.col(_BUCKET) == F.col(_BUCKET + "_r")) & overlap & anchor,
        )
        .drop(_BUCKET, _BUCKET + "_r")
    )
