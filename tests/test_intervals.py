"""Bucketed interval-overlap join (operators/intervals.py): exact
pair semantics (closed intervals, boundary touch, multi-bucket pairs
exactly once), degenerate inputs, and the no-cartesian plan shape."""

from __future__ import annotations

import pytest

from mypipe_spark.operators.intervals import bucketed_interval_join

BUCKET = 10  # tiny bucket so planted intervals span several


def _join(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "lid int, ls long, le long")
    right = spark.createDataFrame(right_rows, "rid int, rs long, re long")
    return bucketed_interval_join(left, right, "ls", "le", "rs", "re", BUCKET)


def test_overlap_pairs_exact_and_deduped(spark):
    """A pair sharing MANY buckets must surface exactly once (the
    overlap-start anchor, not a distinct); boundary touch counts
    (closed intervals); disjoint pairs never pair."""
    left = [
        (1, 0, 35),    # spans buckets 0..3
        (2, 100, 100), # point interval
        (3, 200, 210),
    ]
    right = [
        (10, 5, 95),    # overlaps 1 across 4 shared buckets
        (11, 35, 40),   # touches 1 exactly at 35
        (12, 100, 100), # touches 2 exactly (point-point)
        (13, 300, 310), # disjoint from all
    ]
    rows = _join(spark, left, right).select("lid", "rid").collect()
    got = sorted((r["lid"], r["rid"]) for r in rows)
    assert got == [(1, 10), (1, 11), (2, 12)]
    # exactly once each — no multiplicity from shared buckets
    assert len(got) == len(set(got))


def test_degenerate_intervals_produce_no_pairs(spark):
    """NULL-ended and inverted intervals are EMPTY by contract —
    note the inverted (60, 40) row would satisfy the raw predicate
    against [0, 1000]; the operator's docstring owns that departure
    (well-formed inputs are the caller's precondition)."""
    rows = _join(
        spark,
        [(1, None, 50), (2, 50, None), (3, 60, 40)],  # NULLs, end<start
        [(10, 0, 1000)],
    ).collect()
    assert rows == []


def test_join_matches_naive_theta_join(spark):
    """Randomized planted set: the bucketed join equals the naive
    O(n^2) overlap predicate row-for-row."""
    import random

    rnd = random.Random(7)
    left = [
        (i, s := rnd.randrange(0, 500), s + rnd.randrange(0, 60))
        for i in range(60)
    ]
    right = [
        (1000 + i, s := rnd.randrange(0, 500), s + rnd.randrange(0, 25))
        for i in range(60)
    ]
    got = sorted(
        (r["lid"], r["rid"])
        for r in _join(spark, left, right).select("lid", "rid").collect()
    )
    want = sorted(
        (lid, rid)
        for (lid, ls, le) in left
        for (rid, rs, re) in right
        if ls <= re and rs <= le
    )
    assert got == want and len(want) > 50


def test_plan_is_equi_join_no_cartesian(spark):
    df = _join(spark, [(1, 0, 35)], [(10, 5, 95)])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_input_validation(spark):
    left = spark.createDataFrame([(1, 0, 1)], "a int, s long, e long")
    with pytest.raises(ValueError):
        bucketed_interval_join(left, left, "s", "e", "s", "e", 10)
    right = left.toDF("b", "rs", "re")
    with pytest.raises(ValueError):
        bucketed_interval_join(left, right, "s", "e", "rs", "re", 0)
