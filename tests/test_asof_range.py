"""Temporal-join operators: asof_join / range_join equal their naive
inequality-join formulations while compiling to shuffle-friendly plans."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from mypipe_spark.operators.asof import asof_join, range_join


def _plan(df) -> str:
    jm = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jm)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    # load_tables normalizes the driver parquet's TIMESTAMP(NANOS)
    # column to timestamp_ntz (the raw reader rejects nanos)
    from mypipe_spark.plans.catalog import load_tables

    return load_tables(spark, sf_dir)["events"]


@pytest.fixture(scope="module")
def clicks(events):
    return (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )


@pytest.fixture(scope="module")
def purchases(events):
    return events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )


def _naive_asof(purchases, clicks):
    """Reference semantics via the quadratic inequality join."""
    c = clicks.select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
        "click_id",
    )
    j = purchases.join(
        c, (purchases.user_id == c.cu) & (c.cts <= purchases.ts), "left"
    )
    pick = F.expr("max_by(click_id, struct(cts, click_id))").alias("click_id")
    return j.groupBy("event_id", "user_id", "ts").agg(pick)


def test_asof_join_matches_naive_inequality_join(purchases, clicks):
    got = sorted(
        tuple(r)
        for r in asof_join(purchases, clicks, on="user_id")
        .select("event_id", "user_id", "click_id")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in _naive_asof(purchases, clicks)
        .select("event_id", "user_id", "click_id")
        .collect()
    )
    assert got == want
    assert any(r[2] is not None for r in got)  # non-degenerate
    assert any(r[2] is None for r in got)  # left-join semantics exercised


def test_asof_join_tolerance_nulls_stale_matches(purchases, clicks):
    tol = 3600.0  # 1 hour
    rows = (
        asof_join(purchases, clicks, on="user_id", tolerance_seconds=tol)
        .join(
            asof_join(purchases, clicks, on="user_id").select(
                "event_id", F.col("click_id").alias("raw_click_id")
            ),
            "event_id",
        )
        .collect()
    )
    cts = {
        (r["user_id"], r["click_id"]): r["ts"]
        for r in clicks.select(
            "user_id", "click_id", "ts"
        ).collect()
    }
    n_stale = 0
    for r in rows:
        if r["raw_click_id"] is None:
            assert r["click_id"] is None
            continue
        age = (
            r["ts"] - cts[(r["user_id"], r["raw_click_id"])]
        ).total_seconds()
        if age > tol:
            assert r["click_id"] is None
            n_stale += 1
        else:
            assert r["click_id"] == r["raw_click_id"]
    assert n_stale > 0  # the tolerance actually fired


def test_asof_join_null_right_value_not_stitched_from_older_row(spark):
    """A NULL in one right value column must come back NULL — the match
    is the whole nearest-preceding right row, never a composite with
    that column carried from an older row. Also pins the tolerance test
    to the matched row's own timestamp."""
    rdf = spark.createDataFrame(
        [(1, 10, 5, "x"), (1, 20, None, "y")],
        "k int, t int, a int, b string",
    )
    ldf = spark.createDataFrame([(1, 25, 99)], "k int, t int, lid int")
    row = asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t").collect()[0]
    assert row["b"] == "y"
    assert row["a"] is None  # NOT 5 stitched from the ts=10 row

    # tolerance uses the matched row's ts (20, age 5) — not the older
    # row some column might have been stitched from
    row = asof_join(
        ldf, rdf, on="k", left_ts="t", right_ts="t", tolerance_seconds=6.0
    ).collect()[0]
    assert row["b"] == "y" and row["a"] is None
    row = asof_join(
        ldf, rdf, on="k", left_ts="t", right_ts="t", tolerance_seconds=2.0
    ).collect()[0]
    assert row["b"] is None and row["a"] is None


def test_asof_join_rejects_column_collision(purchases, clicks):
    with pytest.raises(ValueError):
        asof_join(
            purchases,
            clicks.withColumnRenamed("click_id", "event_id"),
            on="user_id",
        )


@pytest.fixture(scope="module")
def intervals(purchases):
    """Per-user intervals: [purchase_ts, purchase_ts + 2h)."""
    return purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )


def test_range_join_matches_naive_inequality_join(spark, events, intervals):
    points = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    got = sorted(
        (r["event_id"], r["interval_id"])
        for r in range_join(
            points, intervals, "ts", "start_ts", "end_ts",
            on="user_id", bucket_seconds=3600,
        ).collect()
    )
    naive = points.join(
        intervals.withColumnRenamed("user_id", "iu"),
        (points.user_id == F.col("iu"))
        & (points.ts >= F.col("start_ts"))
        & (points.ts < F.col("end_ts")),
    )
    want = sorted(
        (r["event_id"], r["interval_id"]) for r in naive.collect()
    )
    assert got == want
    assert got  # non-degenerate


def test_range_join_plan_is_equi_not_nested_loop(spark, events, intervals):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        points = events.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        plan = _plan(
            range_join(
                points, intervals, "ts", "start_ts", "end_ts",
                on="user_id", bucket_seconds=3600,
            )
        )
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in plan
        m = re.search(r"hashpartitioning\(([^)]*)\)", plan)
        assert m and "__range_bucket" in m.group(1)

        # contrast: the naive inequality join without any equi-key IS
        # a nested loop — the shape range_join exists to avoid
        naive = points.join(
            intervals.select("interval_id", "start_ts", "end_ts"),
            (points.ts >= F.col("start_ts")) & (points.ts < F.col("end_ts")),
        )
        naive_plan = _plan(naive)
        assert (
            "BroadcastNestedLoopJoin" in naive_plan
            or "CartesianProduct" in naive_plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_asof_join_randomized_vs_python_reference(spark):
    """Randomized equivalence against a pure-Python backward as-of
    scan, covering shapes the fixture data may not hit: duplicate left
    timestamps, keys with no reference rows, exact-tie matches."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        rights = [
            (rng.randrange(6), rng.randrange(100), i)  # key, ts, val
            for i in range(40)
        ]
        # collapse (key, ts) dups like the operator contract requires
        best = {}
        for k, ts, v in rights:
            best[(k, ts)] = max(best.get((k, ts), -1), v)
        rights = [(k, ts, v) for (k, ts), v in best.items()]
        lefts = [
            (rng.randrange(8), rng.randrange(100), 1000 + i)  # key, ts, id
            for i in range(60)
        ]
        ldf = spark.createDataFrame(
            [(k, ts, i) for k, ts, i in lefts], "k int, t int, lid int"
        )
        rdf = spark.createDataFrame(
            [(k, ts, v) for k, ts, v in rights], "k int, t int, val int"
        )
        got = {
            r["lid"]: r["val"]
            for r in asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t").collect()
        }
        for k, ts, lid in lefts:
            eligible = [(rts, v) for rk, rts, v in rights if rk == k and rts <= ts]
            want = max(eligible)[1] if eligible else None
            assert got[lid] == want, (seed, k, ts, lid)
