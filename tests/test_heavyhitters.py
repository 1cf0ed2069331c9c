"""Misra-Gries mergeable summary — the algebra the oracle claim of
events_heavy_hitters rests on (operators/heavyhitters.py)."""

from __future__ import annotations

import random
from collections import Counter

from mypipe_spark.operators.heavyhitters import mg_add, mg_fold


def _check_bound(stream, k):
    """estimate in [true - W/(k+1), true] for EVERY item, and every
    item with true count > W/(k+1) present — on the summary built by
    a random binary merge tree over a random partitioning (the shapes
    Spark actually produces)."""
    true = Counter(stream)
    W = len(stream)
    # random partition -> per-partition folds -> random-order merges
    parts = [[] for _ in range(random.randint(1, 8))]
    for x in stream:
        parts[random.randrange(len(parts))].append(x)
    summaries = [mg_fold(((x, 1) for x in p), k) for p in parts]
    while len(summaries) > 1:
        random.shuffle(summaries)
        a, b = summaries.pop(), summaries.pop()
        for item, c in b.items():
            mg_add(a, item, c, k)
        summaries.append(a)
    s = summaries[0] if summaries else {}
    assert len(s) <= k
    bound = W / (k + 1)
    for item, t in true.items():
        est = s.get(item, 0)
        assert est <= t, (item, est, t)
        assert est >= t - bound - 1e-9, (item, est, t, bound)
        if t > bound:
            assert item in s, (item, t, bound, s)


def test_deficit_bound_random_streams_and_merge_shapes():
    rng = random.Random(20260815)
    random.seed(20260815)
    for trial in range(40):
        k = rng.choice([1, 2, 3, 4, 8])
        n = rng.randint(1, 400)
        # mixed skew: a few hot items over a long uniform tail
        universe = [f"hot{i}" for i in range(3)] + [
            f"cold{i}" for i in range(50)
        ]
        weights = [30, 20, 10] + [1] * 50
        stream = rng.choices(universe, weights=weights, k=n)
        _check_bound(stream, k)


def test_eviction_path_recovers_planted_heavy():
    """k far below the distinct count forces constant evictions; the
    planted majority item must still survive every shape."""
    random.seed(7)
    stream = ["heavy"] * 300 + [f"noise{i}" for i in range(200)]
    random.shuffle(stream)
    for _ in range(10):
        _check_bound(stream, 2)


def test_weighted_updates_match_unary_expansion():
    """mg_add with weight w must equal w repeated unit updates when no
    eviction intervenes, and stay within the bound when they do."""
    s1, s2 = {}, {}
    for item, w in [("a", 5), ("b", 3), ("a", 2)]:
        mg_add(s1, item, w, 4)
        for _ in range(w):
            mg_add(s2, item, 1, 4)
    assert s1 == s2 == {"a": 7, "b": 3}


def test_null_item_is_one_counter(spark):
    """NULL is a single first-class item end-to-end: the distributed
    summary counts None once (not one NaN key per batch), and the
    catalog query's NULL-safe membership probe reports a heavy NULL
    type as in_summary=TRUE."""
    from mypipe_spark.operators.heavyhitters import mg_summary
    from mypipe_spark.plans.catalog import QUERIES, all_queries
    from mypipe_spark.plans import analytics as AN
    from tests.test_newops import _planted_tables

    all_queries()
    rows = [(i, None, i % 3, None if i % 2 else "click", None, None)
            for i in range(40)]
    ev = spark.createDataFrame(
        rows,
        "event_id int, ts timestamp_ntz, user_id int, event_type string,"
        " value double, props string",
    ).repartition(6)
    summ = {r["event_type"]: r["cnt"]
            for r in mg_summary(ev, "event_type", 4).collect()}
    assert summ == {None: 20, "click": 20}
    with _planted_tables([AN], {"events": ev}):
        got = {
            r["event_type"]: (r["exact_cnt"], r["in_summary"])
            for r in QUERIES["events_heavy_hitters"].fn(spark, "x").collect()
        }
    assert got == {None: (20, True), "click": (20, True)}


def test_mg_stream_fold_keeps_deficit_bound(spark, sf_dir, tmp_path):
    """Streaming accumulation: events replayed as a file stream, each
    microbatch reduced to its own MG summary and appended to a
    partial store; merging the store must satisfy the SAME deficit
    bound as the batch summary (contents are partition-shape
    dependent — the bound, not the rows, is the contract) and must
    recover every heavy event type."""
    from pyspark.sql import functions as F

    from conftest import drain_stream
    from mypipe_spark.operators.heavyhitters import (
        mg_merge_summaries,
        mg_summary,
    )

    k = 4
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "src")
    store = str(tmp_path / "parts")
    ev.repartition(4).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)

    def fold(batch, epoch):
        mg_summary(batch, "event_type", k).withColumn(
            "epoch", F.lit(epoch)
        ).write.mode("append").parquet(store)

    q = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    drain_stream(q)
    merged = {
        r["event_type"]: r["cnt"]
        for r in mg_merge_summaries(
            spark.read.parquet(store).drop("epoch"), "event_type", k
        ).collect()
    }
    true = {
        r["event_type"]: r["c"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    W = sum(true.values())
    assert len(merged) <= k
    for item, t in true.items():
        est = merged.get(item, 0)
        assert 0 <= t - est <= W / (k + 1), (item, est, t)
        if t * (k + 1) > W:
            assert item in merged
