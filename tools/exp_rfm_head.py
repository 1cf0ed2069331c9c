"""Round-11 A/B: events_rfm_segments' broadcast head aggregate.

Hypothesis (guide §2.4 — remove shuffles outright): the recency
anchor ``head_us = MAX(last_us) OVER u`` is a max of per-user maxes,
so it equals the plain ``MAX(us)`` over the pre-aggregation purchase
rows.  The current form derives it from ``u`` (the per-user groupBy),
and because exact_ntile_multi plans the base relation once in the
eager boundary sketch plus twice in-plan (count side + ranking side),
every action pays THREE extra corpus groupBy-user exchanges purely to
re-derive a global max the scan already knows.  The collapsed form
keeps the scan but drops the groupBy from the head branch: a
map-side-combinable 1-row max, no exchange beyond the single-row
final aggregate.

Interleaved same-session A/B (the round's host-noise discipline),
noop action; bit-identity asserted at the end.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from mypipe_spark.operators.scale import exact_ntile_multi
from mypipe_spark.plans.analytics import _RFM_TILES, _US_PER_DAY
from mypipe_spark.plans.catalog import (
    MICRO_SPLIT_MASK,
    MICRO_SPLIT_SHIFT,
    load_tables,
    micro_long_col,
    micro_split_total_col,
    round_div_sql,
)
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-rfm-head")
spark.sparkContext.setLogLevel("ERROR")


def rfm(head_from_p: bool):
    p = load_tables(spark, sf_dir)["events"].filter(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        micro_long_col(F.col("value")).alias("vm"),
    )
    u = p.groupBy("user_id").agg(
        F.max("us").alias("last_us"),
        F.count(F.lit(1)).alias("freq"),
        F.sum("vm").alias("mon"),
    )
    if head_from_p:
        head = p.agg(F.max("us").alias("head_us"))
    else:
        head = u.agg(F.max("last_us").alias("head_us"))
    u2 = u.crossJoin(F.broadcast(head)).select(
        "user_id",
        F.expr(f"(head_us - last_us) div {_US_PER_DAY}").alias("recency_days"),
        "freq",
        "mon",
    )
    q = exact_ntile_multi(
        u2,
        _RFM_TILES,
        [
            ("r_q", ["recency_days", "user_id"]),
            ("f_q", ["freq", "user_id"]),
            ("m_q", ["mon", "user_id"]),
        ],
    )
    return q.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.expr(
            round_div_sql(
                "CAST(SUM(recency_days) AS DECIMAL(38,0))", "COUNT(*)", "div"
            )
        )
        .cast("long")
        .alias("avg_recency_days"),
        (
            micro_split_total_col(
                F.sum(F.shiftright(F.col("mon"), MICRO_SPLIT_SHIFT)),
                F.sum(F.col("mon").bitwiseAND(F.lit(MICRO_SPLIT_MASK))),
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("total_monetary"),
    ).select(
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .cast("int")
        .alias("segment"),
        "n_users",
        "avg_recency_days",
        "total_monetary",
    )


variants = {"old": False, "new": True}
t = {k: [] for k in variants}
rounds = int(os.environ.get("EXP_ROUNDS", "9"))
# one untimed build each to pay codegen/sketch warmup outside the A/B
for name, flag in variants.items():
    rfm(flag).write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for name, flag in variants.items():
        spark.sparkContext.setJobDescription(f"exp_rfm_head:{name}")
        t0 = time.perf_counter()
        # fn() re-built per repeat: the eager boundary sketch is part
        # of the query's honest per-run cost
        rfm(flag).write.format("noop").mode("overwrite").save()
        t[name].append(round(time.perf_counter() - t0, 3))
for name, runs in t.items():
    print(
        f"{name:4s} min={min(runs):6.3f}"
        f" med={sorted(runs)[len(runs) // 2]:6.3f} {runs}"
    )
same = sorted(map(tuple, rfm(False).collect())) == sorted(
    map(tuple, rfm(True).collect())
)
print("identical:", same)
