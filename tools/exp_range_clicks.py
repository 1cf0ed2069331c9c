"""Round-12 A/B: q_range_clicks_after_purchase — pre-filter the click
side before the bucketed interval join (r11 verdict Next-round #5,
guide §3.2).

The cost driver is the materialized pair volume plus the (user,
bucket) equi-join shuffle of the full click stream. If many click
users have no purchase at all, a semi-join (the PySpark stand-in for
a Bloom filter — guide §3.2's "broadcast semi-join on the distinct
keys when they fit") drops those clicks BEFORE the exchange. The
script first prints the selectivity (clicks, purchase users, clicks
surviving), then interleaves prod vs the semi-filtered form, then
asserts bit-identity.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mypipe_spark.operators.asof import range_join
from mypipe_spark.plans.catalog import load_tables
from mypipe_spark.plans.tpch import q_range_clicks_after_purchase
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-range-clicks")
spark.sparkContext.setLogLevel("ERROR")


def sides():
    ev = load_tables(spark, sf_dir)["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    return purchases, clicks


# --- selectivity probe -----------------------------------------------------
purchases, clicks = sides()
n_clicks = clicks.count()
pu = purchases.select("user_id").distinct()
n_pu = pu.count()
n_surviving = clicks.join(F.broadcast(pu), "user_id", "left_semi").count()
n_out = q_range_clicks_after_purchase(spark, sf_dir).count()
print(
    f"clicks={n_clicks} purchase_users={n_pu} clicks_surviving_semi="
    f"{n_surviving} ({100.0 * n_surviving / max(n_clicks, 1):.1f}%)"
    f" output_pairs={n_out}"
)


def prod():
    return q_range_clicks_after_purchase(spark, sf_dir)


def semi():
    p, c = sides()
    keys = F.broadcast(p.select("user_id").distinct())
    c = c.join(keys, "user_id", "left_semi")
    return range_join(
        c, p, "ts", "start_ts", "end_ts", on="user_id", bucket_seconds=3600
    ).select("purchase_id", "click_id", "user_id")


FORMS = {"prod": prod, "semi": semi}
t = {k: [] for k in FORMS}
rounds = int(os.environ.get("EXP_ROUNDS", "9"))
for k, fn in FORMS.items():
    fn().write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for k, fn in FORMS.items():
        spark.sparkContext.setJobDescription(f"exp_range_clicks:{k}")
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        t[k].append(round(time.perf_counter() - t0, 3))
for k, runs in t.items():
    print(
        f"{k:4s} min={min(runs):6.3f} med={sorted(runs)[len(runs) // 2]:6.3f}"
        f" {runs}"
    )
a = sorted(map(tuple, prod().collect()))
b = sorted(map(tuple, semi().collect()))
print("bit-identical:", a == b)
