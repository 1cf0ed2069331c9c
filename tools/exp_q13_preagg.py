"""Round-12 A/B: q13 — aggregate orders BEFORE the outer join.

Production joins customer LEFT JOIN orders row-for-row and counts
after the join, so the custkey exchange carries every (filtered)
order row. Guide §2.3 "aggregate before you shuffle": counting
orders per custkey FIRST is map-side combinable, so the exchange
carries at most one partial count per (task, custkey) instead of
every order row, and the join shrinks to customer ⋈ per-key counts.
Zero-order customers arrive via the same LEFT join (NULL count → 0).

Provably identical: COUNT(o_orderkey) over the join group equals the
pre-aggregated COUNT(*) for matching custkeys (o_orderkey is never
NULL) and 0 where no order matches.

Interleaved old/new rounds; bit-identity asserted at the end.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mypipe_spark.plans import tpch as T
from mypipe_spark.plans.catalog import load_tables
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-q13-preagg")
spark.sparkContext.setLogLevel("ERROR")


def old():
    return T.q13_order_count_distribution(spark, sf_dir)


def new():
    t = load_tables(spark, sf_dir)
    cnt = (
        t["orders"]
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        t["customer"]
        .join(cnt, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("c_count")
        )
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


FORMS = {"old": old, "new": new}
t = {k: [] for k in FORMS}
rounds = int(os.environ.get("EXP_ROUNDS", "9"))
for k, fn in FORMS.items():  # warmup
    fn().write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for k, fn in FORMS.items():
        spark.sparkContext.setJobDescription(f"exp_q13:{k}")
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        t[k].append(round(time.perf_counter() - t0, 3))
for k, runs in t.items():
    print(
        f"{k:4s} min={min(runs):6.3f} med={sorted(runs)[len(runs) // 2]:6.3f}"
        f" {runs}"
    )
a = sorted(map(tuple, old().collect()))
b = sorted(map(tuple, new().collect()))
print("bit-identical:", a == b)
print("schema_old:", old().schema.simpleString())
print("schema_new:", new().schema.simpleString())
if a != b:
    print("OLD:", a[:10])
    print("NEW:", b[:10])
