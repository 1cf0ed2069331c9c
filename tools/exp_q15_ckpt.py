"""Round-12 A/B: q15 — materialize the per-supplier revenue once.

Production plans the rev subtree (lineitem scan + quarter filter +
per-supplier money sum) TWICE: once under the scalar-max broadcast,
once as the joined relation (no cross-branch exchange reuse — its
docstring records the round-8 audit and the deliberate rejection of
the serializing global window). Guide §3.3: materializing an
intermediate truncates the plan — an eager in-query localCheckpoint
of rev (|suppliers| rows, KB-scale) lets both branches read the
materialized rows, halving the lineitem passes, with no
cross-invocation cache (the checkpoint dies with the invocation).

Interleaved old/new rounds; bit-identity asserted at the end.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mypipe_spark.plans import tpch as T
from mypipe_spark.plans.analytics import _money
from mypipe_spark.plans.catalog import load_tables
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-q15-ckpt")
spark.sparkContext.setLogLevel("ERROR")


def old():
    return T.q15_top_supplier(spark, sf_dir)


def new():
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            _money(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "total_revenue",
            )
        )
        .localCheckpoint(eager=True)
    )
    mx = F.broadcast(rev.agg(F.max("total_revenue").alias("mx")))
    return (
        rev.crossJoin(mx)
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


FORMS = {"old": old, "new": new}
t = {k: [] for k in FORMS}
rounds = int(os.environ.get("EXP_ROUNDS", "9"))
for k, fn in FORMS.items():  # warmup
    fn().write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for k, fn in FORMS.items():
        spark.sparkContext.setJobDescription(f"exp_q15:{k}")
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
if a != b:
    print("OLD:", a)
    print("NEW:", b)
