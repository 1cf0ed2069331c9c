"""Round-12: scaling evidence at a bigger SF (r11 verdict Next-round
#9).

The 8-vs-32-core ratios at sf0.1 are ≈1 because every query is
fixed-overhead-bound at that size. The driver ships no sf1, so this
experiment DERIVES a deterministic 10× corpus into /tmp (never read
by bench.py or any oracle path — experiment-only data):

- lineitem / orders: 10 copies with key-shifted orderkeys (k·10⁹);
- documents: 10 copies with every WORD prefixed by the copy tag, so
  the copies are shingle-disjoint — the pair graph is 10 independent
  copies of the original (an honest 10× of the dedup workload, not a
  cross-copy pair explosion);
- embeddings: 10 copies, vec_id shifted by k·10⁷ (labels kept — cell
  occupancy grows 10×, exactly what a corpus grow-up does);
- events: 10 copies, user_id/event_id shifted by k·10⁹ (10× users);
- dims (region/nation/customer/supplier/part): copied as-is.

Usage: SPARK_GRAFT_CPUS=32 python tools/exp_scale_sf1.py
       SPARK_GRAFT_CPUS=8  python tools/exp_scale_sf1.py
(one session per invocation; the generated dir is reused if present)
"""

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mypipe_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/exp_sf1x"
COPIES = 10

QUERIES = sys.argv[1:] or [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "events_rfm_segments",
]

spark = get_spark("exp-scale-sf1")
spark.sparkContext.setLogLevel("ERROR")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")


def gen():
    os.makedirs(DST, exist_ok=True)
    for dim in ("region", "nation", "customer", "supplier", "part"):
        dst = f"{DST}/{dim}.parquet"
        if not os.path.exists(dst):
            src = f"{SRC}/{dim}.parquet"
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)

    def expand(name, build):
        dst = f"{DST}/{name}.parquet"
        if os.path.exists(dst):
            return
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = [build(base, k) for k in range(COPIES)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)

    expand(
        "lineitem",
        lambda df, k: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * 10**9)
        ),
    )
    expand(
        "orders",
        lambda df, k: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(k * 10**9)
        ),
    )
    expand(
        "documents",
        lambda df, k: df.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * 10**7)
        ).withColumn(
            "text",
            F.expr(
                f"array_join(transform(split(text, ' '),"
                f" w -> concat('c{k}', w)), ' ')"
            ),
        ),
    )
    expand(
        "embeddings",
        lambda df, k: df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(k * 10**7)
        ),
    )
    expand(
        "events",
        lambda df, k: df.withColumn(
            "user_id", F.col("user_id") + F.lit(k * 10**9)
        ).withColumn("event_id", F.col("event_id") + F.lit(k * 10**9)),
    )


gen()

from mypipe_spark.plans.catalog import all_queries  # noqa: E402

qs = all_queries()
repeat = int(os.environ.get("EXP_ROUNDS", "3"))
results = {}
for name in QUERIES:
    runs = []
    for _ in range(repeat):
        spark.sparkContext.setJobDescription(f"exp_scale_sf1:{name}")
        t0 = time.perf_counter()
        qs[name].fn(spark, DST).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    results[name] = runs
    print(f"cpus={cpus} {name:26s} min={min(runs):7.3f} {runs}", flush=True)
print({"cpus": cpus, "results": results})
