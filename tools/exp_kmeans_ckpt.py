"""Round-12 A/B: ann_kmeans_cells — materialize the quantized corpus.

Unlike the one-action vector queries, Lloyd's loop runs THREE driver
actions per invocation (init-centroid collect, iteration-1 centroid
collect, the returned assignment plan), and each one re-plans the
quantize-from-parquet subtree. The candidate applies the Change-1
pattern (ann_recall_check): ONE eager in-query localCheckpoint of the
quantized corpus, every subsequent action reading the materialized
UnsafeRows. No cross-invocation cache — the checkpoint lives and dies
with the invocation.

Interleaved old/new rounds; bit-identity asserted at the end. Timing
covers the FULL invocation (builder call + noop action), so the
checkpoint's own materialization cost is inside the timed region.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mypipe_spark.plans import similarity as S
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-kmeans-ckpt")
spark.sparkContext.setLogLevel("ERROR")


def old():
    return S.ann_kmeans_cells(spark, sf_dir)


def new():
    from pyspark.sql import Window

    n = S._spark_quantized(spark, sf_dir).localCheckpoint(eager=True)
    cents = [
        (int(r["vec_id"]), [int(x) for x in r["qv"]])
        for r in n.filter(F.col("vec_id") < S._KMEANS_K)
        .select("vec_id", "qv")
        .collect()
    ]
    cents.sort()
    if not cents:
        return spark.createDataFrame(
            [], "vec_id bigint, cluster int, cell_size bigint"
        )

    def assign_col(cs):
        entries = ", ".join(
            f"struct(aggregate(zip_with(qv, array({', '.join(map(str, cqv))}),"
            f" (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x) AS dist,"
            f" {cid} AS cid)"
            for cid, cqv in cs
        )
        return F.expr(f"array_min(array({entries})).cid")

    assigned = None
    for it in range(1, S._KMEANS_ITERS + 1):
        assigned = n.withColumn("cluster", assign_col(cents))
        if it < S._KMEANS_ITERS:
            new_cents = (
                S._centroid_sums(assigned, "cluster", S._DIMS)
                .select(
                    "cluster",
                    F.expr(S._centroid_array_sql(S._DIMS)).alias("cqv"),
                )
                .collect()
            )
            cents = sorted(
                (int(r["cluster"]), [int(x) for x in r["cqv"]])
                for r in new_cents
            )
    w = Window.partitionBy("cluster")
    return assigned.select(
        "vec_id", "cluster", F.count("*").over(w).alias("cell_size")
    )


FORMS = {"old": old, "new": new}
t = {k: [] for k in FORMS}
rounds = int(os.environ.get("EXP_ROUNDS", "9"))
for k, fn in FORMS.items():  # warmup
    fn().write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for k, fn in FORMS.items():
        spark.sparkContext.setJobDescription(f"exp_kmeans_ckpt:{k}")
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
    print("n_old", len(a), "n_new", len(b))
