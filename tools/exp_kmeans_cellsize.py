"""Round-11 A/B: ann_kmeans_cells' cell_size — window vs broadcast join.

The final ``COUNT(*) OVER (PARTITION BY cluster)`` shuffles the whole
assigned corpus into k=4 hash partitions — at 100 TB that is four
tasks each holding a quarter of the corpus, the straggler shape the
engine's other plans avoid.  The identical output comes from a
map-side-combinable groupBy(cluster).count() (k rows) broadcast-joined
back: zero exchange on the corpus side.  Interleaved A/B; bit-identity
asserted.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from mypipe_spark.plans import similarity as S
from mypipe_spark.plans.similarity import (
    _DIMS,
    _KMEANS_ITERS,
    _KMEANS_K,
    _centroid_array_sql,
    _centroid_sums,
    _spark_quantized,
)
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-kmeans-cellsize")
spark.sparkContext.setLogLevel("ERROR")


def kmeans(use_window: bool):
    n = _spark_quantized(spark, sf_dir)
    cents = [
        (int(r["vec_id"]), [int(x) for x in r["qv"]])
        for r in n.filter(F.col("vec_id") < _KMEANS_K)
        .select("vec_id", "qv")
        .collect()
    ]
    cents.sort()

    def assign_col(cs):
        entries = ", ".join(
            f"struct(aggregate(zip_with(qv, array({', '.join(map(str, cqv))}),"
            f" (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x) AS dist,"
            f" {cid} AS cid)"
            for cid, cqv in cs
        )
        return F.expr(f"array_min(array({entries})).cid")

    assigned = None
    for it in range(1, _KMEANS_ITERS + 1):
        assigned = n.withColumn("cluster", assign_col(cents))
        if it < _KMEANS_ITERS:
            new_cents = (
                _centroid_sums(assigned, "cluster", _DIMS)
                .select(
                    "cluster",
                    F.expr(_centroid_array_sql(_DIMS)).alias("cqv"),
                )
                .collect()
            )
            cents = sorted(
                (int(r["cluster"]), [int(x) for x in r["cqv"]])
                for r in new_cents
            )
    if use_window:
        w = Window.partitionBy("cluster")
        return assigned.select(
            "vec_id", "cluster", F.count("*").over(w).alias("cell_size")
        )
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cell_size")
    )
    return assigned.join(F.broadcast(sizes), "cluster").select(
        "vec_id", "cluster", "cell_size"
    )


variants = {"old": True, "new": False}
t = {k: [] for k in variants}
rounds = int(os.environ.get("EXP_ROUNDS", "9"))
for name, flag in variants.items():
    kmeans(flag).write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for name, flag in variants.items():
        spark.sparkContext.setJobDescription(f"exp_kmeans_cellsize:{name}")
        t0 = time.perf_counter()
        kmeans(flag).write.format("noop").mode("overwrite").save()
        t[name].append(round(time.perf_counter() - t0, 3))
for name, runs in t.items():
    print(
        f"{name:4s} min={min(runs):6.3f}"
        f" med={sorted(runs)[len(runs) // 2]:6.3f} {runs}"
    )
same = sorted(map(tuple, kmeans(True).collect())) == sorted(
    map(tuple, kmeans(False).collect())
)
print("identical:", same)
