"""Round-12 A/B: single-action vector queries — checkpoint the corpus?

ann_recall_check (9 planned subtrees, 3 driver actions) and
ann_kmeans_cells (3 driver actions) both won with an in-query eager
localCheckpoint. This measures whether the pattern ALSO pays for
one-action consumers that plan the quantized corpus only 2-3 times:

- embedding_outliers: corpus under the centroid aggregate + the join
  side (2 subtrees);
- ann_topk_ivf: corpus under centroids + final join, query row (3).

The r11 session-cache experiment found caching LOSES on single-scan
consumers (columnar-cache read tax); checkpointed UnsafeRows have a
different cost profile, so measure rather than assume either way.

Interleaved rounds per pair; bit-identity asserted at the end.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mypipe_spark.plans import similarity as S
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-vec-ckpt")
spark.sparkContext.setLogLevel("ERROR")


def outliers_old():
    return S.embedding_outliers(spark, sf_dir)


def outliers_new():
    from pyspark.sql import Window

    n = (
        S._spark_quantized(spark, sf_dir)
        .filter(F.col("qv").isNotNull())
        .localCheckpoint(eager=True)
    )
    cent = S._centroid_sums(n, "label", S._DIMS).select(
        "label", F.expr(S._centroid_array_sql(S._DIMS)).alias("cv")
    )
    d = n.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.expr(
            "aggregate(zip_with(qv, cv, (x, c) -> (x - c) * (x - c)),"
            " CAST(0 AS BIGINT), (acc, y) -> acc + y)"
        ).alias("dist2"),
    )
    w = Window.partitionBy("label").orderBy(F.desc("dist2"), "vec_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= S._OUTLIERS_PER_LABEL)
        .select(
            "label", F.col("rk").cast("int").alias("rk"), "vec_id", "dist2"
        )
    )


def ivf_old():
    return S.ann_topk_ivf(spark, sf_dir)


def ivf_new():
    shared = S._spark_quantized(spark, sf_dir).localCheckpoint(eager=True)
    return S.ann_topk_ivf(spark, sf_dir, _corpus=shared)


PAIRS = {
    "outliers": (outliers_old, outliers_new),
    "ivf": (ivf_old, ivf_new),
}
rounds = int(os.environ.get("EXP_ROUNDS", "9"))
for pair, (fo, fn) in PAIRS.items():
    t = {"old": [], "new": []}
    for fn_ in (fo, fn):  # warmup
        fn_().write.format("noop").mode("overwrite").save()
    for _ in range(rounds):
        for k, fn_ in (("old", fo), ("new", fn)):
            spark.sparkContext.setJobDescription(f"exp_vec_ckpt:{pair}:{k}")
            t0 = time.perf_counter()
            fn_().write.format("noop").mode("overwrite").save()
            t[k].append(round(time.perf_counter() - t0, 3))
    for k, runs in t.items():
        print(
            f"{pair}:{k:4s} min={min(runs):6.3f}"
            f" med={sorted(runs)[len(runs) // 2]:6.3f} {runs}"
        )
    a = sorted(map(tuple, fo().collect()))
    b = sorted(map(tuple, fn().collect()))
    print(f"{pair} bit-identical:", a == b)
