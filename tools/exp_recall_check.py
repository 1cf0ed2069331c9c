"""Round-12 A/B: ann_recall_check — share the quantized subtree.

The registered composition embeds the quantized-embeddings derivation
once per variant subtree (brute ×2 scans, ivf ×3, lsh ×2, pandas ×1 +
a query-row collect) — nine parquet scans per action (r11 verdict
Next-round #3). The r11 session-cache fix was built and REVERTED
(columnar-cache array-read tax beat re-quantization on single-scan
consumers); the in-query alternative tried here is different: ONE
`localCheckpoint(eager=True)` of the quantized corpus INSIDE the
query, every variant then reading the materialized rows (UnsafeRow
blocks — no columnar repack per read, and no cross-invocation cache:
the checkpoint lives and dies with the DataFrame built per call).

Interleaved old/new rounds; bit-identity asserted at the end.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mypipe_spark.plans import similarity as S
from mypipe_spark.plans.catalog import round4_frac_sql
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-recall-check")
spark.sparkContext.setLogLevel("ERROR")

K = S._TOP_K
Q = S._QUERY_VEC_ID


def old():
    return S.ann_recall_check(spark, sf_dir)


def _topk_ids(df):
    return (
        df.orderBy(F.desc("cos_raw"), "vec_id")
        .limit(K)
        .select("vec_id")
    )


def new():
    # ONE quantize pass, materialized in-query; all JVM variants read it
    n = S._spark_quantized(spark, sf_dir).localCheckpoint(eager=True)
    qry = F.broadcast(
        n.filter(F.col("vec_id") == Q).select(
            F.col("qv").alias("qqv"), F.col("nrm2").alias("qn")
        )
    )
    corpus = n.filter(F.col("vec_id") != Q)

    brute = _topk_ids(
        corpus.crossJoin(qry).withColumn(
            "cos_raw", S._cos("qv", "nrm2", "qqv", "qn")
        )
    ).select(F.col("vec_id"))

    # ivf
    cent = (
        S._centroid_sums(n, "label", S._DIMS)
        .select("label", F.expr(S._centroid_array_sql(S._DIMS)).alias("cv"))
        .withColumn(
            "cn2",
            F.expr("aggregate(cv, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"),
        )
    )
    probed = (
        cent.crossJoin(qry)
        .withColumn("csim", S._cos("cv", "cn2", "qqv", "qn"))
        .orderBy(F.desc("csim"), "label")
        .limit(S._IVF_NPROBE)
        .select("label")
    )
    ivf = _topk_ids(
        n.join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != Q)
        .crossJoin(qry)
        .withColumn("cos_raw", S._cos("qv", "nrm2", "qqv", "qn"))
    )

    # lsh
    nb = n
    for t_i, e in enumerate(S._lsh_bucket_exprs_spark("qv")):
        nb = nb.withColumn(f"b{t_i}", F.expr(e))
    qryl = F.broadcast(
        nb.filter(F.col("vec_id") == Q).select(
            F.col("qv").alias("qqv"),
            F.col("nrm2").alias("qn"),
            *[
                F.col(f"b{t_i}").alias(f"qb{t_i}")
                for t_i in range(len(S._LSH_PAIRS))
            ],
        )
    )
    collide = None
    for t_i in range(len(S._LSH_PAIRS)):
        c = F.col(f"b{t_i}") == F.col(f"qb{t_i}")
        collide = c if collide is None else (collide | c)
    lsh = _topk_ids(
        nb.filter(F.col("vec_id") != Q)
        .crossJoin(qryl)
        .filter(collide)
        .withColumn("cos_raw", S._cos("qv", "nrm2", "qqv", "qn"))
    )

    # pandas variant: the Arrow path IS the declared computation — keep
    pandas = S.ann_topk_pandas(spark, sf_dir).select("vec_id")

    tagged = None
    for method, df in (("ivf", ivf), ("lsh", lsh), ("pandas", pandas)):
        t = df.select(
            F.lit(method).alias("method"), F.col("vec_id").alias("other_id")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    per = (
        tagged.join(brute, F.col("other_id") == F.col("vec_id"), "left")
        .groupBy("method")
        .agg(
            F.sum(F.col("vec_id").isNotNull().cast("bigint"))
            .cast("bigint")
            .alias("n_common")
        )
    )
    floors = " ".join(
        f"WHEN method = '{m}' THEN CAST(CASE WHEN n_common * {den}"
        f" >= {num} * {K} THEN 1 ELSE 0 END AS BIGINT)"
        for m, num, den in S._ANN_RECALL_FLOORS
    )
    return per.select(
        "method",
        F.lit(K).alias("k"),
        "n_common",
        F.expr(round4_frac_sql("n_common", str(K), "div")).alias("recall"),
        F.expr(f"CASE {floors} END").alias("recall_ok"),
    )


FORMS = {"old": old, "new": new}
t = {k: [] for k in FORMS}
rounds = int(os.environ.get("EXP_ROUNDS", "9"))
for k, fn in FORMS.items():  # warmup
    fn().write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for k, fn in FORMS.items():
        spark.sparkContext.setJobDescription(f"exp_recall_check:{k}")
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
