"""Round-12: the jaccard slack-branch A/B on a SKEWED (boilerplate-
heavy) fixture (r11 verdict Next-round #7).

Round 11 prototyped a "light" slack derivation — per-shingle COUNT
(map-side combinable) + hot-shingle semi-join over the mention stream
— against prod's second collect_list posting-list aggregation, and
measured ≈ noise at the UNIFORM sf0.1 corpus (few hot shingles: the
slack branch is nearly empty either way). The honest worst case is a
boilerplate-heavy corpus where most shingles are hot: prod's slack
branch then collect_lists THOUSANDS-long posting lists only to
explode them, while the light form shuffles 8-byte counts. This
script builds that fixture (N_DOCS docs sharing a BOILER-word header,
so every boilerplate shingle's df = N_DOCS >> cap=1000), interleaves
the two forms, and asserts bit-identity of the qualifying pairs.
"""

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mypipe_spark.plans import dedup as D
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-jaccard-skew")
spark.sparkContext.setLogLevel("ERROR")

N_DOCS = 3000
BOILER_WORDS = 40
UNIQ_WORDS = 20
FIXTURE = "/tmp/exp_jaccard_skew_docs"

if not os.path.exists(FIXTURE):
    boiler = " ".join(f"boiler{i}" for i in range(BOILER_WORDS))
    rows = []
    for d in range(N_DOCS):
        # near-dup pairs: every doc 10k+ shares its unique tail with
        # doc 10k (so qualifying pairs exist through the boilerplate)
        base = d - (d % 10) if d % 10 == 1 else d
        uniq = " ".join(f"u{base}w{j}" for j in range(UNIQ_WORDS))
        rows.append((d, f"{boiler} {uniq}"))
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        4
    ).write.mode("overwrite").parquet(FIXTURE)

docs = spark.read.parquet(FIXTURE)
arr = D._with_shingle_arrays(docs).persist()
arr.count()  # build once; both forms read the same warm relation

cap = D._STOP_SHINGLE_DF_CAP
t = float(D._JACCARD_THRESHOLD)


def _pairs(slack_form: str):
    pref = arr.select(
        "doc_id",
        "n_sh",
        F.expr(
            f"slice(array_sort(hsh), 1,"
            f" greatest(size(hsh) - cast(ceil({t} * n_sh) as int) + 1, 0))"
        ).alias("pref"),
    )
    sh = pref.select(
        "doc_id", "n_sh", F.posexplode("pref").alias("pos0", "shingle")
    ).withColumn("pos", F.col("pos0") + 1).drop("pos0")
    grouped_all = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "n_sh", "pos"))).alias(
            "docs"
        )
    )
    if slack_form == "prod":
        capped_counts = (
            grouped_all.filter(F.size("docs") > cap)
            .select(F.explode(F.col("docs.doc_id")).alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_capped"))
        )
    else:  # light: count-only aggregate + hot-shingle join on the stream
        counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        hot = counts.filter(F.col("df") > cap).select("shingle")
        capped_counts = (
            sh.join(hot, "shingle", "left_semi")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_capped"))
        )
    grouped = grouped_all.filter(
        (F.size("docs") >= 2) & (F.size("docs") <= cap)
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                """
                flatten(transform(docs, (a, i) ->
                  transform(slice(docs, i + 2, size(docs) - i - 1), b ->
                    struct(a.doc_id AS doc_a, b.doc_id AS doc_b,
                           a.n_sh AS na, b.n_sh AS nb,
                           a.pos AS pa, b.pos AS pb))))
                """
            )
        ).alias("p")
    ).select("p.*")
    alpha = (
        F.ceil(F.lit(t / (1.0 + t)) * (F.col("na") + F.col("nb"))).cast("int")
    )
    length_ok = pairs.filter(
        F.least("na", "nb").cast("double") >= F.lit(t) * F.greatest("na", "nb")
    )
    nca = capped_counts.select(
        F.col("doc_id").alias("doc_a"), F.col("n_capped").alias("nca")
    )
    cand = (
        length_ok.join(nca, "doc_a", "left")
        .withColumn("slack", F.coalesce(F.col("nca"), F.lit(0)))
        .filter(
            F.least(F.col("na") - F.col("pa"), F.col("nb") - F.col("pb"))
            + 1
            + F.col("slack")
            >= alpha
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    a = arr.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_sh").alias("na"),
        F.col("hsh").alias("ha"),
    )
    b = arr.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_sh").alias("nb"),
        F.col("hsh").alias("hb"),
    )
    verified = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ha", "hb")).alias("n_common"),
            "na",
            "nb",
        )
    )
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return verified.filter(jac >= t)


FORMS = {"prod": lambda: _pairs("prod"), "light": lambda: _pairs("light")}
tm = {k: [] for k in FORMS}
rounds = int(os.environ.get("EXP_ROUNDS", "7"))
for k, fn in FORMS.items():
    fn().write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for k, fn in FORMS.items():
        spark.sparkContext.setJobDescription(f"exp_jaccard_skew:{k}")
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        tm[k].append(round(time.perf_counter() - t0, 3))
for k, runs in tm.items():
    print(
        f"{k:5s} min={min(runs):6.3f} med={sorted(runs)[len(runs) // 2]:6.3f}"
        f" {runs}"
    )
a = sorted(map(tuple, _pairs("prod").collect()))
b = sorted(map(tuple, _pairs("light").collect()))
print(f"pairs={len(a)} bit-identical:", a == b)
arr.unpersist()
