"""Round-12 profile: dedup_semantic / dedup_components — where does
the time go (r11 verdict Next-round #4)?

Splits each consumer into its pair-generation stage vs the iterative
components stage (interleaved, same session), and instruments
connected_components' rounds: per-round frontier size and wall time,
so the "frontier semi-join" question (already implemented in r11's
delta-iteration form) is answered with measured round/frontier data
rather than guessed.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mypipe_spark.plans import dedup as D
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-components-profile")
spark.sparkContext.setLogLevel("ERROR")


def cosine_pairs():
    return D.dedup_embedding_cosine(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )


def jaccard_pairs():
    return D.jaccard_pairs_shared(spark, sf_dir).select("doc_a", "doc_b")


# --- instrumented round trace (one pass per pair source) -------------------
def traced_components(edges):
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.*")
    sym = sym.persist()
    t0 = time.perf_counter()
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    print(f"  init labels: {time.perf_counter() - t0:6.3f}s")
    frontier = labels
    for rnd in range(20):
        t0 = time.perf_counter()
        neighbor_min = (
            sym.join(frontier, sym.dst == frontier.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        prop = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
                F.col("component").alias("prev"),
            )
            .localCheckpoint(eager=True)
        )
        t1 = time.perf_counter()
        ptr = prop.select(
            F.col("doc_id").alias("p_id"), F.col("component").alias("p_comp")
        )
        staged = (
            prop.join(ptr, prop.component == ptr.p_id, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("p_comp"), F.col("component")),
                ).alias("component"),
                "prev",
            )
            .localCheckpoint(eager=True)
        )
        t2 = time.perf_counter()
        frontier = staged.filter(F.col("component") != F.col("prev")).select(
            "doc_id", "component"
        )
        changed = frontier.count()
        t3 = time.perf_counter()
        labels = staged.select("doc_id", "component")
        print(
            f"  round {rnd}: changed={changed:6d}"
            f" prop={t1 - t0:6.3f}s jump={t2 - t1:6.3f}s count={t3 - t2:6.3f}s"
        )
        if changed == 0:
            break
    sym.unpersist()
    return labels


for name, src in (("cosine", cosine_pairs), ("jaccard", jaccard_pairs)):
    print(f"=== traced components over {name} pairs ===")
    t0 = time.perf_counter()
    traced_components(src())
    print(f"  total: {time.perf_counter() - t0:6.3f}s")

# --- interleaved stage split ------------------------------------------------
FORMS = {
    "cos_pairs": lambda: cosine_pairs(),
    "semantic": lambda: D.dedup_semantic(spark, sf_dir),
    "jac_pairs": lambda: jaccard_pairs(),
    "components": lambda: D.dedup_components(spark, sf_dir),
}
t = {k: [] for k in FORMS}
rounds = int(os.environ.get("EXP_ROUNDS", "5"))
for k, fn in FORMS.items():
    fn().write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for k, fn in FORMS.items():
        spark.sparkContext.setJobDescription(f"exp_components_profile:{k}")
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        t[k].append(round(time.perf_counter() - t0, 3))
for k, runs in t.items():
    print(
        f"{k:10s} min={min(runs):6.3f} med={sorted(runs)[len(runs) // 2]:6.3f}"
        f" {runs}"
    )
