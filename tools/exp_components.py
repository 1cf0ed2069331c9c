#!/usr/bin/env python
"""Round-11 experiment: connected-components round-overhead variants.

The production operator runs THREE eager jobs per round (propagation
localCheckpoint, pointer-jump localCheckpoint, convergence count); at
bench scale the data per round is tiny and the wall-clock is almost
pure job overhead. Variant "twojob" skips the propagation checkpoint
and lets the pointer-jump self-join re-plan the (cheap, deterministic)
propagation join twice — 2 eager jobs per round; at 100 TB it trades a
corpus-sized per-round materialization for a second read of the
PREVIOUS round's checkpoint, which is at worst a wash.

Prints per-variant wall times and verifies identical labels.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def cc_twojob(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.*")
    sym = sym.persist()
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    frontier = labels
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(frontier, sym.dst == frontier.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        prop = labels.join(
            neighbor_min, labels.doc_id == neighbor_min.src, "left"
        ).select(
            "doc_id",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
            F.col("component").alias("prev"),
        )
        ptr = prop.select(
            F.col("doc_id").alias("p_id"), F.col("component").alias("p_comp")
        )
        staged = (
            prop.join(ptr, prop.component == ptr.p_id, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("p_comp"), F.col("component"))
                ).alias("component"),
                "prev",
            )
            .localCheckpoint(eager=True)
        )
        frontier = staged.filter(F.col("component") != F.col("prev")).select(
            "doc_id", "component"
        )
        changed = frontier.count()
        labels = staged.select("doc_id", "component")
        if changed == 0:
            break
    else:
        raise RuntimeError("no fixpoint")
    sym.unpersist()
    return labels


def main() -> int:
    from mypipe_spark.plans.dedup import connected_components, jaccard_pairs_shared
    from mypipe_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-cc")
    spark.sparkContext.setLogLevel("ERROR")
    edges = jaccard_pairs_shared(spark, sf_dir).select("doc_a", "doc_b")
    edges.count()  # build the shared pair cache outside the timing

    variants = {"prod": connected_components, "twojob": cc_twojob}
    times = {v: [] for v in variants}
    rows = {}
    for r in range(5):
        for v, fn in variants.items():
            spark.sparkContext.setJobDescription(f"cc:{v}")
            t0 = time.perf_counter()
            out = fn(edges)
            n = out.count()
            times[v].append(round(time.perf_counter() - t0, 3))
            if v not in rows:
                rows[v] = sorted(map(tuple, out.collect()))
    for v, runs in times.items():
        print(f"{v:7s} min={min(runs):6.3f} med={sorted(runs)[len(runs)//2]:6.3f} {runs}")
    print("identical:", rows["prod"] == rows["twojob"], len(rows["prod"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
