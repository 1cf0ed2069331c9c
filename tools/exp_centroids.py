#!/usr/bin/env python
"""Round-11 experiment: the vector-plane centroid builds explode every
corpus vector into 64 (label, dim, x) rows and aggregate twice
(groupBy(label, dim) then regroup-to-array by label) — guide §2.4
says aggregate first, explode after (or never). Variants:

  explode2 — production form: posexplode → groupBy(label, i) →
             groupBy(label) collect_list reassembly (2 exchanges)
  wide     — groupBy(label).agg(sum(element_at(qv, i)) for i in 1..64,
             count) → row-local array assembly (1 exchange, no
             Generate, partial aggregation over 64 long buffers)

Both compute the identical exact-integer ROUND-mean centroid; value
identity is asserted below. The same restructure applies to
ann_topk_ivf's probe-side build, embedding_centroids (explode AFTER
the aggregate for the long output), ann_kmeans_cells' update step and
embedding_outliers' centroid side.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from mypipe_spark.plans.similarity import (
        _assemble_by_pos,
        _round_mean_sql,
        _spark_quantized,
    )
    from mypipe_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-centroids")
    spark.sparkContext.setLogLevel("ERROR")
    n = _spark_quantized(spark, sf_dir).filter(F.col("qv").isNotNull())

    explode2 = (
        n.select("label", F.posexplode("qv").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.sum("x").alias("s"), F.count("*").alias("c"))
        .groupBy("label")
        .agg(
            F.expr(
                _assemble_by_pos(
                    "i", f"CAST({_round_mean_sql('s', 'c', 'div')} AS BIGINT)"
                )
            ).alias("cv")
        )
    )

    dims = 64
    wide = (
        n.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("c"),
            *[
                F.sum(F.element_at("qv", i)).alias(f"s{i}")
                for i in range(1, dims + 1)
            ],
        )
        .select(
            "label",
            F.expr(
                "array("
                + ", ".join(
                    f"CAST({_round_mean_sql(f's{i}', 'c', 'div')} AS BIGINT)"
                    for i in range(1, dims + 1)
                )
                + ")"
            ).alias("cv"),
        )
    )

    dfs = {"explode2": explode2, "wide": wide}
    timings = {name: [] for name in dfs}
    rounds = int(os.environ.get("EXP_ROUNDS", "9"))
    for _ in range(rounds):
        for name, df in dfs.items():
            spark.sparkContext.setJobDescription(f"exp_centroids:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            timings[name].append(round(time.perf_counter() - t0, 3))
    results = {}
    for name, df in dfs.items():
        results[name] = sorted(
            (r["label"], tuple(r["cv"])) for r in df.collect()
        )
        runs = timings[name]
        print(
            f"{name:8s} min={min(runs):6.3f} "
            f"med={sorted(runs)[len(runs) // 2]:6.3f} {runs}"
        )
    print("wide identical to explode2:", results["wide"] == results["explode2"])
    for name, df in dfs.items():
        print(f"--- {name} plan exchanges:")
        plan = df._jdf.queryExecution().executedPlan().toString()
        print("   ", plan.count("Exchange"), "Exchange nodes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
