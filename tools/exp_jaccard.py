#!/usr/bin/env python
"""Round-11 experiment: does AQE reuse the duplicated posting-list
exchange in dedup_ngram_jaccard at runtime, and where does the query's
time actually go?

The static plan (plans/r11/dedup_ngram_jaccard_before.txt) plans TWO
structurally identical ObjectHashAggregate+Exchange subtrees over the
exploded prefix-mention stream — one feeding pair generation, one
feeding the capped-count slack join. jaccard_pairs_raw's docstring
says the duplication is real ("measured, not assumed", round 5); this
re-checks on Spark 4.1 by executing the query and printing the FINAL
adaptive plan, where a reused stage shows up as TableCacheQueryStage /
ShuffleQueryStage reuse or an explicit ReusedExchange node.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from mypipe_spark.plans.catalog import all_queries
    from mypipe_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-jaccard")
    spark.sparkContext.setLogLevel("ERROR")
    qd = all_queries()["dedup_ngram_jaccard"]

    # warm the shingle cache once so the timed run is the steady state
    qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    df = qd.fn(spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"warm noop run: {time.perf_counter() - t0:.3f}s")

    final = df._jdf.queryExecution().executedPlan().toString()
    n_reused = final.count("ReusedExchange") + final.count("ReusedQueryStage")
    n_shuffle_stages = final.count("ShuffleQueryStage")
    print(f"ReusedExchange/ReusedQueryStage nodes: {n_reused}")
    print(f"ShuffleQueryStage nodes: {n_shuffle_stages}")
    print(final[:8000])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
