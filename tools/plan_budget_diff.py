#!/usr/bin/env python
"""One-time sf0.1 plan-budget diff (round-9 verdict ask #3).

PLAN_BUDGET.json freezes per-query node counts at sf0.001 by design,
which leaves SIZE-DRIVEN strategy flips (broadcast→sort-merge when a
side outgrows spark.sql.autoBroadcastJoinThreshold) formally
unobserved. This tool recomputes the same cold-cache pre-AQE counts at
another SF and prints every query whose counts differ, alongside the
join-strategy node kinds (BroadcastHashJoin / SortMergeJoin /
ShuffledHashJoin / BroadcastNestedLoopJoin / CartesianProduct) at BOTH
SFs so each flip can be adjudicated: a stats-driven flip is Catalyst
working as designed — the point is to KNOW which queries flip and
that none flips into a single-partition global sort or a
non-broadcast small-side join. Adjudications land in
PLAN_BUDGET_SF01.md.

Usage:
    python tools/plan_budget_diff.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from plan_budget import BUDGET_PATH, NODES, evict_plan_caches  # noqa: E402

JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def full_counts(spark, name: str, sf_dir: str) -> dict[str, int]:
    from mypipe_spark.plans.catalog import all_queries

    evict_plan_caches()
    df = all_queries()[name].fn(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    return {
        node: len(
            re.findall(
                rf"^\(\d+\) {node}(?![A-Za-z])", plan, flags=re.MULTILINE
            )
        )
        for node in NODES + JOIN_NODES
    }


def main(argv: list[str]) -> int:
    from mypipe_spark.plans.catalog import all_queries
    from mypipe_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in argv:
        sf_dir = argv[argv.index("--sf-dir") + 1]
    spark = get_spark("plan-budget-diff", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    with open(BUDGET_PATH) as f:
        base = json.load(f)
    base_q = base["queries"]
    base_sf = base["sf_dir"]

    flips: dict[str, dict] = {}
    catalog = sorted(all_queries())
    for i, name in enumerate(catalog):
        big = full_counts(spark, name, sf_dir)
        small = full_counts(spark, name, base_sf)
        delta = {
            n: (small.get(n, 0), big[n])
            for n in big
            if big[n] != small.get(n, 0)
        }
        status = "FLIP" if delta else "same"
        print(f"[{i + 1}/{len(catalog)}] {status:4} {name}"
              + (f" {delta}" if delta else ""))
        if delta:
            flips[name] = {
                "delta (sf0.001, sf0.1)": delta,
                "sf0.001": {k: v for k, v in small.items() if v},
                "sf0.1": {k: v for k, v in big.items() if v},
            }
    print(json.dumps(flips, indent=1, sort_keys=True))
    print(f"{len(flips)} queries differ between {base_sf} and {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
