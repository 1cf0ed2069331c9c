#!/usr/bin/env python
"""Catalog-wide physical-plan-shape budget (round-8 verdict ask #2).

The round-8 plan audit found five repeated-subtree regressions by
HAND-sweeping formatted explains (Spark plans each DataFrame branch as
its own subtree — no cross-branch exchange reuse — so an innocent
refactor can silently double a corpus scan). This tool freezes that
audit into a standing gate: the per-query counts of the four
scale-deciding node kinds (plus Sort) are snapshotted into
PLAN_BUDGET.json, and tests/test_plan_budget.py asserts every
registered query's current plan stays WITHIN its snapshot. A rewrite
that adds a scan/exchange/explode/window now fails CI with the exact
counts, instead of waiting for the next hand audit.

Budget semantics: ``actual <= budget`` per node kind — improvements
never fail; tighten the budget by regenerating after landing one.

The budget is tied to SF_DIR (sf0.001) and to cold plan caches: the
dedup plane's session-persisted relations (shingle / pair / split
caches) substitute themselves into later plans by subtree match, which
would make counts order-dependent — every count here is taken after
evicting all three, i.e. the UNCACHED pipeline shape, the same
discipline as tests/test_plan_quality.py's jaccard pin. Counts are the
pre-execution physical plan (no AQE), so they are deterministic for a
fixed SF and session config.

Disclosed limitation: one SF only. A size-dependent strategy flip
(broadcast→sort-merge when a side outgrows the threshold) at a larger
SF is invisible here — by design, since stats-driven flips are
Catalyst doing its job, not a regression; the node kinds this gate
watches come from the logical shape and do not flip with size.
Correctness at sf0.1 is preflight's job; sf0.1 wall-clock is
bench.py's.

Usage:
    python tools/plan_budget.py --regen      # rewrite PLAN_BUDGET.json
    python tools/plan_budget.py [name ...]   # check (all, or named) against it
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUDGET_PATH = os.path.join(REPO, "PLAN_BUDGET.json")
SF_DIR = "/root/testdata/sf0.001"
# the scale-deciding node kinds: corpus scans, shuffles, explodes,
# window sorts — plus Sort itself (a global sort that sneaks in is a
# single-partition hazard even when no Window shows it)
NODES = ("Scan parquet", "Exchange", "Generate", "Window", "Sort")


def evict_plan_caches() -> None:
    """Drop every session-persisted dedup-plane relation so each plan
    is the cold (uncached) pipeline shape."""
    from mypipe_spark.plans import dedup as D

    for cache in (D._SHINGLE_CACHE, D._PAIR_CACHE, D._SPLIT_CACHE):
        for k in list(cache):
            try:
                cache.pop(k).unpersist()
            except Exception:  # noqa: BLE001 — eviction is best-effort
                pass


def plan_counts(spark, name: str, sf_dir: str = SF_DIR) -> dict[str, int]:
    """Formatted-explain node counts for one catalog query, cold-cache.

    Counts use the detail headers ("(3) Exchange") — the tree section
    repeats each node, so a raw substring count would double-count.
    The trailing (?![A-Za-z]) keeps each count to its exact node kind:
    without it "Sort" also matched SortMergeJoin headers and "Window"
    matched WindowGroupLimit (found during the round-10 sf0.1 diff,
    where q7's broadcast→SMJ flip read as +3 sorts instead of +2
    sorts +1 SMJ)."""
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
        for node in NODES
    }


def load_budget() -> dict:
    with open(BUDGET_PATH) as f:
        return json.load(f)


def main(argv: list[str]) -> int:
    from mypipe_spark.plans.catalog import all_queries
    from mypipe_spark.session import get_spark

    regen = "--regen" in argv
    names = [a for a in argv if not a.startswith("--")]
    spark = get_spark("plan-budget", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    catalog = sorted(all_queries())
    if regen:
        queries = {}
        for i, name in enumerate(catalog):
            queries[name] = plan_counts(spark, name)
            print(f"[{i + 1}/{len(catalog)}] {name}: {queries[name]}")
        out = {
            "sf_dir": SF_DIR,
            "nodes": list(NODES),
            "note": (
                "per-query formatted-plan node counts at the sf_dir above, "
                "cold plan caches, pre-AQE; gate asserts actual <= budget "
                "(tests/test_plan_budget.py); regen with "
                "`python tools/plan_budget.py --regen` after an INTENTIONAL "
                "topology change"
            ),
            "queries": queries,
        }
        with open(BUDGET_PATH, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {BUDGET_PATH} ({len(queries)} queries)")
        return 0

    budget = load_budget()["queries"]
    check = names or catalog
    bad = 0
    for name in check:
        counts = plan_counts(spark, name)
        b = budget.get(name)
        if b is None:
            print(f"MISSING {name}: no budget row (regen needed)")
            bad += 1
            continue
        over = {n: (counts[n], b[n]) for n in NODES if counts[n] > b[n]}
        if over:
            print(f"OVER  {name}: {over} (actual, budget)")
            bad += 1
        else:
            print(f"ok    {name}")
    print("ALL OK" if bad == 0 else f"{bad} queries over budget")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
