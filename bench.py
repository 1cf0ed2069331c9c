#!/usr/bin/env python
"""Benchmark harness: runs the headline queries (QueryDef.bench=True)
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock over the headline set after a warmup
pass of the smallest query (JVM/codegen warm); per-query numbers are
the fastest of ``--repeat`` runs (default 5).

Adjudicability fields (round 7 — the official number drifted ±8% two
rounds running on a host whose documented same-code spread is ±2×, so
every reading now carries the evidence needed to separate regression
from noise WITHOUT re-running):

- ``loadavg_start`` / ``loadavg_end``: 1-min load average around the
  run. ``load_flagged`` is true when the run STARTED on a busy host —
  busy meaning load above a quarter of the core count (an absolute
  threshold would flag a near-idle 32-core box at 3% utilization) —
  treat a flagged reading as non-adjudicable ambient noise, not a
  code delta.
- ``timings``: per-query ALL repeat wall-clocks in run order, so the
  within-run spread (max/min per query) is visible next to the
  fastest-of-N summary.
- ``value_median``: sum of per-query medians — the noise-robust total
  beside the fastest-of-N ``value`` (which stays the like-for-like
  number of record, comparable to BENCH_r01..r06).
- ``stream_mutations_per_s``: mutations/sec through the full
  checkpointed streaming pipe (processing-time basis, startup
  excluded) — the tracked analog of the reference's one published
  performance number (<10 ms/mutation, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> int:
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    from mypipe_spark.plans.catalog import all_queries
    from mypipe_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # fastest-of-5 by default: the first run of a query pays one-time
    # whole-stage-codegen (Janino) compilation of its expressions (and,
    # for the dedup plane, populating the shared shingle cache), and
    # this host shows ±30% run-to-run jitter — steady-state throughput
    # is the quantity being benchmarked, so take the best of 5.
    repeat = int(os.environ.get("BENCH_REPEAT", "5"))
    load_start = os.getloadavg()[0]
    spark = get_spark("mypipe-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = {name: qd for name, qd in all_queries().items() if qd.bench}

    # warmup: smallest bench query end-to-end (JIT, codegen, parquet footers)
    warm = qs.get("dedup_exact") or next(iter(qs.values()))
    warm.fn(spark, sf_dir).count()

    per_query: dict[str, float] = {}
    timings: dict[str, list[float]] = {}
    for name, qd in sorted(qs.items()):
        runs: list[float] = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            df = qd.fn(spark, sf_dir)
            df.count()  # full materialization without driver collect
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = runs
        per_query[name] = min(runs)

    total = round(sum(per_query.values()), 3)
    total_median = round(
        sum(statistics.median(r) for r in timings.values()), 3
    )

    # streaming throughput row (skippable with BENCH_STREAM_TX=0)
    stream_tx = int(os.environ.get("BENCH_STREAM_TX", "1000"))
    stream_mut_per_s = None
    stream_stats = None
    if stream_tx > 0:
        # never let a streaming-plane failure discard the headline
        # reading measured above — emit it with a null stream row
        # (the IMPORT is inside the try for the same reason)
        try:
            sys.path.insert(0, os.path.join(repo, "tools"))
            import stream_bench

            stream_stats = stream_bench.measure(spark, n_tx=stream_tx)
            # mutation-row basis, NOT input events: BEGIN/COMMIT
            # control rows are ~40% of the changelog and would
            # overstate the per-mutation figure ~1.67x under this name
            stream_mut_per_s = stream_stats["mutations_per_sec"]
        except Exception as exc:  # noqa: BLE001 — reported, not hidden
            print(f"stream bench failed: {exc!r}", file=sys.stderr)
            stream_stats = None

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    out = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "value_median": total_median,
        "timings": timings,
        "repeat": repeat,
        "loadavg_start": round(load_start, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "load_flagged": load_start > max(1.0, (os.cpu_count() or 4) / 4),
        "stream_mutations_per_s": stream_mut_per_s,
    }
    if stream_stats is not None:
        out["stream_detail"] = {
            k: stream_stats[k]
            for k in (
                "input_events",
                "input_mutations",
                "processing_sec",
                "n_batches",
                "mean_batch_ms",
            )
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
