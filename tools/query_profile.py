#!/usr/bin/env python
"""Round-11 measurement harness (optimization guide §1).

Times catalog queries under BOTH actions:

- ``count``: the action bench.py has always timed (comparable to
  BENCH_r01..r10) — but Catalyst prunes columns above a ``count()``,
  so a query whose expensive measures feed nothing else (q1's six
  decimal sums, dedup_exact's min/count) is UNDER-measured;
- ``noop``: ``df.write.format("noop").mode("overwrite").save()`` —
  computes every column of every row (guide §1.4), the honest cost.

The per-query (count, noop) split is exactly the evidence needed to
decide whether bench.py's timed action needs the §1.4 fix, and the
``--all`` sweep ranks the whole catalog so optimization effort lands
on measured cost, not guesses.

Usage:
    python tools/query_profile.py [--all] [--repeat N] [--sf-dir DIR]
                                  [--bench-only] [name ...]
Prints one JSON line per query:
    {"name": ..., "count_s": [...], "noop_s": [...]}
and a final summary line sorted by best noop time.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true", help="whole catalog")
    ap.add_argument("--bench-only", action="store_true")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--skip-count", action="store_true", help="noop only")
    args = ap.parse_args()

    from mypipe_spark.plans.catalog import all_queries
    from mypipe_spark.session import get_spark

    spark = get_spark("query-profile")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    if args.names:
        names = [n for n in args.names if n in qs]
        unknown = set(args.names) - set(names)
        if unknown:
            print(f"unknown: {sorted(unknown)}", file=sys.stderr)
            return 2
    elif args.bench_only:
        names = [n for n, qd in qs.items() if qd.bench]
    else:
        names = list(qs)
    names.sort()

    # warmup (JVM/codegen/parquet footers) on the cheapest bench query
    try:
        qs["dedup_exact"].fn(spark, args.sf_dir).count()
    except Exception as exc:  # noqa: BLE001
        print(f"warmup failed: {exc!r}", file=sys.stderr)

    rows = []
    for name in names:
        qd = qs[name]
        rec: dict[str, object] = {"name": name}
        for action in (("count",) if not args.skip_count else ()) + ("noop",):
            runs = []
            for _ in range(args.repeat):
                spark.sparkContext.setJobDescription(f"{name}:{action}")
                t0 = time.perf_counter()
                try:
                    df = qd.fn(spark, args.sf_dir)
                    if action == "count":
                        df.count()
                    else:
                        df.write.format("noop").mode("overwrite").save()
                except Exception as exc:  # noqa: BLE001
                    rec[f"{action}_err"] = repr(exc)[:200]
                    break
                runs.append(round(time.perf_counter() - t0, 3))
            rec[f"{action}_s"] = runs
        spark.sparkContext.setJobDescription(None)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    def best(r, key):
        v = r.get(key) or []
        return min(v) if v else float("inf")

    ranked = sorted(rows, key=lambda r: -best(r, "noop_s"))
    summary = {
        "sf_dir": args.sf_dir,
        "total_noop_best": round(
            sum(b for r in ranked if (b := best(r, "noop_s")) != float("inf")), 3
        ),
        "slowest": [
            {
                "name": r["name"],
                "noop": best(r, "noop_s"),
                "count": best(r, "count_s"),
            }
            for r in ranked[:25]
        ],
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
