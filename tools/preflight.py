#!/usr/bin/env python
"""Pre-handoff gate in one command: the full oracle replay at BOTH
sf0.01 (the driver's correctness scale) and sf0.1 (the scale that has
caught engine-divergent rounding the small replay cannot see — three
real bugs in round 3). One SparkSession serves both replays.

Usage: python tools/preflight.py [query ...]   # no args = whole catalog
Exit 0 only if every query is green at both scale factors.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import check_oracle  # noqa: E402

SF_DIRS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> int:
    from mypipe_spark.plans.catalog import all_queries

    only = set(sys.argv[1:])
    unknown = only - set(all_queries())
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        return 2

    all_failures: dict[str, list[str]] = {}
    for sf_dir in SF_DIRS:
        t0 = time.monotonic()
        print(f"=== replay at {sf_dir} ===")
        failures = check_oracle.run(sf_dir, only)
        all_failures[sf_dir] = failures
        state = "OK" if not failures else f"FAILURES: {', '.join(failures)}"
        print(f"=== {sf_dir}: {state} ({time.monotonic() - t0:.0f}s) ===\n")

    bad = {sf: f for sf, f in all_failures.items() if f}
    if bad:
        for sf, f in bad.items():
            print(f"PREFLIGHT FAIL at {sf}: {', '.join(f)}")
        return 1
    print("PREFLIGHT OK: all queries green at both scale factors")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
