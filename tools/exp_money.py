#!/usr/bin/env python
"""Round-11 experiment: where does q1's aggregate time go, and which
value-identical money-sum form is fastest? (guide §1 measure-first;
§2.3 narrower types / cheaper per-row work.)

Variants, all over the same lineitem scan+filter as q1:

  dec38  — current production form: SUM(CAST(x AS DECIMAL(38,6)))
  dec18  — per-row cast DECIMAL(18,6) (long-backed Decimal; same
           value for |x| < 1e12), sum buffer DECIMAL(28,6)
  split  — two BIGINT sums per measure (whole units + micro remainder),
           recombined exactly after the aggregate
  longq  — single BIGINT micro sum (overflow-UNSAFE at extreme scale;
           measurement bound only)
  base   — no money measures at all (scan+group floor)

Each variant also prints its result rows so value-identity with dec38
is checked right here, not assumed.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    from mypipe_spark.plans.catalog import load_tables
    from mypipe_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-money")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz")
    )

    disc = "(l_extendedprice * (1.0 - l_discount))"
    charge = f"({disc} * (1.0 + l_tax))"
    measures = {
        "sum_qty": "l_quantity",
        "sum_base_price": "l_extendedprice",
        "sum_disc_price": disc,
        "sum_charge": charge,
    }

    def dec(p):
        return [
            F.expr(f"CAST(ROUND(SUM(CAST({m} AS DECIMAL({p},6))), 2) AS DOUBLE)").alias(a)
            for a, m in measures.items()
        ]

    def split():
        cols = []
        for a, m in measures.items():
            q = f"CAST({m} AS DECIMAL(18,6))"
            # whole units and micro remainder, each an exact BIGINT sum;
            # recombined in decimal AFTER the aggregate (2 scalar ops/group)
            cols.append(
                F.expr(
                    f"CAST(ROUND(SUM(CAST({q} AS BIGINT)) +"
                    f" CAST(SUM(CAST(({q} - CAST({q} AS BIGINT)) * 1000000 AS BIGINT))"
                    f" AS DECIMAL(38,6)) / 1000000, 2) AS DOUBLE)"
                ).alias(a)
            )
        return cols

    def longq():
        return [
            F.expr(
                f"CAST(ROUND(CAST(SUM(CAST(CAST({m} AS DECIMAL(18,6)) * 1000000 AS BIGINT))"
                f" AS DECIMAL(38,6)) / 1000000, 2) AS DOUBLE)"
            ).alias(a)
            for a, m in measures.items()
        ]

    def split2():
        # pure long-domain split: one decimal cast + one exact
        # micro-int per row, then integer div/mod — never a
        # >18-precision decimal scalar op per row
        cols = []
        for a, m in measures.items():
            micro = f"CAST(CAST({m} AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
            cols.append(
                F.expr(
                    f"CAST(ROUND(CAST(SUM({micro} div 1000000) AS DECIMAL(38,6))"
                    f" + CAST(SUM({micro} % 1000000) AS DECIMAL(38,6)) / 1000000,"
                    " 2) AS DOUBLE)"
                ).alias(a)
            )
        return cols

    variants = {
        "base": [F.count("*").alias("count_order")],
        "dec38": dec(38),
        "dec18": dec(18),
        "split": split(),
        "longq": longq(),
        "split2": split2(),
    }

    results = {}
    dfs = {
        name: l.groupBy("l_returnflag", "l_linestatus").agg(*aggs)
        for name, aggs in variants.items()
    }
    timings = {name: [] for name in variants}
    # round-robin interleave: host drift on this box is ±50% across
    # minutes, so sequential per-variant loops confound variant with
    # time — interleaving gives every variant the same drift exposure
    rounds = int(os.environ.get("EXP_ROUNDS", "7"))
    for _ in range(rounds):
        for name, df in dfs.items():
            spark.sparkContext.setJobDescription(f"exp_money:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            timings[name].append(round(time.perf_counter() - t0, 3))
    for name, df in dfs.items():
        results[name] = sorted(map(tuple, df.collect()))
        runs = timings[name]
        print(f"{name:6s} min={min(runs):6.3f} med={sorted(runs)[len(runs)//2]:6.3f} {runs}")

    ref = results["dec38"]
    for name in ("dec18", "split", "longq", "split2"):
        same = results[name] == ref
        print(f"{name} identical to dec38: {same}")
        if not same:
            for a, b in zip(ref, results[name]):
                if a != b:
                    print("  dec38:", a)
                    print(f"  {name}:", b)
                    break
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
