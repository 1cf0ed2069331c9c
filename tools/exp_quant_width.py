#!/usr/bin/env python
"""Round-11 follow-up experiment: the micro-split money sums quantize
per row via CAST(x AS DECIMAL(18,6)), whose per-row bound (|x| < 1e12)
breaks the round-3-pinned _avg contract (per-row values to ~9.2e12 —
tests/test_oracle_parity.py::test_avg_sql_text_no_bigint_ceiling).
Which value-identical widening is cheapest?

  d18   — current production quantizer (the broken-contract baseline)
  d25   — CAST(x AS DECIMAL(25,6)): >18-digit per-row scalar cast
          (byte-array Decimal), same BIGINT split sums
  case  — abs(x) <= 999999999999.0 keeps the long-backed (18,6) cast,
          else the (25,6) branch; both branches land in BIGINT micro
  base  — scan+group floor, no money measures

All three quantizers produce the IDENTICAL BIGINT micro value for any
|x| < 9.2e12 (HALF_UP at scale 6 is width-independent once the value
fits), so the variants are value-identical wherever they don't
ANSI-overflow; the d18 form merely overflows earlier. Value identity
is asserted on the q1 output rows below.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SHIFT = 20
MASK = (1 << SHIFT) - 1


def split_sum(micro: str, alias: str) -> F.Column:
    return F.expr(
        f"CAST(ROUND((CAST(SUM(shiftright({micro}, {SHIFT})) AS DECIMAL(38,0))"
        f" * {1 << SHIFT} + SUM({micro} & {MASK})) / 1000000.0, 2) AS DOUBLE)"
    ).alias(alias)


def main() -> int:
    from mypipe_spark.plans.catalog import load_tables
    from mypipe_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-quant-width")
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

    def q18(m: str) -> str:
        return f"CAST(CAST({m} AS DECIMAL(18,6)) * 1000000 AS BIGINT)"

    def q25(m: str) -> str:
        return f"CAST(CAST({m} AS DECIMAL(25,6)) * 1000000 AS BIGINT)"

    def qcase(m: str) -> str:
        return (
            f"(CASE WHEN abs({m}) <= 999999999999.0 THEN {q18(m)}"
            f" ELSE {q25(m)} END)"
        )

    variants = {
        "base": [F.count("*").alias("count_order")],
        "d18": [split_sum(q18(m), a) for a, m in measures.items()],
        "d25": [split_sum(q25(m), a) for a, m in measures.items()],
        "case": [split_sum(qcase(m), a) for a, m in measures.items()],
    }

    dfs = {
        name: l.groupBy("l_returnflag", "l_linestatus").agg(*aggs)
        for name, aggs in variants.items()
    }
    timings = {name: [] for name in variants}
    rounds = int(os.environ.get("EXP_ROUNDS", "7"))
    for _ in range(rounds):
        for name, df in dfs.items():
            spark.sparkContext.setJobDescription(f"exp_quant_width:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            timings[name].append(round(time.perf_counter() - t0, 3))
    results = {}
    for name, df in dfs.items():
        results[name] = sorted(map(tuple, df.collect()))
        runs = timings[name]
        print(
            f"{name:5s} min={min(runs):6.3f} "
            f"med={sorted(runs)[len(runs) // 2]:6.3f} {runs}"
        )
    for name in ("d25", "case"):
        print(f"{name} identical to d18: {results[name] == results['d18']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
