"""Round-12 A/B: events_attribution_linear — vm money sums to the
long split (r11 verdict Next-round #6).

The registered query quantizes the purchase value via micro_quant_sql
(DECIMAL(32,0) micro-units), so the per-click credit arithmetic and
the final day rollup SUM run on >18-digit decimals — the BigDecimal
re-boxing buffer r11's Change 2 removed everywhere else. The new form
quantizes to BIGINT micro-units (micro_quant_spark_sql — identical
value for |value| ≤ ~4.6·10¹², ANSI-loud beyond: round_div doubles the
numerator, so the split path's row bound is half the usual BIGINT
micro ceiling), keeps round_div on BIGINT (same exact integer), and
rolls the day sum up through the hi/lo long split. DuckDB oracle
unchanged (HUGEINT path) — bit-identity asserted here and re-proved
by the preflight hash gate.

Interleaved old/new; bit-identity asserted at the end.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from mypipe_spark.plans import analytics as A
from mypipe_spark.plans.catalog import (
    load_tables,
    micro_quant_spark_sql,
    micro_split_sum_cols,
    micro_split_total_col,
    round_div_sql,
)
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-attr-money")
spark.sparkContext.setLogLevel("ERROR")


def old():
    return A.events_attribution_linear(spark, sf_dir)


def credits_new(events):
    p = events.filter(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_id").isNotNull()
    ).select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("pus"),
        F.expr(micro_quant_spark_sql("value")).alias("vm"),
    )
    c = events.filter(
        (F.col("event_type") == "click")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    ).select(
        F.col("user_id").alias("c_user"),
        F.date_trunc("day", "ts").alias("day"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("cus"),
    )
    j = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("cus") < F.col("pus"))
        & (F.col("cus") >= F.col("pus") - A._ATTR_WINDOW_US),
    )
    return (
        j.withColumn("n_win", F.count(F.lit(1)).over(Window.partitionBy("p_id")))
        .withColumn("credit_micro", F.expr(round_div_sql("vm", "n_win", "div")))
        .select("p_id", "vm", "day", "n_win", "credit_micro")
    )


def new():
    cred = credits_new(load_tables(spark, sf_dir)["events"])
    hi, lo = micro_split_sum_cols(F.col("credit_micro"))
    return cred.groupBy("day").agg(
        F.countDistinct("p_id").alias("n_purchases"),
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        (micro_split_total_col(hi, lo).cast("double") / F.lit(1000000.0)).alias(
            "credit"
        ),
    )


FORMS = {"old": old, "new": new}
t = {k: [] for k in FORMS}
rounds = int(os.environ.get("EXP_ROUNDS", "9"))
for k, fn in FORMS.items():
    fn().write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for k, fn in FORMS.items():
        spark.sparkContext.setJobDescription(f"exp_attr_money:{k}")
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        t[k].append(round(time.perf_counter() - t0, 3))
for k, runs in t.items():
    print(
        f"{k:4s} min={min(runs):6.3f} med={sorted(runs)[len(runs) // 2]:6.3f}"
        f" {runs}"
    )
a = sorted(map(tuple, old().collect()))
b = sorted(map(tuple, new().collect()))
print("bit-identical:", a == b)
if a != b:
    bad = [(x, y) for x, y in zip(a, b) if x != y][:5]
    print("first diffs:", bad)
