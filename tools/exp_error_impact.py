#!/usr/bin/env python
"""Round-11 experiment: events_error_impact without pair enumeration.

The production form enumerates every (error, overlapping-user-span)
pair through the bucketed interval join — 10.2M pairs at sf0.1 — and
pays a count_distinct over that stream (measured 2.65 s of the 2.9 s
total). The distinct-user COUNT per error window is computable from
endpoint RANK counts, never materializing pairs (guide §1.1
first-principles; §8 "decide with small rows"):

For an error window [ws, we] (we = ws + 1h), user-day spans lie
inside single days, so only days d1 = day(ws) and d2 = day(we) can
overlap, and with W | DAY every count splits into a dense per-hour
prefix (744-row grid) plus a one-hour refinement join:

  A2 = |{spans on d2: a_start <= we}|   (offS(H_we) + in-hour refine)
  E  = |{spans on d1: a_end  <  ws}|    (offE(H_ws) + in-hour refine)
  same-day (d1 == d2):  n = A2 - E - 1          (self always overlaps)
  midnight  (d2 == d1+1): n = (N_d1 - E) + A2 - B - 1
  where B = |{users overlapping from BOTH days}| — bounded to spans
  ending in d1's last hour AND starting in d2's first hour.

Every shuffle is equi-keyed and tiny (hour keys / error_id); the only
pair-ish work is the in-hour refinement, whose fanout is bounded by
(endpoints per hour) x (errors per hour) and feeds a map-side count.
Requires event_id unique (the generator's PK — verified at all three
SFs) so per-event counts ARE per-error-id counts.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

W_US = 3_600_000_000
DAY_US = 86_400_000_000


def pairs_form(spark, sf_dir):
    """The pre-round-11 production body: bucketed interval join ->
    pair stream -> count_distinct (kept here as the A/B baseline
    after the counting form became production)."""
    from mypipe_spark.operators.intervals import bucketed_interval_join
    from mypipe_spark.plans.catalog import load_tables

    ev = (
        load_tables(spark, sf_dir)["events"]
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        )
    )
    act = ev.groupBy(
        "user_id", F.expr(f"us div {DAY_US}").alias("day")
    ).agg(F.min("us").alias("a_start"), F.max("us").alias("a_end"))
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("err_user"),
        F.col("us").alias("w_start"),
        (F.col("us") + W_US).alias("w_end"),
    )
    pairs = bucketed_interval_join(
        act.select("user_id", "a_start", "a_end"),
        err,
        "a_start",
        "a_end",
        "w_start",
        "w_end",
        W_US,
    ).filter(F.col("user_id") != F.col("err_user"))
    impact = pairs.groupBy("error_id").agg(
        F.count_distinct("user_id").cast("long").alias("n_affected_users")
    )
    return (
        err.select("error_id")
        .distinct()
        .join(impact, "error_id", "left")
        .select(
            "error_id",
            F.coalesce("n_affected_users", F.lit(0))
            .cast("long")
            .alias("n_affected_users"),
        )
    )


def counting_form(spark, sf_dir):
    from mypipe_spark.plans.catalog import load_tables

    ev = (
        load_tables(spark, sf_dir)["events"]
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        )
    )
    act = ev.groupBy(
        "user_id", F.expr(f"us div {DAY_US}").alias("day")
    ).agg(F.min("us").alias("a_start"), F.max("us").alias("a_end"))
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("us").alias("ws"),
        (F.col("us") + W_US).alias("we"),
        F.expr(f"us div {DAY_US}").alias("d1"),
        F.expr(f"(us + {W_US}) div {DAY_US}").alias("d2"),
        F.expr(f"us div {W_US}").alias("hws"),
        F.expr(f"(us + {W_US}) div {W_US}").alias("hwe"),
    )

    # dense per-day 24-hour grid with per-hour endpoint counts and
    # within-day exclusive prefix sums (vocab: H = global hour id)
    grid = (
        act.select("day")
        .distinct()
        .select("day", F.explode(F.expr("sequence(0, 23)")).alias("h"))
        .select("day", (F.col("day") * 24 + F.col("h")).alias("H"))
    )
    cnt_s = act.groupBy(F.expr(f"a_start div {W_US}").alias("H")).agg(
        F.count(F.lit(1)).alias("cs")
    )
    cnt_e = act.groupBy(F.expr(f"a_end div {W_US}").alias("H")).agg(
        F.count(F.lit(1)).alias("ce")
    )
    w_day = (
        Window.partitionBy("day")
        .orderBy("H")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        grid.join(cnt_s, "H", "left")
        .join(cnt_e, "H", "left")
        .select(
            "H",
            F.coalesce(F.sum("cs").over(w_day), F.lit(0)).alias("off_s"),
            F.coalesce(F.sum("ce").over(w_day), F.lit(0)).alias("off_e"),
        )
    )

    n_day = act.groupBy("day").agg(F.count(F.lit(1)).alias("nd"))

    refine_s = (
        act.select(F.expr(f"a_start div {W_US}").alias("hs"), "a_start")
        .join(err.select("error_id", "hwe", "we"), F.col("hs") == F.col("hwe"))
        .filter(F.col("a_start") <= F.col("we"))
        .groupBy("error_id")
        .agg(F.count(F.lit(1)).alias("rs"))
    )
    refine_e = (
        act.select(F.expr(f"a_end div {W_US}").alias("he"), "a_end")
        .join(err.select("error_id", "hws", "ws"), F.col("he") == F.col("hws"))
        .filter(F.col("a_end") < F.col("ws"))
        .groupBy("error_id")
        .agg(F.count(F.lit(1)).alias("re"))
    )

    last_h = act.filter(
        F.expr(f"a_end div {W_US} = (day + 1) * 24 - 1")
    ).select("user_id", "day", "a_end")
    first_h = act.filter(F.expr(f"a_start div {W_US} = day * 24")).select(
        F.col("user_id").alias("user2"),
        (F.col("day") - 1).alias("dprev"),
        F.col("a_start").alias("s2"),
    )
    both = last_h.join(
        first_h,
        (F.col("user_id") == F.col("user2")) & (F.col("day") == F.col("dprev")),
    ).select("day", F.col("a_end").alias("e1"), "s2")
    b_cnt = (
        both.join(
            err.filter(F.col("d2") > F.col("d1")).select(
                "error_id", F.col("d1").alias("bd"), "ws", "we"
            ),
            F.col("day") == F.col("bd"),
        )
        .filter((F.col("e1") >= F.col("ws")) & (F.col("s2") <= F.col("we")))
        .groupBy("error_id")
        .agg(F.count(F.lit(1)).alias("b"))
    )

    off_s_we = F.broadcast(
        offs.select(F.col("H").alias("hwe"), "off_s")
    )
    off_e_ws = F.broadcast(
        offs.select(F.col("H").alias("hws"), "off_e")
    )
    out = (
        err.join(off_s_we, "hwe", "left")
        .join(off_e_ws, "hws", "left")
        .join(refine_s, "error_id", "left")
        .join(refine_e, "error_id", "left")
        .join(F.broadcast(n_day.withColumnRenamed("day", "d1")), "d1", "left")
        .join(b_cnt, "error_id", "left")
    )
    a2 = F.coalesce("off_s", F.lit(0)) + F.coalesce("rs", F.lit(0))
    e_ = F.coalesce("off_e", F.lit(0)) + F.coalesce("re", F.lit(0))
    n = (
        a2
        - e_
        - 1
        + F.when(
            F.col("d2") > F.col("d1"),
            F.coalesce("nd", F.lit(0)) - F.coalesce("b", F.lit(0)),
        ).otherwise(F.lit(0))
    )
    return out.select(
        "error_id", n.cast("long").alias("n_affected_users")
    )


def main() -> int:
    from mypipe_spark.plans.analytics import events_error_impact
    from mypipe_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-error-impact")
    spark.sparkContext.setLogLevel("ERROR")

    dfs = {
        "pairs": pairs_form(spark, sf_dir),
        "counting": counting_form(spark, sf_dir),
        "prod": events_error_impact(spark, sf_dir),
    }
    timings = {name: [] for name in dfs}
    rounds = int(os.environ.get("EXP_ROUNDS", "7"))
    for _ in range(rounds):
        for name, df in dfs.items():
            spark.sparkContext.setJobDescription(f"exp_error_impact:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            timings[name].append(round(time.perf_counter() - t0, 3))
    results = {}
    for name, df in dfs.items():
        results[name] = sorted(map(tuple, df.collect()))
        runs = timings[name]
        print(
            f"{name:9s} min={min(runs):6.3f} "
            f"med={sorted(runs)[len(runs) // 2]:6.3f} {runs}"
        )
    same = (
        results["counting"] == results["pairs"] == results["prod"]
    )
    print("counting/prod identical to pairs:", same)
    if not same:
        pa = dict(results["pairs"])
        co = dict(results["prod"])
        diffs = [
            (k, pa.get(k), co.get(k))
            for k in set(pa) | set(co)
            if pa.get(k) != co.get(k)
        ]
        print(f"{len(diffs)} differing error_ids; first 10:")
        for row in sorted(diffs)[:10]:
            print("   id/pairs/counting:", row)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
