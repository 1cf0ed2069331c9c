"""Round-11 A/B: events_power_users_share with vs without scale_out.

The per-user rollup is a COUNT — no CPU-bound per-row work — so the
round-robin repartition scale_out injects at bench scale (scan
partitions < cores) is a full-table exchange bought for nothing, and
exact_ntile_multi plans the subtree three times per action (sketch +
count side + ranking side).  At 100 TB scale_out is a no-op by its own
guard, so the plans are identical there; this measures what the extra
local exchanges cost.  Bit-identity asserted at the end.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from mypipe_spark.operators.scale import exact_ntile_multi
from mypipe_spark.plans.catalog import (
    load_tables,
    round4_frac_sql,
    scale_out,
)
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-power-scaleout")
spark.sparkContext.setLogLevel("ERROR")


def power(with_scale_out: bool):
    ev = load_tables(spark, sf_dir)["events"]
    if with_scale_out:
        ev = scale_out(ev)
    u = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ev"))
    )
    d = exact_ntile_multi(u, 10, [("decile", ["n_ev", "user_id"])])
    per = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_ev").cast("long").alias("n_events"),
    )
    return per.select(
        F.col("decile").cast("int").alias("decile"),
        "n_users",
        "n_events",
        F.expr(
            round4_frac_sql(
                "CAST(n_events AS DECIMAL(38,0))",
                "SUM(CAST(n_events AS DECIMAL(38,0))) OVER ()",
                "div",
            )
        ).alias("event_share"),
    )


variants = {"old": True, "new": False}
t = {k: [] for k in variants}
rounds = int(os.environ.get("EXP_ROUNDS", "9"))
for name, flag in variants.items():
    power(flag).write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for name, flag in variants.items():
        spark.sparkContext.setJobDescription(f"exp_power_scaleout:{name}")
        t0 = time.perf_counter()
        power(flag).write.format("noop").mode("overwrite").save()
        t[name].append(round(time.perf_counter() - t0, 3))
for name, runs in t.items():
    print(
        f"{name:4s} min={min(runs):6.3f}"
        f" med={sorted(runs)[len(runs) // 2]:6.3f} {runs}"
    )
same = sorted(map(tuple, power(True).collect())) == sorted(
    map(tuple, power(False).collect())
)
print("identical:", same)
