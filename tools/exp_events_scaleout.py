"""Round-11 A/B: drop scale_out from the keyed events queries.

events_skew_report (groupBy user), events_burst_rate and
events_rate_limit_audit (windows partitioned by user_id): in every
case the first real operator is itself an exchange keyed on user_id,
so the round-robin repartition scale_out injects at bench scale is a
strictly redundant extra exchange (window/groupBy parallelism comes
from the keyed shuffle, not from the scan partitioning; at 100 TB the
guard makes scale_out a no-op either way).  Window/aggregate outputs
are deterministic in the partitioning, so results cannot move —
asserted anyway.

Old = the registered functions as-is; new = same functions with
catalog/analytics scale_out patched to identity.  Interleaved rounds.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from mypipe_spark.plans import analytics as A
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-events-scaleout")
spark.sparkContext.setLogLevel("ERROR")

NAMES = [
    "events_key_skew_report",
    "events_burst_rate",
    "events_rate_limit_audit",
]
orig_scale_out = A.scale_out


def build(name, patched: bool):
    A.scale_out = (lambda df: df) if patched else orig_scale_out
    try:
        return getattr(A, name)(spark, sf_dir)
    finally:
        A.scale_out = orig_scale_out


t = {(n, p): [] for n in NAMES for p in (False, True)}
rounds = int(os.environ.get("EXP_ROUNDS", "9"))
for n in NAMES:  # warmup both variants, untimed
    build(n, False).write.format("noop").mode("overwrite").save()
    build(n, True).write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for n in NAMES:
        for p in (False, True):
            spark.sparkContext.setJobDescription(
                f"exp_events_scaleout:{n}:{'new' if p else 'old'}"
            )
            t0 = time.perf_counter()
            build(n, p).write.format("noop").mode("overwrite").save()
            t[(n, p)].append(round(time.perf_counter() - t0, 3))
for n in NAMES:
    for p in (False, True):
        runs = t[(n, p)]
        tag = "new" if p else "old"
        print(
            f"{n:26s} {tag} min={min(runs):6.3f}"
            f" med={sorted(runs)[len(runs) // 2]:6.3f} {runs}"
        )
for n in NAMES:
    same = sorted(map(tuple, build(n, False).collect())) == sorted(
        map(tuple, build(n, True).collect())
    )
    print(f"{n}: identical: {same}")
