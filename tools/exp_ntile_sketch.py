"""Round-11 A/B: exact_ntile_multi boundary-sketch accuracy.

The coarse-bucket boundary sketch ran percentile_approx at accuracy
10_000 (inherited from the catalog's PCTL_ACCURACY, which IS part of
declared outputs).  Inside exact_ntile_multi the accuracy can never
change a result — boundaries only balance the coarse buckets; the
rank arithmetic is exact for any monotone bucketing applied
consistently to both plan sides — so the knob trades eager-job GK
merge cost against balance precision the 1/P-wide buckets cannot use.

Interleaved A/B over the three ntile consumers at accuracies 10_000 /
1_000 / 100; bit-identity of all three queries asserted across
accuracies at the end.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from mypipe_spark.operators import scale as S
from mypipe_spark.plans import analytics as A
from mypipe_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-ntile-sketch")
spark.sparkContext.setLogLevel("ERROR")

NAMES = [
    "q_customer_balance_deciles",
    "events_power_users_share",
    "events_rfm_segments",
]
ACCS = [10_000, 1_000, 100]


# restore the value the module SHIPPED with, not a hardcoded copy of
# it — if the default is ever retuned, a stale literal here would
# silently leave the knob wrong for the rest of the session (r11
# ADVICE)
_ORIG_ACCURACY = S.NTILE_SKETCH_ACCURACY


def build(name, acc):
    S.NTILE_SKETCH_ACCURACY = acc
    try:
        return getattr(A, name)(spark, sf_dir)
    finally:
        S.NTILE_SKETCH_ACCURACY = _ORIG_ACCURACY


t = {(n, a): [] for n in NAMES for a in ACCS}
rounds = int(os.environ.get("EXP_ROUNDS", "7"))
for n in NAMES:
    for a in ACCS:
        build(n, a).write.format("noop").mode("overwrite").save()
for _ in range(rounds):
    for n in NAMES:
        for a in ACCS:
            spark.sparkContext.setJobDescription(f"exp_ntile_sketch:{n}:{a}")
            t0 = time.perf_counter()
            build(n, a).write.format("noop").mode("overwrite").save()
            t[(n, a)].append(round(time.perf_counter() - t0, 3))
for n in NAMES:
    for a in ACCS:
        runs = t[(n, a)]
        print(
            f"{n:28s} acc={a:6d} min={min(runs):6.3f}"
            f" med={sorted(runs)[len(runs) // 2]:6.3f} {runs}"
        )
for n in NAMES:
    ref = sorted(map(tuple, build(n, 10_000).collect()))
    for a in (1_000, 100):
        same = sorted(map(tuple, build(n, a).collect())) == ref
        print(f"{n} acc={a}: identical to 10000: {same}")
