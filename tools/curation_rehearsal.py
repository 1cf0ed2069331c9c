#!/usr/bin/env python3
"""Composed end-to-end curation rehearsal at K-fold scale (round-8
verdict ask #5): run the WHOLE run_curation pipeline — constraint
audit → funnel → MinHash near-dup → temperature mix → scrub →
training shards, audit-gated — over 1x and Kx corpora as ONE
pipeline, and record wall clock + the full audit + output-shard
layout in SCALING.md.

Why not tools/scale_smoke.py's amplifier: it suffixes EVERY word so
replicas share zero shingles — which destroys the stopword ratio, so
the funnel's quality stage fails every replica doc and the per-source
keep-rate collapses below the 60% prune bar: at K>1 the whole corpus
drops at the first stage and the composed pipeline degenerates to an
audit of zeros (observed: n_drop_source=160000, 0 shards). This
rehearsal amplifies with a STOPWORD-PRESERVING word suffix instead:

- non-stopwords get the ``~i`` replica tag (per-word bijection), so
  within-replica duplicate/near-dup/repetition structure replicates
  EXACTLY (bigram and shingle multisets map bijectively);
- the 6 engine stopwords (plans/textops._STOPWORDS) stay verbatim, so
  n_tokens/n_stop — and therefore every quality, source-prune and
  repetition verdict — are identical per replica;
- cross-replica shingle sharing is limited to all-stopword 3-grams,
  which at Kx are exactly the hot shingles the dedup plane's
  _STOP_SHINGLE_DF_CAP exists to absorb (so the rehearsal also
  exercises that cap under composed load);
- doc_id shifts by i*1e9, source/lang stay (the prune groups by
  source ACROSS replicas, like a real corpus grown 32x).

Expected structure (asserted): every funnel audit count and the
near-dup loser count scale exactly K-fold; shards stay balanced.

Usage: python3 tools/curation_rehearsal.py [--factor 32] [--repeat 2]
           [--budget 500] [--scaling-md SCALING.md]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mypipe_spark.curate import run_curation  # noqa: E402
from mypipe_spark.plans.textops import _SW_SQL  # noqa: E402
from mypipe_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
_OFFSET = 1_000_000_000


def amplified_docs_path(spark, factor: int) -> str:
    path = f"/tmp/curation_rehearsal_docs_x{factor}"
    if os.path.exists(f"{path}/_SUCCESS"):
        return path
    shutil.rmtree(path, ignore_errors=True)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = []
    for i in range(factor):
        r = base
        if i:
            r = r.withColumn("doc_id", F.col("doc_id") + F.lit(i * _OFFSET))
            r = r.withColumn(
                "text",
                F.expr(
                    "array_join(transform(split(text, ' '), w ->"
                    f" CASE WHEN w IN ({_SW_SQL}) THEN w"
                    f" ELSE concat(w, '~{i}') END), ' ')"
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.write.parquet(path)
    return path


def run_once(spark, docs, budget: int, out_dir: str) -> tuple[float, dict, int]:
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    audit = run_curation(
        spark,
        {
            "out_dir": out_dir,
            "budget": budget,
            "near_dup": True,
            "audit_checks": "default",
            "shards_per_stratum": 4,
            "rows_per_file": 100_000,
        },
        docs=docs,
    )
    wall = round(time.time() - t0, 3)
    nfiles = sum(
        1 for _, _, fs in os.walk(out_dir) for f in fs if f.endswith(".parquet")
    )
    return wall, audit, nfiles


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=32)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--budget", type=int, default=500)
    ap.add_argument("--scaling-md", default=None)
    args = ap.parse_args()
    spark = get_spark("curation_rehearsal")

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    amp = spark.read.parquet(amplified_docs_path(spark, args.factor))

    runs_1x = [
        run_once(spark, base, args.budget, "/tmp/curation_rehearsal_out_1x")
        for _ in range(args.repeat)
    ]
    runs_kx = [
        run_once(
            spark, amp, args.budget * args.factor,
            f"/tmp/curation_rehearsal_out_x{args.factor}",
        )
        for _ in range(args.repeat)
    ]
    w1 = min(r[0] for r in runs_1x)
    wk = min(r[0] for r in runs_kx)
    a1, ak = runs_1x[-1][1], runs_kx[-1][1]
    f1, fk = runs_1x[-1][2], runs_kx[-1][2]
    # structural K-fold checks on the composed audit. n_written is
    # deliberately EXCLUDED: the temperature mix allocates per-stratum
    # with integer rounding, so budget adherence is ±strata by
    # contract — it gets its own near-budget check instead.
    exact = {
        k: (ak[k] == args.factor * a1[k])
        for k in ("n_input", "n_drop_source", "n_drop_quality",
                  "n_drop_repetition", "n_drop_duplicate", "n_kept",
                  "n_near_dup")
    }
    budget_kx = args.budget * args.factor
    written_ok = abs(ak["n_written"] - budget_kx) <= 16  # ±strata slack
    result = {
        "rehearsal": "run_curation_composed",
        "factor": args.factor,
        "repeat": args.repeat,
        "base_s": w1,
        "amp_s": wk,
        "ratio": round(wk / w1, 2),
        "audit_1x": {k: v for k, v in a1.items() if k != "constraints"},
        "audit_kx": {k: v for k, v in ak.items() if k != "constraints"},
        "kfold_exact": exact,
        "written_within_budget_slack": written_ok,
        "shard_files_1x": f1,
        "shard_files_kx": fk,
    }
    print(json.dumps(result))
    # the docstring's "asserted": a structural count that fails to
    # scale exactly K-fold is a composed-plan regression — fail the
    # run, don't just append a row
    if not (all(exact.values()) and written_ok):
        print(
            f"FAIL: K-fold structure broken: {exact}, "
            f"n_written={ak['n_written']} vs budget {budget_kx}",
            file=sys.stderr,
        )
        return 1
    if args.scaling_md:
        with open(args.scaling_md, "a") as f:
            f.write(
                f"\n## Composed curation rehearsal — K={args.factor}, "
                f"repeat={args.repeat}, {time.strftime('%Y-%m-%d')} "
                f"(machine-appended by tools/curation_rehearsal.py)\n\n"
                f"| pipeline | 1x s | Kx s | ratio | audit K-fold exact | "
                f"shards 1x→Kx |\n|---|---|---|---|---|---|\n"
                f"| audit→funnel→near-dup→mix→scrub→shards | {w1} | {wk} "
                f"| {result['ratio']} "
                f"| {'ALL' if all(exact.values()) else exact}"
                f" (n_written within mix rounding: {written_ok}) "
                f"| {f1}→{fk} |\n\n"
                f"audit at Kx: `{json.dumps(result['audit_kx'])}`\n"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
