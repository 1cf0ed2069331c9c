#!/usr/bin/env python3
"""Embedding cell-cap BOUNDARY probe (round-8 verdict ask #6): the
cell-occupancy bound's disclosed failure modes, measured rather than
argued.

The bound (plans/dedup.py HONEST LIMITS): a `label` cell is sub-split
by mean-sign bits into at most 2^_CELL_MAX_BITS (=4096) sub-cells, so
within-cell pair work falls from the naive N²/2 to ~N²/2/4096 TOTAL
(each of the ~4096 finest sub-cells does (N/4096)²/2 — the per-task
quantity, 1/4096² of naive). Beyond N = _CELL_CAP·2^maxbits
(=1,048,576 at current settings) the refinement is exhausted:
sub-cell occupancy grows linearly with N again and pair work is
QUADRATIC in N with the 1/4096 total coefficient. This probe builds
the exact corpora the docstring warns about and measures:

- ``bound1x``: one lattice cell AT the bound (N = 1,048,576,
  independent straddling dims) — the last N the refinement fully
  absorbs;
- ``bound2x``: the same cell at 2x the bound — candidate pair work
  must come back ~4x bound1x's (quadratic), landing at ~N²/2/4096;
- ``degenerate``: 4096 identical vectors — no dim straddles the cell
  mean, ONE sub-cell survives, and all C(4096,2) pairs are computed
  (the audit's max_subcell alarm is the only defense).

Candidate work is computed exactly (Σ occ·(occ-1)/2 over sub-cells)
and the full dedup_embedding_cosine kernel is timed end-to-end
(count() — distributed, no driver collect). The audit flags asserted
here are also pinned at test scale in
tests/test_dedup.py::test_embedding_cell_audit_flags_beyond_bound_and_degenerate.

Usage: python3 tools/cell_bound_probe.py [--scaling-md SCALING.md]
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

from mypipe_spark.plans.catalog import TABLE_NAMES, all_queries  # noqa: E402
from mypipe_spark.plans.dedup import (  # noqa: E402
    _CELL_CAP,
    _CELL_MAX_BITS,
    _quantized_subcells,
)
from mypipe_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
BOUND = _CELL_CAP * (1 << _CELL_MAX_BITS)


def build_corpus(spark, path: str, cells) -> None:
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    parts = []
    for label, n, kind in cells:
        base = spark.range(n).select(
            (F.col("id") + label * 100_000_000).alias("vec_id"),
            F.lit(label).cast("int").alias("label"),
        )
        if kind == "lattice":
            emb = F.expr(
                "transform(sequence(0, 11), d -> CAST("
                "(pmod(hash(vec_id, d), 2001) - 1000) / 1000.0 AS FLOAT))"
            )
        else:
            emb = F.expr(
                "transform(sequence(0, 11), d -> CAST(0.5 AS FLOAT))"
            )
        parts.append(base.withColumn("embedding", emb))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.select("vec_id", "embedding", "label").write.parquet(
        f"{path}/embeddings.parquet"
    )
    for t in TABLE_NAMES:
        if t != "embeddings":
            os.symlink(f"{SF_DIR}/{t}.parquet", f"{path}/{t}.parquet")


def probe(spark, tag: str, cells) -> dict:
    qs = all_queries()
    path = f"/tmp/cell_bound_probe_{tag}"
    build_corpus(spark, path, cells)
    audit = [r.asDict() for r in qs["embedding_cell_audit"].fn(spark, path).collect()]
    # exact candidate work: sum of within-sub-cell pair counts
    work = (
        _quantized_subcells(spark, path)
        .groupBy("label", "subkey")
        .agg(F.count(F.lit(1)).alias("occ"))
        .agg(F.sum(F.expr("occ * (occ - 1) div 2")).alias("w"))
        .collect()[0]["w"]
    )
    t0 = time.time()
    n_pairs = qs["dedup_embedding_cosine"].fn(spark, path).count()
    wall = round(time.time() - t0, 3)
    shutil.rmtree(path, ignore_errors=True)
    return {
        "tag": tag,
        "n_vectors": sum(n for _, n, _ in cells),
        "audit": audit,
        "candidate_pairs": int(work),
        "kernel_wall_s": wall,
        "surviving_pairs": n_pairs,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling-md", default=None)
    args = ap.parse_args()
    spark = get_spark("cell_bound_probe")
    spark.sparkContext.setLogLevel("ERROR")

    r1 = probe(spark, "bound1x", [(0, BOUND, "lattice")])
    r2 = probe(spark, "bound2x", [(0, 2 * BOUND, "lattice")])
    rd = probe(spark, "degenerate", [(0, 4096, "identical")])

    naive = lambda n: n * (n - 1) // 2  # noqa: E731
    summary = {
        "probe": "embedding_cell_cap_boundary",
        "bound": BOUND,
        "runs": [r1, r2, rd],
        "work_ratio_2x_over_1x": round(
            r2["candidate_pairs"] / r1["candidate_pairs"], 3
        ),
        "total_coeff_vs_naive_1x": round(
            r1["candidate_pairs"] / naive(r1["n_vectors"]), 8
        ),
        "total_coeff_vs_naive_2x": round(
            r2["candidate_pairs"] / naive(r2["n_vectors"]), 8
        ),
        "degenerate_work_is_naive": rd["candidate_pairs"]
        == naive(rd["n_vectors"]),
    }
    print(json.dumps(summary))

    ok = True
    # quadratic beyond the bound: doubling N must ~quadruple the work
    if not 3.5 <= summary["work_ratio_2x_over_1x"] <= 4.5:
        print("FAIL: work did not scale quadratically", file=sys.stderr)
        ok = False
    # the total coefficient is ~1/4096 of naive (not 1/4096²— that is
    # the PER-SUB-CELL share)
    for k in ("total_coeff_vs_naive_1x", "total_coeff_vs_naive_2x"):
        if not (0.5 / 4096) <= summary[k] <= (2.0 / 4096):
            print(f"FAIL: {k}={summary[k]} not ~1/4096", file=sys.stderr)
            ok = False
    if not summary["degenerate_work_is_naive"]:
        print("FAIL: degenerate cell did not collapse to naive", file=sys.stderr)
        ok = False
    for r in (r2, rd):
        if not any(a["max_subcell"] > _CELL_CAP for a in r["audit"]):
            print(f"FAIL: audit alarm silent for {r['tag']}", file=sys.stderr)
            ok = False
    if not ok:
        return 1
    if args.scaling_md:
        with open(args.scaling_md, "a") as f:
            f.write(
                f"\n## Embedding cell-cap boundary probe — "
                f"{time.strftime('%Y-%m-%d')} (machine-appended by "
                f"tools/cell_bound_probe.py)\n\n"
                f"| corpus | N | candidate pairs | kernel wall s | "
                f"max_subcell | audit alarm |\n|---|---|---|---|---|---|\n"
                + "".join(
                    f"| {r['tag']} | {r['n_vectors']} | "
                    f"{r['candidate_pairs']} | {r['kernel_wall_s']} | "
                    f"{max(a['max_subcell'] for a in r['audit'])} | "
                    f"{'FIRES' if any(a['max_subcell'] > _CELL_CAP for a in r['audit']) else 'quiet'} |\n"
                    for r in (r1, r2, rd)
                )
                + f"\nMeasured: beyond the bound work is quadratic again "
                f"(2x N → {summary['work_ratio_2x_over_1x']}x pairs), at "
                f"~1/4096 of the naive N²/2 TOTAL "
                f"(coeff {summary['total_coeff_vs_naive_2x']}; the 1/4096² "
                f"figure is the per-finest-sub-cell/task share); the "
                f"all-identical-dims cell collapses to exactly naive "
                f"C(N,2) with the max_subcell alarm as the only defense.\n"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
