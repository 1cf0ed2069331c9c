#!/usr/bin/env python
"""Scale-up smoke: amplify the fixture corpus K-fold and measure how
the headline queries' wall-clock scales.

The brief's operative question is not "does it pass at sf0.1" but
"would the plan survive 100x". This tool produces the direct evidence:
it builds a K-times-larger corpus whose *work* is designed to scale
linearly, runs the bench queries at 1x and Kx, and prints the per-query
time ratio. A near-linear (or sublinear, for overhead-dominated small
queries) ratio means the operator does O(n) work; a superlinear ratio
flags an algorithmic blowup (quadratic candidate generation, a global
sort, a driver-side loop) that 1000 executors cannot save.

Amplification preserves each operator's structure instead of naively
unioning identical copies (which would *quadratically* inflate
near-dup/ANN work and measure the data generator, not the engine):

- fact tables replicate with key offsets (+i*1e9 per replica i) so
  referential integrity holds within each replica and join/group
  cardinalities scale linearly. The offset is even, preserving the
  catalog's ``user_id % 2`` predicates.
- ``nation``/``region`` stay single-copy: dimension tables are
  constant-size under TPC-H-style scaling (and broadcast regardless).
- ``documents`` replicas suffix every word with a replica tag, so
  replicas share ZERO shingles: each near-dup cluster replicates
  independently and the true pair count scales exactly K-fold.
  ``n_chars`` is recomputed for the rewritten text.
- ``embeddings`` replicas cyclically rotate the vector by i dims and
  shift ``label`` by i*1000. Rotation preserves norms and every
  INTRA-replica dot product bit-exactly (the near-dup structure
  replicates), while de-correlating replicas' LSH buckets — identical
  replica vectors would collide in every bucket and inflate the
  bucketed-ANN candidate set K^2-fold, measuring the amplifier instead
  of the engine. (``ann_topk_batch`` — brute force over query set x
  corpus — still genuinely scales K^2 when both sides grow K-fold;
  that is the operator's real complexity and exactly why
  ``ann_topk_batch_lsh`` exists.)

Usage:
    python tools/scale_smoke.py [--factor 8] [--sf-dir /root/testdata/sf0.1]
                                [--out-root /tmp] [--queries name ...]

Prints one JSON line per query plus a summary line; exit 0 unless a
query fails outright. Ratios are wall-clock on a jittery shared host —
read them as magnitudes (1x-ish vs Kx-ish vs K^2-ish), not decimals.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

# per-table integer key columns to offset per replica (referential
# integrity holds because both sides of every FK get the same offset)
_KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_DIM_TABLES = ("nation", "region")
_OFFSET = 1_000_000_000  # even: preserves user_id % 2 routing


def _replica(df: DataFrame, table: str, i: int) -> DataFrame:
    if i == 0:
        return df
    out = df
    for c in _KEY_COLS.get(table, ()):
        out = out.withColumn(c, F.col(c) + F.lit(i * _OFFSET))
    if table == "documents":
        # suffix every word: replicas share no shingles, so near-dup
        # clusters replicate independently (linear, not quadratic)
        out = out.withColumn(
            "text",
            F.expr(
                f"array_join(transform(split(text, ' '),"
                f" w -> concat(w, '~{i}')), ' ')"
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        out = out.withColumn("label", F.col("label") + F.lit(i * 1000))
        r = i % 64  # rotate by replica index (vectors are 64-dim)
        if r:
            out = out.withColumn(
                "embedding",
                F.expr(
                    f"concat(slice(embedding, {r + 1}, size(embedding) - {r}),"
                    f" slice(embedding, 1, {r}))"
                ),
            )
    return out


def amplify(spark: SparkSession, sf_dir: str, factor: int, out_dir: str) -> None:
    if factor > 64:
        # embedding de-correlation is a cyclic rotation of the 64-dim
        # vector, so replica i and i-64 would be bit-identical — they
        # would collide in every LSH bucket and re-introduce exactly
        # the K^2 candidate inflation the amplifier exists to avoid,
        # making any "superlinear" reading an artifact of the tool.
        raise ValueError(
            "factor > 64 exceeds the rotation period of the 64-dim "
            "embeddings; replicas would repeat and quadratically "
            "inflate the ANN/dedup planes"
        )
    for table in list(_KEY_COLS) + list(_DIM_TABLES):
        src = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(src):
            # fail loudly: silently skipping would stamp the completion
            # marker over a partial corpus and poison every later run
            raise FileNotFoundError(f"fixture table missing: {src}")
        base = spark.read.parquet(src)
        reps = 1 if table in _DIM_TABLES else factor
        df = base
        for i in range(1, reps):
            df = df.unionByName(_replica(base, table, i))
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out-root", default="/tmp")
    ap.add_argument("--repeat", type=int, default=3, help="fastest-of-N per query per scale")
    ap.add_argument("--rebuild", action="store_true", help="rebuild the amplified corpus even if present")
    ap.add_argument(
        "--scaling-md",
        default=None,
        metavar="PATH",
        help="append the per-query rows + summary as a markdown section "
        "to PATH (e.g. SCALING.md), so the recorded evidence cannot "
        "drift from what the tool measured. Takes an explicit path: an "
        "optional-value flag would swallow a following positional "
        "query name as its value.",
    )
    ap.add_argument("queries", nargs="*", help="default: the bench set")
    args = ap.parse_args()

    from mypipe_spark.plans.catalog import all_queries
    from mypipe_spark.session import get_spark

    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    names = args.queries or sorted(n for n, qd in qs.items() if qd.bench)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    tag = os.path.basename(args.sf_dir.rstrip("/"))
    amp_dir = os.path.join(args.out_root, f"scale_smoke_{tag}_x{args.factor}")
    marker = os.path.join(amp_dir, "_AMPLIFIED_OK")
    if args.rebuild and os.path.exists(amp_dir):
        shutil.rmtree(amp_dir)
    if not os.path.exists(marker):
        t0 = time.perf_counter()
        amplify(spark, args.sf_dir, args.factor, amp_dir)
        open(marker, "w").close()
        print(f"# amplified {args.sf_dir} x{args.factor} -> {amp_dir} "
              f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)

    failures = []
    ratios = []
    rows_out: list[dict] = []
    for name in names:
        row: dict[str, object] = {"query": name, "factor": args.factor}
        rows_out.append(row)
        try:
            for key, d in (("base_s", args.sf_dir), ("amp_s", amp_dir)):
                best = float("inf")
                for _ in range(args.repeat):
                    t0 = time.perf_counter()
                    qs[name].fn(spark, d).count()
                    best = min(best, time.perf_counter() - t0)
                row[key] = round(best, 3)
            row["ratio"] = round(row["amp_s"] / max(row["base_s"], 1e-9), 2)
            ratios.append(row["ratio"])
        except Exception as exc:  # noqa: BLE001 - report and continue
            row["error"] = f"{type(exc).__name__}: {exc}"[:300]
            failures.append(name)
        print(json.dumps(row))

    summary = {
        "summary": "scale_smoke",
        "factor": args.factor,
        "queries": len(names),
        "failed": failures,
        "median_ratio": sorted(ratios)[len(ratios) // 2] if ratios else None,
        "max_ratio": max(ratios) if ratios else None,
    }
    print(json.dumps(summary))
    if args.scaling_md:
        _append_scaling_md(args.scaling_md, args, rows_out, summary)
    return 1 if failures else 0


def _append_scaling_md(path: str, args, rows: list[dict], summary: dict) -> None:
    """Append a machine-written measurement section so SCALING.md's
    evidence always traces back to an actual tool run."""
    import datetime

    lines = [
        "",
        f"## Measured run — K={args.factor}, repeat={args.repeat}, "
        f"{datetime.date.today().isoformat()} (machine-appended)",
        "",
        "| query | 1x s | {K}x s | ratio |".replace("{K}", str(args.factor)),
        "|---|---|---|---|",
    ]
    for r in rows:
        if "error" in r:
            lines.append(f"| {r['query']} | — | — | ERROR: {r['error'][:80]} |")
        else:
            lines.append(
                f"| {r['query']} | {r['base_s']} | {r['amp_s']} | {r['ratio']} |"
            )
    lines.append("")
    lines.append(
        f"median **{summary['median_ratio']}**, max **{summary['max_ratio']}**, "
        f"failed: {summary['failed'] or 'none'}"
    )
    lines.append("")
    with open(path, "a") as fh:
        fh.write("\n".join(lines))


if __name__ == "__main__":
    raise SystemExit(main())
