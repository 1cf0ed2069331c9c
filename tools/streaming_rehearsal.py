#!/usr/bin/env python3
"""Composed STREAMING curation rehearsal at K-fold scale (round-8
verdict ask #5): run_streaming_curation — stateless gates + PII scrub
+ epoch-keyed shard landing — driven over the whole (amplified)
corpus as ONE continuously-ingesting pipeline, with the two failure
modes a production stream actually meets injected mid-run:

- an **epoch replay** (at-least-once foreachBatch): one epoch's shard
  write completes on disk and THEN the batch dies (injected
  post-write failure — the worst case for a bare append sink); the
  restarted query replays the same epoch id;
- a **mid-run restart**: the query is stopped cold between waves and
  restarted on the same checkpoint after more data arrives.

Asserted structure (fails the run, not just a report):
- exactly-once landing: landed rows == the batch gate's keep count
  over the same corpus, and no doc_id lands twice across epochs — the
  epoch=<id> overwrite contract survives both injections;
- bounded state: the streaming plan is STATELESS by design (gates and
  scrub are per-row projections; the corpus-wide stages are batch
  jobs over the landed output) — every progress report must show zero
  stateOperators rows, so state cannot grow with input at any K.

Recorded (SCALING.md row): wall 1x vs Kx, ratio, epochs, landed
rows, max state rows/bytes across all progress reports, shard files.

Reuses tools/curation_rehearsal.py's stopword-preserving amplifier so
gate verdicts replicate exactly per replica (landed rows scale
K-fold — asserted).

Usage: python3 tools/streaming_rehearsal.py [--factor 8] [--waves 8]
           [--scaling-md SCALING.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from pyspark.sql import functions as F  # noqa: E402

import mypipe_spark.curate as cur  # noqa: E402
from curation_rehearsal import SF_DIR, amplified_docs_path  # noqa: E402
from mypipe_spark.plans.curation import gate_documents  # noqa: E402
from mypipe_spark.session import get_spark  # noqa: E402


def stage_waves(spark, docs, src: str, waves: range, n_total: int) -> None:
    """Append one mtime-ordered parquet file per wave (part names are
    UUID-random, so mtimes are stamped per wave as files appear).
    ``n_total`` is the WHOLE scenario's wave count — the pmod split
    must use the same modulus on every leg, or a half-range staging
    would overlap a later leg's waves."""
    seen = set(os.listdir(src)) if os.path.isdir(src) else set()
    base = time.time()
    for i in waves:
        wave = docs.filter(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_total)) == i
        )
        wave.coalesce(2).write.mode("append").parquet(src)
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in seen:
                os.utime(os.path.join(src, f), (base + i, base + i))
                seen.add(f)


def drain(q) -> list[dict]:
    """processAllAvailable + stop, returning every progress report's
    stateOperators section (the boundedness evidence)."""
    try:
        q.processAllAvailable()
    finally:
        ops = [p.get("stateOperators", []) for p in (q.recentProgress or [])]
        q.stop()
    return ops


def run_scenario(spark, docs, tag: str, n_waves: int) -> dict:
    src = f"/tmp/stream_rehearsal_src_{tag}"
    out = f"/tmp/stream_rehearsal_out_{tag}"
    ckpt = f"/tmp/stream_rehearsal_ckpt_{tag}"
    for d in (src, out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(src)

    def stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    def start():
        return cur.run_streaming_curation(
            spark, stream(), out, ckpt,
            shards_per_stratum=4, rows_per_file=100_000,
        )

    state_ops: list[dict] = []
    t0 = time.time()

    # leg 1: first half of the waves, with an injected post-write
    # epoch failure (the at-least-once replay path)
    stage_waves(spark, docs, src, range(0, n_waves // 2), n_waves)
    real = cur.write_training_shards
    armed = {"on": True}

    def failing(df, path, **kw):
        real(df, path, **kw)
        if armed["on"] and path.endswith("epoch=1"):
            armed["on"] = False
            raise RuntimeError("injected post-write epoch failure")

    cur.write_training_shards = failing
    injected = False
    try:
        q = start()
        try:
            state_ops += drain(q)
        except Exception as exc:  # noqa: BLE001 — the injection
            if "injected post-write" not in str(exc):
                raise
            injected = True
        # leg 2: restart on the same checkpoint — replays epoch 1
        state_ops += drain(start())
    finally:
        cur.write_training_shards = real

    # leg 3: mid-run restart — more waves arrive while the query is
    # down; restart drains them on the same checkpoint
    stage_waves(spark, docs, src, range(n_waves // 2, n_waves), n_waves)
    state_ops += drain(start())
    wall = round(time.time() - t0, 3)

    landed = spark.read.parquet(out)
    n_landed = landed.count()
    n_dup_ids = (
        landed.groupBy("doc_id").count().filter("count > 1").count()
    )
    n_want = (
        gate_documents(docs).filter(F.col("gate_keep") == 1).count()
    )
    epochs = len(glob.glob(f"{out}/epoch=*"))
    files = sum(
        1 for _, _, fs in os.walk(out) for f in fs if f.endswith(".parquet")
    )
    max_state_rows = max(
        (op.get("numRowsTotal", 0) for ops in state_ops for op in ops),
        default=0,
    )
    max_state_bytes = max(
        (op.get("memoryUsedBytes", 0) for ops in state_ops for op in ops),
        default=0,
    )
    return {
        "tag": tag,
        "wall_s": wall,
        "landed": n_landed,
        "expected": n_want,
        "dup_doc_ids": n_dup_ids,
        "epochs": epochs,
        "shard_files": files,
        "injected_replay_fired": injected,
        "max_state_rows": max_state_rows,
        "max_state_bytes": max_state_bytes,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--scaling-md", default=None)
    args = ap.parse_args()
    spark = get_spark("streaming_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    amp = spark.read.parquet(amplified_docs_path(spark, args.factor))

    r1 = run_scenario(spark, base, "1x", args.waves)
    rk = run_scenario(spark, amp, f"x{args.factor}", args.waves)
    result = {
        "rehearsal": "run_streaming_curation_composed",
        "factor": args.factor,
        "waves": args.waves,
        "ratio": round(rk["wall_s"] / r1["wall_s"], 2),
        "runs": [r1, rk],
    }
    print(json.dumps(result))

    ok = True
    for r in (r1, rk):
        if r["landed"] != r["expected"] or r["dup_doc_ids"] != 0:
            print(f"FAIL exactly-once: {r}", file=sys.stderr)
            ok = False
        if not r["injected_replay_fired"]:
            print(f"FAIL: injection never fired: {r}", file=sys.stderr)
            ok = False
        if r["max_state_rows"] != 0 or r["max_state_bytes"] != 0:
            print(f"FAIL stateless contract: {r}", file=sys.stderr)
            ok = False
    if rk["landed"] != args.factor * r1["landed"]:
        print("FAIL: landed rows did not scale K-fold", file=sys.stderr)
        ok = False
    if not ok:
        return 1
    if args.scaling_md:
        with open(args.scaling_md, "a") as f:
            f.write(
                f"\n## Composed STREAMING curation rehearsal — "
                f"K={args.factor}, waves={args.waves}, "
                f"{time.strftime('%Y-%m-%d')} (machine-appended by "
                f"tools/streaming_rehearsal.py)\n\n"
                f"| pipeline | 1x s | Kx s | ratio | landed 1x→Kx "
                f"(K-fold exact) | epochs | state rows/bytes (max) | "
                f"replay+restart exactly-once |\n"
                f"|---|---|---|---|---|---|---|---|\n"
                f"| gates→scrub→epoch-keyed shards | {r1['wall_s']} | "
                f"{rk['wall_s']} | {result['ratio']} | "
                f"{r1['landed']}→{rk['landed']} | "
                f"{r1['epochs']}→{rk['epochs']} | "
                f"{rk['max_state_rows']}/{rk['max_state_bytes']} | "
                f"dup_doc_ids=0 both, injected epoch replay + cold "
                f"mid-run restart both drained |\n"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
