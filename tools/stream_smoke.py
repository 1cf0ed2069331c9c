#!/usr/bin/env python
"""Streaming-plane scale smoke: amplify the generated changelog K-fold
and measure the FULL checkpointed pipeline — file-source replay →
transaction grouping (applyInPandasWithState) → effectively-once dedup
(dropDuplicatesWithinWatermark) → keyed latest-state MERGE — at 1x vs
Kx (round-5 verdict ask #5: the batch queries had K-fold evidence in
SCALING.md; the streaming plane only had a 1x throughput number).

Amplification mirrors tools/scale_smoke.py's structure-preserving
rules, applied to the changelog:

- ``seq``   → ``seq * K + i`` per replica i: per-replica binlog order
  is preserved (the tx state machine's precondition — a commit is
  never seen before its mutations) while replicas interleave globally,
  exactly like concurrent sessions in one binlog. Uniqueness holds, so
  seq-keyed dedup state scales linearly.
- ``txid``  → suffixed with ``-r{i}``: every replica re-enacts the
  same transaction structure (same sizes, same rollback pattern), so
  open-tx state and commit-gating work scale K-fold, not K²-fold.
- row-image ids → offset by ``i * 10_000_000`` inside the integer maps
  (int32-safe through K=200): the keyed MERGE state cardinality scales
  exactly K-fold.
- the amplified log keeps the SAME file count, so the microbatch COUNT
  stays fixed and each microbatch carries K× the rows — the "bigger
  trigger windows" shape a 100 TB deployment actually sees (scaling
  file count instead would measure trigger overhead K times).

Built-in structure check: the final keyed-state row count at Kx must
be exactly K times the 1x count — an amplifier bug (key collisions,
lost commits) fails the run rather than skewing the ratio.

Usage:
    python tools/stream_smoke.py [--factor 8] [--tx 800] [--repeat 2]
                                 [--scaling-md SCALING.md]

One JSON line per scale plus a summary; read ratios as magnitudes on a
jittery host (1x-ish = per-row cost constant; >>K = a blowup).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

_ID_OFFSET = 10_000_000  # int32-safe key offset per replica


def amplify_changelog(
    spark: SparkSession, base_dir: str, factor: int, out_dir: str, num_files: int
) -> None:
    base = spark.read.parquet(base_dir)
    reps = []
    for i in range(factor):
        r = base.withColumn("seq", F.col("seq") * factor + F.lit(i))
        if i:
            r = r.withColumn(
                "txid",
                F.when(
                    F.col("txid").isNotNull(),
                    F.concat(F.col("txid"), F.lit(f"-r{i}")),
                ),
            )
            def _shift(off):
                # factory, not a default arg: transform_values counts
                # the lambda's parameters, so a bound `_i=i` third
                # param is an analysis error
                return lambda k, v: F.when(k == "id", v + F.lit(off)).otherwise(v)

            for c in ("old_integers", "new_integers"):
                r = r.withColumn(
                    c, F.transform_values(F.col(c), _shift(i * _ID_OFFSET))
                )
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    # same file count as the base: fixed microbatch count, K× rows per
    # microbatch (see module docstring); mtime stamping carries the
    # delivery-order contract (see its docstring — equal mtimes lose
    # straddling transactions nondeterministically)
    out.repartitionByRange(num_files, "seq").write.mode("overwrite").parquet(out_dir)
    from mypipe_spark.changelog import stamp_increasing_mtimes

    stamp_increasing_mtimes(out_dir)


def run_pipeline(spark: SparkSession, cl_dir: str, scratch: str) -> dict:
    """One full checkpointed run over ``cl_dir``; returns wall time and
    the final keyed-state count.

    Two chained checkpointed stages with a parquet handoff — the
    file-based analog of the reference's producer → Kafka topic →
    consumer boundary (and a structural necessity: Spark rejects a
    plan where ``effectively_once``'s union would reference the
    applyInPandasWithState operator twice):

    stage 1: file replay → tx grouping (applyInPandasWithState) →
             committed, commit-restamped events → parquet
    stage 2: parquet replay → effectively-once dedup
             (dropDuplicatesWithinWatermark) → keyed latest-state
             MERGE (versioned snapshots)
    """
    from mypipe_spark.model import CHANGE_EVENT_SCHEMA
    from mypipe_spark.operators.txgroup import tx_group_stream
    from mypipe_spark.sources.stream import changelog_stream
    from mypipe_spark.streaming.upsert import (
        KeyedStateDir,
        latest_state_merge_for,
        streaming_merge,
    )
    from mypipe_spark.streaming.windows import effectively_once

    handoff = os.path.join(scratch, "committed")
    state_dir = os.path.join(scratch, "state")
    t0 = time.perf_counter()

    stream = changelog_stream(spark, cl_dir, max_files_per_trigger=1)
    grouped = tx_group_stream(stream)
    # tx_group_stream emits (txid, seq, op, ts[commit-restamped],
    # event_json); re-expand the full event and keep the commit ts
    ev = (
        grouped.select(
            F.col("ts").alias("commit_ts"),
            F.from_json("event_json", CHANGE_EVENT_SCHEMA).alias("ev"),
        )
        .select("ev.*", "commit_ts")
        .withColumn("ts", F.col("commit_ts"))
        .drop("commit_ts")
    )
    q1 = (
        ev.writeStream.format("parquet")
        .option("path", handoff)
        .option("checkpointLocation", os.path.join(scratch, "ckpt1"))
        .start()
    )
    try:
        q1.processAllAvailable()
        p1 = [json.loads(p.json) for p in q1.recentProgress]
    finally:
        q1.stop()

    stream2 = spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(handoff)
    deduped = effectively_once(stream2)
    proj = deduped.select(
        F.col("new_integers")["id"].alias("uid"),
        "seq",
        "op",
        F.col("new_integers")["login_count"].alias("version"),
    ).filter(F.col("uid").isNotNull())
    merge = latest_state_merge_for(["uid"], ["seq"], ["uid", "seq", "op", "version"])
    q2 = streaming_merge(
        proj, state_dir, merge, os.path.join(scratch, "ckpt2")
    )
    try:
        q2.processAllAvailable()
        p2 = [json.loads(p.json) for p in q2.recentProgress]
    finally:
        q2.stop()
    wall = time.perf_counter() - t0
    batches = [p for p in p1 + p2 if p.get("numInputRows", 0) > 0]
    state_rows = KeyedStateDir(state_dir).read(spark).count()
    return {
        "wall_s": round(wall, 3),
        "state_rows": state_rows,
        "n_batches": len(batches),
        "input_rows": sum(p["numInputRows"] for p in batches),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--tx", type=int, default=800, help="base transactions")
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=2, help="fastest-of-N per scale")
    ap.add_argument("--scaling-md", default=None, metavar="PATH")
    args = ap.parse_args()

    from mypipe_spark.changelog import write_changelog
    from mypipe_spark.session import get_spark

    spark = get_spark("stream-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="stream_smoke_")
    # the amplified corpus is the run's largest artifact — the finally
    # covers EVERY exit (amplifier/pipeline exceptions, a failing
    # --scaling-md append), not just a green summary
    try:
        base_dir = os.path.join(root, "cl_base")
        amp_dir = os.path.join(root, f"cl_x{args.factor}")
        write_changelog(
            spark, base_dir, num_transactions=args.tx, num_files=args.files
        )
        amplify_changelog(spark, base_dir, args.factor, amp_dir, args.files)

        results = {}
        for tag, d in (("base", base_dir), ("amp", amp_dir)):
            best = None
            for rep in range(args.repeat):
                scratch = os.path.join(root, f"run_{tag}_{rep}")
                r = run_pipeline(spark, d, scratch)
                if best is None or r["wall_s"] < best["wall_s"]:
                    best = r
                shutil.rmtree(scratch, ignore_errors=True)
            results[tag] = best
            print(json.dumps({"scale": tag, "factor": args.factor, **best}))

        base, amp = results["base"], results["amp"]
        ok = amp["state_rows"] == args.factor * base["state_rows"]
        summary = {
            "summary": "stream_smoke",
            "factor": args.factor,
            "pipeline": "file replay -> tx grouping -> effectively-once dedup -> latest-state MERGE",
            "base_s": base["wall_s"],
            "amp_s": amp["wall_s"],
            "ratio": round(amp["wall_s"] / max(base["wall_s"], 1e-9), 2),
            "structure_ok": ok,
            "base_state_rows": base["state_rows"],
            "amp_state_rows": amp["state_rows"],
        }
        print(json.dumps(summary))
        if args.scaling_md:
            _append_md(args.scaling_md, args, summary)
        return 0 if ok else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _append_md(path: str, args, s: dict) -> None:
    import datetime

    lines = [
        "",
        f"## Streaming plane — measured run, K={s['factor']}, "
        f"repeat={args.repeat}, {datetime.date.today().isoformat()} "
        "(machine-appended by tools/stream_smoke.py)",
        "",
        "| pipeline | 1x s | Kx s | ratio | state rows 1x→Kx | structure |",
        "|---|---|---|---|---|---|",
        f"| tx-group → dedup → MERGE | {s['base_s']} | {s['amp_s']} | "
        f"{s['ratio']} | {s['base_state_rows']}→{s['amp_state_rows']} | "
        f"{'exact K-fold' if s['structure_ok'] else 'FAILED'} |",
        "",
    ]
    with open(path, "a") as fh:
        fh.write("\n".join(lines))


if __name__ == "__main__":
    raise SystemExit(main())
