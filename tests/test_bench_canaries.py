"""Smoke pins for bench.py's host-speed canaries.

The canaries qualify every BENCH_r{N}.json reading; a crash in one
would either kill the bench (compute probes, which run bare) or
silently null the bandwidth field (bw probe, which is retry-wrapped).
These pins run each probe at toy size so a probe regression fails in
the suite, not in the driver's once-per-round bench run."""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import bench  # noqa: E402


def test_bw_canary_runs_and_cleans_up(spark, monkeypatch):
    """The bandwidth probe returns a positive reading and leaves no
    NEW cached relation behind (a leaked 2 GiB cache in the bench
    session would distort every query that follows it). Asserted as a
    before/after delta, not global emptiness: the shared session
    fixture legitimately carries the dedup plane's session-persisted
    caches when those tests ran first. Total work is shrunk to
    ~128 MiB for the pin — the probe's fixed-TOTAL design is what's
    under test, not the 2 GiB reading."""
    monkeypatch.setattr(bench, "_CANARY_BW_TOTAL_ROWS", 65_536 * 2)
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    ms = bench._canary_bw_ms(spark, 2, repeats=2)
    assert ms > 0
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before, "bw canary leaked a cache"


def test_bw_canary_payload_is_incompressible_1kib(spark):
    """The probe's claim to measure bandwidth rests on ~1 KiB/row of
    non-repeating bytes: 52 DISTINCT hash strings per row (a repeated
    single hash would be run-length/dictionary-encoded away in the
    in-memory columnar cache and the 'scan' would stream almost
    nothing)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 4, 1, 2).select(
        F.expr(
            "concat_ws('', transform(sequence(1, 52), "
            "j -> cast(xxhash64(id * 52 + j) as string)))"
        ).alias("payload")
    )
    rows = df.select(F.length("payload").alias("n")).collect()
    assert all(800 <= r["n"] <= 1200 for r in rows)
    # distinctness: the 52 segments of one row are not one repeated
    # token (split by sign boundaries is awkward — just check the
    # payload has no 64-char repeating period)
    p = df.take(1)[0]["payload"]
    assert p[: len(p) // 2] != p[len(p) // 2 :]


def test_compute_canary_runs_single_partition(spark, monkeypatch):
    """The compute probe at reduced work: one task, one short fold."""
    monkeypatch.setattr(bench, "_CANARY_ROWS_PER_TASK", 1_000_000)
    ms = bench._canary_ms(spark, 1, repeats=1)
    assert ms > 0
