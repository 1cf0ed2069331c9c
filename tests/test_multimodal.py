from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mypipe_spark.plans.multimodal import (
    MEDIA_META_SCHEMA,
    decode_media,
    frame_sample_plan,
    media_dedup,
    synthetic_media,
)


def _media(spark, sf_dir, n=30):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return synthetic_media(spark, docs, n=n)


def test_decode_media_schema_and_determinism(spark, sf_dir):
    media = _media(spark, sf_dir)
    meta = decode_media(media)
    assert meta.schema == MEDIA_META_SCHEMA
    rows = {r["media_id"]: r for r in meta.collect()}
    assert len(rows) == media.count()
    # cross-check one row against the stub computed driver-side
    src = media.filter(F.col("media_id") == 3).collect()[0]
    got = rows[3]
    blob = bytes(src["media"])
    assert got["n_bytes"] == len(blob)
    assert got["content_sha"] == hashlib.sha256(blob).hexdigest()
    # per-type metadata shape
    for r in rows.values():
        if r["media_type"] == "image":
            assert r["width"] and r["height"] and r["duration_ms"] is None
        elif r["media_type"] == "audio":
            assert r["duration_ms"] and r["width"] is None
        else:
            assert r["duration_ms"] and r["n_frames"]


def test_decode_media_runs_distributed(spark, sf_dir):
    # multiple input partitions -> the UDF must not assume one batch
    media = _media(spark, sf_dir, n=50).repartition(7)
    assert decode_media(media).count() == 50


def test_frame_sample_plan(spark, sf_dir):
    meta = decode_media(_media(spark, sf_dir))
    frames = frame_sample_plan(meta, every_n=1000)
    per = frames.groupBy("media_id").count().collect()
    metas = {r["media_id"]: r for r in meta.collect()}
    for row in per:
        n_frames = metas[row["media_id"]]["n_frames"]
        assert row["count"] == (n_frames - 1) // 1000 + 1
    # only videos expand
    assert set(metas[r["media_id"]]["media_type"] for r in per) == {"video"}


def test_media_dedup_finds_duplicate_blobs(spark, sf_dir):
    media = _media(spark, sf_dir, n=20)
    dup = media.withColumn("media_id", F.col("media_id") + 1000)
    d = media_dedup(decode_media(media.unionByName(dup)))
    rows = d.collect()
    assert all(r["n_copies"] == 2 for r in rows)
    assert all(r["canonical_media_id"] < 1000 for r in rows)
