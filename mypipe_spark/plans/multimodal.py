"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata — the
large-scale pattern: bytes stay columnar in parquet, decode/feature
steps run as Arrow-batched ``mapInPandas`` stages, and everything
downstream (dedup, filtering, stats) operates on the extracted
metadata/features, never re-reading the blobs.

The actual codec step is STUBBED (this container ships no image/audio
libraries): :func:`_decode_stub` derives deterministic fake metadata
from the bytes. The Spark-side plumbing — schema, batch iteration,
partition sizing, UDF signature — is real and tested; swapping the
stub for PIL/ffmpeg is a one-function change behind
``MYPIPE_SPARK_REAL_CODECS``.

Scale notes (100 TB of media): ``mapInPandas`` streams Arrow batches,
so executor memory is bounded by batch size, not partition size;
``spark.sql.files.maxPartitionBytes`` (session default 128 MB) keeps
blob partitions executor-sized; the decode stage carries only
(id, media, media_type) — metadata joins back by id so the bytes cross
the Python boundary exactly once.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("media", BinaryType(), True),  # opaque blob
        StructField("source_uri", StringType(), True),
    ]
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        # nullable: a NULL blob decodes to NULL metadata (failed-
        # decode semantics) rather than masquerading as an empty one
        StructField("n_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
        # image: pixel dims / audio+video: duration_ms; frames for video
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def real_codecs_enabled() -> bool:
    return os.environ.get("MYPIPE_SPARK_REAL_CODECS", "") == "1"


def _decode_stub(media_type: str, blob: bytes) -> dict:
    """Deterministic fake decode: metadata derived from a content hash,
    so tests can assert exact values without codec libraries. Replace
    with PIL/soundfile/ffmpeg probes when real codecs are enabled."""
    if real_codecs_enabled():  # pragma: no cover - no codec libs here
        raise NotImplementedError(
            "real codecs requested but this build ships no image/audio libraries"
        )
    hasher = hashlib.sha256(blob or b"")
    h = int.from_bytes(hasher.digest()[:8], "big")
    out = {"content_sha": hasher.hexdigest()}
    if media_type == "image":
        out.update(width=64 + h % 1024, height=64 + (h >> 10) % 1024)
    elif media_type == "audio":
        out.update(duration_ms=1000 + h % 300_000)
    elif media_type == "video":
        out.update(duration_ms=1000 + h % 600_000, n_frames=24 + (h >> 16) % 10_000)
    return out


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode: MEDIA_SCHEMA rows → MEDIA_META_SCHEMA.

    One ``mapInPandas`` pass; each Arrow batch is decoded row-wise in
    Python (the codec call is inherently per-blob) but transferred
    columnar. The blob column is consumed here and does NOT appear in
    the output — downstream stages join metadata by media_id instead of
    dragging bytes through every shuffle."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for row in pdf.itertuples(index=False):
                # NULL blob -> NULL metadata (failed decode), NOT a
                # fake empty blob: coercing to b"" made a missing
                # asset indistinguishable from a zero-byte one and
                # diverged from the sha256(NULL)=NULL oracle
                if row.media is None:
                    metas.append(
                        {
                            "media_id": row.media_id,
                            "media_type": row.media_type,
                            "n_bytes": None,
                            "content_sha": None,
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                            "n_frames": None,
                        }
                    )
                    continue
                blob = bytes(row.media)
                m = _decode_stub(row.media_type, blob)
                metas.append(
                    {
                        "media_id": row.media_id,
                        "media_type": row.media_type,
                        "n_bytes": len(blob),
                        "content_sha": m["content_sha"],
                        "width": m.get("width"),
                        "height": m.get("height"),
                        "duration_ms": m.get("duration_ms"),
                        "n_frames": m.get("n_frames"),
                    }
                )
            yield pd.DataFrame(
                metas, columns=[f.name for f in MEDIA_META_SCHEMA.fields]
            )

    return df.mapInPandas(decode, MEDIA_META_SCHEMA)


def frame_sample_plan(meta: DataFrame, every_n: int = 24) -> DataFrame:
    """Video frame-sampling *plan*: expand each video row into the
    frame indices a sampler would decode (every ``every_n``-th frame).
    Pure column expressions — the expansion is a ``sequence`` +
    ``explode``, and the actual frame decode would be another
    mapInPandas keyed by (media_id, frame_idx)."""
    return (
        # n_frames IS NOT NULL: greatest() SKIPS NULLs in both
        # engines, so a failed-decode video would otherwise emit a
        # phantom frame 0
        meta.filter(
            (F.col("media_type") == "video") & F.col("n_frames").isNotNull()
        )
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def media_dedup(meta: DataFrame) -> DataFrame:
    """Exact media dedup on the decode-stage content hash — same
    hash-groupBy shape as document dedup (plans.dedup.dedup_exact):
    uniform 256-bit keys, no skew at any corpus size."""
    return meta.groupBy("content_sha").agg(
        F.min("media_id").alias("canonical_media_id"),
        F.count("*").alias("n_copies"),
        F.sum("n_bytes").alias("total_bytes"),
    )


def synthetic_media(spark, documents: DataFrame, n: int | None = None) -> DataFrame:
    """Build a deterministic media table from the documents fixture
    (text bytes as stand-in blobs) — the test corpus for the plumbing
    above. Cycle of image/audio/video by doc_id."""
    df = documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("media"),
        F.concat(F.lit("synthetic://doc/"), F.col("doc_id")).alias("source_uri"),
    )
    return df.limit(n) if n is not None else df


# ---------------------------------------------------------------------------
# registered query: the mapInPandas decode path, oracle-checked
# ---------------------------------------------------------------------------

from .catalog import load_tables, register  # noqa: E402


@register(
    "multimodal_decode_stats",
    oracle="""
    WITH media AS (
      SELECT CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
               AS media_type,
             strlen(text) AS n_bytes,
             sha256(text) AS content_sha
      FROM documents)
    SELECT media_type,
           COUNT(*) AS n_media,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT content_sha) AS n_unique
    FROM media
    GROUP BY media_type
    """,
    tags=("multimodal", "pandas-udf"),
)
def multimodal_decode_stats(spark, sf_dir: str) -> DataFrame:
    """The full multimodal plumbing driven end-to-end: synthetic blobs
    → Arrow-batched mapInPandas decode (stubbed codec) → metadata
    aggregate. The oracle replays the deterministic parts (byte length,
    content sha) in SQL, proving the Python decode stage preserves
    values batch-for-batch."""
    t = load_tables(spark, sf_dir)
    meta = decode_media(synthetic_media(spark, t["documents"]))
    return meta.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.count_distinct("content_sha").alias("n_unique"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH vids AS (
      SELECT doc_id AS media_id,
             CAST(24 + (CAST('0x' || substr(sha256(text), 1, 16) AS UBIGINT)
                        >> 16) % 10000 AS INT) AS n_frames
      FROM documents
      WHERE CAST(doc_id % 3 AS INT) = 2 AND text IS NOT NULL)
    SELECT media_id,
           CAST(UNNEST(range(0, greatest(n_frames - 1, 0) + 1, 24)) AS INT)
             AS frame_idx
    FROM vids
    """,
    tags=("multimodal", "video", "pandas-udf"),
)
def multimodal_frame_sample(spark, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan driven end-to-end: blobs → mapInPandas
    decode (stubbed codec yields n_frames) → sequence/explode into the
    (media_id, frame_idx) work list the frame-decode stage would
    consume. The oracle recomputes the stub's sha-derived frame count
    with UBIGINT hex arithmetic — bit-for-bit the same integers — then
    unnests the same stride; so the Python decode stage AND the
    expansion arithmetic are both value-checked. At 100 TB the work
    list is the shuffle unit: frames decode in (media_id, frame_idx)
    batches without ever re-shuffling blobs."""
    t = load_tables(spark, sf_dir)
    meta = decode_media(synthetic_media(spark, t["documents"]))
    return frame_sample_plan(meta, every_n=24).select(
        "media_id", F.col("frame_idx").cast("int").alias("frame_idx")
    )


@register(
    "multimodal_media_dedup",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id,
             sha256(text) AS content_sha,
             strlen(text) AS n_bytes
      FROM documents)
    SELECT content_sha,
           MIN(media_id) AS canonical_media_id,
           COUNT(*) AS n_copies,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
    FROM media
    GROUP BY content_sha
    """,
    tags=("multimodal", "dedup", "pandas-udf"),
)
def multimodal_media_dedup(spark, sf_dir: str) -> DataFrame:
    """Exact media dedup over the decode-stage content hash — the
    document-dedup topology applied to blobs: the bytes cross the
    Python boundary once (decode), and dedup groups the resulting
    uniform 256-bit keys; blobs never join against blobs. The oracle
    recomputes the hashes straight from the source bytes, proving the
    Arrow decode stage preserved every blob byte-for-byte."""
    t = load_tables(spark, sf_dir)
    meta = decode_media(synthetic_media(spark, t["documents"]))
    return media_dedup(meta)


# ---------------------------------------------------------------------------
# resize plan + feature extraction (the remaining multimodal stages)
# ---------------------------------------------------------------------------

_RESIZE_MAX_DIM = 512

MEDIA_FEAT_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("f0", IntegerType(), True),
        StructField("f1", IntegerType(), True),
        StructField("f2", IntegerType(), True),
        StructField("f3", IntegerType(), True),
    ]
)


def resize_plan(meta: DataFrame, max_dim: int = _RESIZE_MAX_DIM) -> DataFrame:
    """Image resize *plan*: aspect-preserving target dimensions in
    pure integer arithmetic (scale so the longer side equals
    ``max_dim``; never upscale). The pixel resample itself would be
    the next mapInPandas stage keyed by media_id — this computes WHAT
    to decode-and-resize without touching bytes, exactly like
    frame_sample_plan computes the frame work list."""
    m = F.greatest(F.col("width"), F.col("height"))
    scale = lambda c: F.greatest(  # noqa: E731 - tiny local combinator
        F.lit(1), F.expr(f"({c} * {max_dim}) div greatest(width, height)")
    )
    return (
        # failed decodes (NULL dims) carry no resize work — without
        # the guard both engines emit a phantom resized=1 row of NULLs
        meta.filter(
            (F.col("media_type") == "image") & F.col("width").isNotNull()
        )
        .select(
            "media_id",
            "width",
            "height",
            F.when(m <= max_dim, F.col("width"))
            .otherwise(scale("width"))
            .cast("int")
            .alias("new_width"),
            F.when(m <= max_dim, F.col("height"))
            .otherwise(scale("height"))
            .cast("int")
            .alias("new_height"),
            F.when(m <= max_dim, 0).otherwise(1).alias("resized"),
        )
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Feature-extraction stage: blobs → fixed-width feature columns
    via one Arrow-batched mapInPandas pass (the embedding-model /
    CLIP-encoder slot). The stub derives features from the content
    hash so the oracle can recompute them; a real extractor swaps the
    body and keeps the schema, batching, and shuffle shape."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                if row.media is None:  # failed decode -> NULL features
                    rows.append(
                        {
                            "media_id": row.media_id,
                            "media_type": row.media_type,
                            "f0": None, "f1": None, "f2": None, "f3": None,
                        }
                    )
                    continue
                d = hashlib.sha256(bytes(row.media)).digest()
                rows.append(
                    {
                        "media_id": row.media_id,
                        "media_type": row.media_type,
                        "f0": d[0],
                        "f1": d[1],
                        "f2": d[2],
                        "f3": d[3],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_FEAT_SCHEMA.fields]
            )

    return df.mapInPandas(feats, MEDIA_FEAT_SCHEMA)


@register(
    "multimodal_resize_plan",
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             CAST('0x' || substr(sha256(text), 1, 16) AS UBIGINT) AS hv
      FROM documents
      WHERE CAST(doc_id % 3 AS INT) = 0 AND text IS NOT NULL),
    dims AS (
      SELECT media_id,
             CAST(64 + hv % 1024 AS INT) AS width,
             CAST(64 + (hv >> 10) % 1024 AS INT) AS height
      FROM media)
    SELECT media_id, width, height,
           CAST(CASE WHEN GREATEST(width, height) <= {_RESIZE_MAX_DIM}
                THEN width
                ELSE GREATEST(1, (width * {_RESIZE_MAX_DIM})
                                 // GREATEST(width, height)) END AS INT)
             AS new_width,
           CAST(CASE WHEN GREATEST(width, height) <= {_RESIZE_MAX_DIM}
                THEN height
                ELSE GREATEST(1, (height * {_RESIZE_MAX_DIM})
                                 // GREATEST(width, height)) END AS INT)
             AS new_height,
           CASE WHEN GREATEST(width, height) <= {_RESIZE_MAX_DIM}
                THEN 0 ELSE 1 END AS resized
    FROM dims
    """,
    tags=("multimodal", "image", "pandas-udf"),
)
def multimodal_resize_plan(spark, sf_dir: str) -> DataFrame:
    """Image resize planning driven end-to-end: blobs → mapInPandas
    decode (stub yields sha-derived dimensions) → aspect-preserving
    integer target dims. The oracle recomputes the stub's dimensions
    with UBIGINT hex arithmetic and applies the same integer scaling,
    so the Python decode AND the resize arithmetic are value-checked.
    At 100 TB the plan rows are the work list a resample stage
    consumes in (media_id) batches. Only image blobs cross the
    Python boundary: the media_type filter sits BEFORE the opaque
    mapInPandas decode (Spark cannot push a filter through it), so
    audio/video bytes are never serialized and hashed for nothing."""
    t = load_tables(spark, sf_dir)
    meta = decode_media(
        synthetic_media(spark, t["documents"]).filter(
            F.col("media_type") == "image"
        )
    )
    return resize_plan(meta)


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
             AS media_type,
           CAST('0x' || substr(sha256(text), 1, 2) AS INT) AS f0,
           CAST('0x' || substr(sha256(text), 3, 2) AS INT) AS f1,
           CAST('0x' || substr(sha256(text), 5, 2) AS INT) AS f2,
           CAST('0x' || substr(sha256(text), 7, 2) AS INT) AS f3
    FROM documents
    """,
    tags=("multimodal", "features", "pandas-udf"),
)
def multimodal_feature_extract(spark, sf_dir: str) -> DataFrame:
    """The feature-extraction (encoder) slot driven end-to-end: blobs
    → Arrow-batched mapInPandas → per-media feature columns. The
    oracle recomputes the stub features from the source bytes'
    sha256, proving the batch path preserves every value; swapping in
    a real encoder changes the UDF body only."""
    t = load_tables(spark, sf_dir)
    return extract_features(synthetic_media(spark, t["documents"]))
