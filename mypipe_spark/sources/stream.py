"""Streaming sources for the canonical change stream.

The reference's source is a fake-replica binlog tap
(mysql/AbstractMySQLBinaryLogConsumer.scala:124-149). This engine's
equivalent contract is: *an append-only, seq-ordered stream of
canonical change events*. Concrete carriers:

* **file source** — a directory of parquet/JSON change-log files
  (what :func:`mypipe_spark.changelog.write_changelog` produces, and
  what a real binlog tap would land); ``maxFilesPerTrigger=1`` replays
  it file-by-file like a live stream. Offsets/resume come from the
  Structured Streaming checkpoint (the binlog (file,pos) analog, S2).
* **kafka source** — ``readStream.format("kafka")`` when brokers and
  the kafka connector jar exist; gated, since this environment has
  neither. The wire decode is :func:`mypipe_spark.sinks.wire.decode_generic`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..model import CHANGE_EVENT_SCHEMA


def changelog_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Replayable change-log file stream with the canonical schema.
    ``None`` disables the trigger cap; an explicit 0 is forwarded to
    Spark (which rejects it) rather than silently meaning "no limit"
    — truthiness would invert the caller's intent."""
    reader = spark.readStream.schema(CHANGE_EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def changelog_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of the same change log (snapshot/bootstrap path)."""
    return spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(path)


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: str,
    starting_offsets: str = "earliest",
    format: str = "kafka",
) -> DataFrame:
    """Kafka change-stream source (S14). Requires the kafka connector
    jar on the classpath; raises the underlying AnalysisException if
    it is absent — callers gate on availability.

    ``format`` swaps the carrier while keeping the exact option names
    and record schema: ``"kafka"`` (default, the real connector) or
    ``"kafkafile"`` (sources/kafka_shim.py — the file-backed wire twin
    this sandbox's broker-less tests run the SAME configuration
    against; register it first via
    ``kafka_shim.register_kafka_file_shim``)."""
    return (
        spark.readStream.format(format)
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )
