"""Event-time windows + watermarks over the change stream
(SURVEY.md §2.9 T14 — absent in the reference because binlog order made
them unnecessary; the rebuilt engine exposes them because real feeds
(Kafka fan-in, multi-source union) are NOT globally ordered).

All three are thin declarative layers over Structured Streaming's
windowing; state (open windows) lives in the state store and is purged
by the watermark — bounded memory at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_mutation_counts(
    df: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is set) event-time counts
    of mutations per (database, table, op). Late events beyond the
    watermark are dropped; with append output mode a window only emits
    once it can no longer change — exactly-once window totals."""
    win = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    return (
        df.withWatermark("ts", watermark)
        .filter(F.col("op").isin("insert", "update", "delete"))
        .groupBy(win.alias("win"), "database", "table", "op")
        .agg(F.count("*").alias("n_mutations"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "database",
            "table",
            "op",
            "n_mutations",
        )
    )


def session_mutation_windows(
    df: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows per transaction id: a txid's events that arrive
    within ``gap`` of each other form one session — the streaming
    analog of the batch gaps-and-islands query (plans.cdc
    cdc_sessionize), using the built-in session_window state machine."""
    return (
        df.withWatermark("ts", watermark)
        # mutations only: BEGIN/COMMIT/ROLLBACK carry the same txid and
        # would inflate every session's count by the control-row pair
        .filter(
            F.col("txid").isNotNull()
            & F.col("op").isin("insert", "update", "delete")
        )
        .groupBy(F.session_window("ts", gap).alias("win"), "txid")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "txid",
            "n_events",
        )
    )


def effectively_once(
    df: DataFrame,
    keys: tuple[str, ...] = ("seq",),
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """At-least-once → effectively-once: drop redelivered duplicates
    inside the watermark horizon.

    The reference's delivery contract is at-least-once — a crash
    between producer flush and position save replays events
    (Pipe.scala:62-72; SURVEY.md §4 "backpressure/dedup: none,
    duplicates possible"). Its suggested remedy (dedup on the stable
    event identity downstream) is this operator:
    ``dropDuplicatesWithinWatermark`` keyed on the binlog sequence
    number (the (file, pos) analog — identical for a redelivery,
    distinct for genuinely new events).

    State is bounded: keys older than the watermark are evicted, so
    memory is O(events per watermark window) per partition — the
    100 TB-safe form of exactly-once-ish, vs. an unbounded
    ``dropDuplicates`` whose state never shrinks.

    Snapshot preload rows are exempt when deduping on ``seq``: the
    bootstrap stamps every preload row seq=0 / ts=epoch(0)
    (sources/snapshot.py), so seq-keyed dedup would collapse the whole
    snapshot to one row and the epoch-0 event time would fall behind
    the watermark the moment live events arrive — preloads bypass the
    dedup instead (they are loaded once as a batch, never
    redelivered).


    NULL-seq rows (a decoded frame with no offset column) also bypass:
    they carry no redelivery identity to dedup on, and a NULL key
    would collapse every such row within the watermark into one —
    silently dropping real events. Without the explicit branch they
    satisfy neither seq==0 nor seq!=0 and vanish entirely."""
    deduped = df
    preload = None
    if "seq" in keys and "seq" in df.columns:
        preload = df.filter((F.col("seq") == 0) | F.col("seq").isNull())
        deduped = df.filter(F.col("seq") != 0)
    deduped = deduped.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
    return deduped if preload is None else deduped.unionByName(preload)


def throughput_per_trigger(df: DataFrame) -> DataFrame:
    """Processing-rate probe: mutation counts by op only — the
    LatencySpec analog (reference asserts <10ms/mutation over 100 rows,
    LatencySpec.scala:169-172); in Spark the comparable signal is
    rows/microbatch from StreamingQueryProgress, and this tiny global
    aggregate gives the per-op split."""
    return (
        df.filter(F.col("op").isin("insert", "update", "delete"))
        .groupBy("op")
        .agg(F.count("*").alias("n"))
    )
