"""Transaction grouping (SURVEY §2.9 T1-T3) — emit-on-commit semantics.

The reference buffers mutations per open transaction and, on
COMMIT/XID, stamps them all with the commit timestamp and emits them
(optionally as one group); on ROLLBACK it discards the buffer
(reference: AbstractBinaryLogConsumer.scala:15-21 state,
handleBegin :124-129, handleRollback :131-134, commit :152-177;
config ``group-mutations-by-tx`` reference.conf:14-21).

Two implementations with identical semantics:

* :func:`committed_mutations` — **batch/relational form**: a join of
  mutations against commit markers on ``txid``. Declarative, fully
  SQL-expressible (this is what the DuckDB oracle checks), and at
  scale it is one shuffle on txid — skew-safe because a txid's row
  count is bounded by transaction size, not data size.
* :func:`tx_group_stream` — **streaming stateful form** on
  ``applyInPandasWithState``: state = the buffered events of each open
  transaction, keyed by txid, spilled to the state store (the
  reference keeps this buffer unbounded in heap — its known scale
  limit; Spark's state store removes it).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .decode import is_mutation


def committed_mutations(df: DataFrame, group_by_tx: bool = False) -> DataFrame:
    """Mutations of committed transactions, restamped with commit time.

    - discard-on-rollback: an inner join against commit markers drops
      rolled-back and still-open transactions in one go;
    - commit-time restamping (T3): ``ts`` becomes the commit event's
      timestamp, the original event time is kept as ``event_ts``;
    - ``group_by_tx=True`` emits one row per transaction with the
      mutations collected in order (the ``group-mutations-by-tx``
      flag), sorted by binlog sequence.
    """
    mutations = df.filter(is_mutation())
    commits = (
        df.filter(F.col("op") == "commit")
        .select("txid", F.col("ts").alias("commit_ts"))
        .dropDuplicates(["txid"])
    )
    stamped = (
        mutations.join(commits, "txid")
        .withColumn("event_ts", F.col("ts"))
        .withColumn("ts", F.col("commit_ts"))
        .drop("commit_ts")
    )
    if not group_by_tx:
        return stamped
    return (
        stamped.groupBy("txid")
        .agg(
            F.min("ts").alias("ts"),
            F.count("*").alias("n_mutations"),
            F.array_sort(
                F.collect_list(F.struct("seq", "op", "database", "table"))
            ).alias("mutations"),
        )
    )


# ---------------------------------------------------------------------------
# streaming stateful form
# ---------------------------------------------------------------------------

# Events cross the stateful operator as JSON strings: the state layout
# stays a flat (count, payload) pair regardless of the table schema,
# exactly like the reference's type-agnostic per-tx buffer.
_TX_INPUT_COLS = ("txid", "seq", "op", "ts_epoch", "event_json")
TX_OUTPUT_SCHEMA = (
    "txid string, seq long, op string, commit_ts_epoch double, event_json string"
)
# Grouped emission (`group-mutations-by-tx`, reference.conf:14-21;
# AbstractBinaryLogConsumer.scala:152-177): one row per committed tx.
# The mutation list crosses the state boundary as JSON so the operator
# schema stays flat; tx_group_stream re-expands it to array<struct>.
TX_GROUPED_OUTPUT_SCHEMA = (
    "txid string, commit_ts_epoch double, n_mutations long, mutations_json string"
)
_TX_MUTATION_STRUCT = (
    "array<struct<seq:bigint, op:string, database:string, table:string>>"
)
_TX_STATE_SCHEMA = "events string"


def _make_tx_state_fn(reap_open_tx_ms: int | None, group_by_tx: bool = False):
    def _tx_state_fn(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-txid state machine: buffer mutations; flush on commit
        with the commit timestamp; discard on rollback; optionally
        expire abandoned transactions on processing-time timeout."""
        import json

        if reap_open_tx_ms is not None and state.hasTimedOut:
            state.remove()
            return

        (buffered,) = state.get if state.exists else ("[]",)
        events: list[dict] = json.loads(buffered)

        outcome: str | None = None
        commit_ts = None
        for pdf in pdfs:
            for row in pdf.sort_values("seq").itertuples(index=False):
                if row.op in ("insert", "update", "delete"):
                    events.append(
                        {"seq": int(row.seq), "op": row.op, "event_json": row.event_json}
                    )
                elif row.op == "commit":
                    outcome, commit_ts = "commit", float(row.ts_epoch)
                elif row.op == "rollback":
                    outcome = "rollback"

        if outcome == "commit":
            state.remove()
            if events:
                # Restore original binlog order at commit time: a tx
                # whose rows span several Arrow chunks (or microbatches)
                # accumulates out of order; per-chunk sort_values alone
                # does not cover that.
                events.sort(key=lambda e: e["seq"])
                if group_by_tx:
                    muts = []
                    for e in events:
                        ej = json.loads(e["event_json"])
                        muts.append(
                            {
                                "seq": e["seq"],
                                "op": e["op"],
                                "database": ej.get("database"),
                                "table": ej.get("table"),
                            }
                        )
                    yield pd.DataFrame(
                        {
                            "txid": [key[0]],
                            "commit_ts_epoch": [commit_ts],
                            "n_mutations": [len(muts)],
                            "mutations_json": [json.dumps(muts)],
                        }
                    )
                else:
                    out = pd.DataFrame(events)
                    out.insert(0, "txid", key[0])
                    out["commit_ts_epoch"] = commit_ts
                    yield out[
                        ["txid", "seq", "op", "commit_ts_epoch", "event_json"]
                    ]
        elif outcome == "rollback":
            state.remove()
        else:
            state.update((json.dumps(events),))
            if reap_open_tx_ms is not None:
                state.setTimeoutDuration(reap_open_tx_ms)

    return _tx_state_fn


def tx_group_stream(
    df: DataFrame,
    reap_open_tx_ms: int | None = None,
    group_by_tx: bool = False,
) -> DataFrame:
    """Streaming transaction grouping over the canonical change stream.

    Input: any (batch or streaming) DataFrame with CHANGE_EVENT_SCHEMA
    columns. Output: committed mutations only, with ``ts`` restamped to
    the commit time, in original binlog order per transaction.

    ``group_by_tx=True`` emits ONE row per committed transaction —
    ``(txid, ts, n_mutations, mutations array<struct>)`` — matching
    :func:`committed_mutations(group_by_tx=True)` column-for-column
    (the reference's ``group-mutations-by-tx`` flag, reference.conf:14-21;
    AbstractBinaryLogConsumer.scala:152-177).

    The full event row rides through the state machine as JSON so the
    state store layout is schema-agnostic; callers re-expand with
    ``from_json`` + CHANGE_EVENT_SCHEMA.

    ``reap_open_tx_ms``: optional processing-time timeout that discards
    transactions left open that long (the reference buffers them
    forever — AbstractBinaryLogConsumer.scala:17's known limit). Leave
    None for faithful semantics; NOTE a registered timeout makes
    Structured Streaming schedule timeout-check microbatches
    continuously, so ``processAllAvailable``-style draining never
    idles — only enable it on long-running production streams."""
    keyed = df.select(
        "txid",
        "seq",
        "op",
        F.col("ts").cast("double").alias("ts_epoch"),
        F.to_json(F.struct(*df.columns)).alias("event_json"),
    ).filter(F.col("txid").isNotNull())

    grouped = keyed.groupBy("txid").applyInPandasWithState(
        _make_tx_state_fn(reap_open_tx_ms, group_by_tx=group_by_tx),
        outputStructType=(
            TX_GROUPED_OUTPUT_SCHEMA if group_by_tx else TX_OUTPUT_SCHEMA
        ),
        stateStructType=_TX_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if reap_open_tx_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
    stamped = grouped.withColumn(
        "ts", F.timestamp_seconds(F.col("commit_ts_epoch"))
    ).drop("commit_ts_epoch")
    if group_by_tx:
        stamped = stamped.select(
            "txid",
            "ts",
            "n_mutations",
            F.from_json("mutations_json", _TX_MUTATION_STRUCT).alias("mutations"),
        )
    return stamped
