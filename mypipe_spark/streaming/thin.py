"""Streaming burst suppression (debounce) — the stateful twin of the
batch thinning stage (plans.analytics.debounce_starters).

A telemetry pipe thins retry storms / double-clicks BEFORE rate
metrics; batch replay can use the LAG window, but a live stream needs
per-key state: the last raw event time of each (user_id, event_type).
That is one BIGINT per key — ``applyInPandasWithState`` with a
single-field state struct, the same mechanism as the tx-grouping
state machine (operators/txgroup.py) but with O(1) state instead of a
buffered transaction.

Semantics contract (shared with the batch twin, pinned stream==batch
in tests/test_thin.py): an event is kept iff its gap from the
previous RAW same-key event exceeds the threshold — so a chain of
sub-threshold gaps stays one burst no matter how long it spans.
The equality holds under the ordered-replay contract every changelog
consumer here relies on (per-key event-time order across microbatches
— file replay via changelog.stamp_increasing_mtimes): state carries
only ``last_us``, so a late event that time-travels behind it would
start a spurious burst in streaming where batch LAG would not. Late
data needs the SCD2-style dead-letter guard upstream, not silent
reordering here.

Timeless events (ts NULL) are excluded by the same contract as every
event-time operator in the catalog.

Scale shape: state is ~16 bytes per live (user, type) key; each
microbatch shuffles once on the key (the stateful-operator exchange)
and does a per-key linear pass. No watermark is required for
correctness of the kept-set (append-only output, monotone state).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.analytics import _DEBOUNCE_US

_OUT_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, ts timestamp_ntz"
)
_STATE_SCHEMA = "last_us bigint"


def _make_thin_fn(threshold_us: int):
    def thin(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (last_us,) = state.get if state.exists else (None,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        # per-key order within the microbatch mirrors the batch
        # window's ORDER BY us ASC, event_id ASC NULLS LAST
        batch = batch.sort_values(
            ["us", "event_id"], na_position="last", kind="mergesort"
        )
        keep = []
        for us in batch["us"]:
            us = int(us)
            keep.append(last_us is None or us - last_us > threshold_us)
            last_us = us
        state.update((last_us,))
        kept = batch.loc[keep, ["event_id", "user_id", "event_type", "ts"]]
        if len(kept):
            # pandas promotes NULL-bearing int columns to float64+NaN;
            # convert to nullable Int64 so Arrow hands Spark a bigint
            # with true NULLs (a NULL event_id is a legal kept row,
            # and a NULL user_id is a legal grouping key)
            kept = kept.assign(
                event_id=kept["event_id"].astype("Int64"),
                user_id=kept["user_id"].astype("Int64"),
            )
            yield kept

    return thin


def debounce_stream(
    events: DataFrame, threshold_us: int = _DEBOUNCE_US
) -> DataFrame:
    """Kept (burst-starting) events of a STREAMING events DataFrame —
    column-for-column the batch :func:`debounce_starters` output.
    ``events`` needs the canonical columns (event_id, user_id,
    event_type, ts); extra columns are ignored."""
    e = events.filter(F.col("ts").isNotNull()).select(
        F.col("event_id").cast("bigint"),
        F.col("user_id").cast("bigint"),
        "event_type",
        F.col("ts").cast("timestamp_ntz"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
    )
    return e.groupBy("user_id", "event_type").applyInPandasWithState(
        _make_thin_fn(threshold_us),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
