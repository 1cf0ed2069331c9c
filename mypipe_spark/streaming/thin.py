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
event-time operator in the catalog; the canonical projection, batch
ordering, and the exact id round-trip through the Arrow boundary are
the shared streaming/gate.py machinery (see its docstring for the
float64-promotion hazard the string id copy closes).

Scale shape: state is ~16 bytes per live (user, type) key; each
microbatch shuffles once on the key (the stateful-operator exchange)
and does a per-key linear pass. No watermark is required for
correctness of the kept-set (append-only output, monotone state).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.analytics import _DEBOUNCE_US
from .gate import GATE_EMIT_SCHEMA, canonical_events, emit_kept, restore_ids, sort_batch

_STATE_SCHEMA = "last_us bigint"


def _make_thin_fn(threshold_us: int):
    def thin(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (last_us,) = state.get if state.exists else (None,)
        batch = sort_batch(pd.concat(list(pdfs), ignore_index=True))
        keep = []
        for us in batch["us"]:
            us = int(us)
            keep.append(last_us is None or us - last_us > threshold_us)
            last_us = us
        state.update((last_us,))
        if any(keep):
            # (user_id, event_type) ARE the grouping key — emit both
            # from the exact key tuple, never the pandas columns
            yield emit_kept(batch, keep, key[0], event_type=key[1])

    return thin


def debounce_stream(
    events: DataFrame, threshold_us: int = _DEBOUNCE_US
) -> DataFrame:
    """Kept (burst-starting) events of a STREAMING events DataFrame —
    column-for-column the batch :func:`debounce_starters` output.
    ``events`` needs the canonical columns (event_id, user_id,
    event_type, ts); extra columns are ignored."""
    gated = canonical_events(events).groupBy(
        "user_id", "event_type"
    ).applyInPandasWithState(
        _make_thin_fn(threshold_us),
        outputStructType=GATE_EMIT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return restore_ids(gated)
