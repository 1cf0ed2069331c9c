"""Streaming rate-limit gate — the stateful twin of the batch
raw-arrival gate (plans.analytics.rate_limited_events /
events_rate_limit_audit).

A live ingest drops a user's surplus events once more than
``_RATE_LIMIT`` raw arrivals land inside the trailing
``_BURST_WINDOW_US`` window — the acting half of the
events_burst_rate detector (bot/scraper suppression before anything
downstream pays for the traffic). Batch replay states the gate as a
LAG window; a live stream needs per-key state: the timestamps of the
last ``_RATE_LIMIT`` RAW arrivals of each user.

That bound is the point — deciding "is this the (limit+1)-th arrival
in window" needs only the limit-th most recent previous arrival time,
so state is a fixed-length ring of ``_RATE_LIMIT`` BIGINTs per live
user NO MATTER HOW HOT the key (the hot key is exactly the case a
rate limiter exists for; an unbounded in-window buffer would make the
gate itself the memory victim of the attack it guards against).

Semantics contract (pinned stream==batch in tests/test_ratelimit.py):
an event is kept iff fewer than ``_RATE_LIMIT`` raw same-user
arrivals precede it in its trailing window, under the
(us, event_id ASC NULLS LAST) total order — identical to the batch
``rate_limit_keep_flag`` LAG form, which deliberately never counts a
same-timestamp peer the stream has not yet processed. The equality
holds under the ordered-replay contract every changelog consumer
here relies on (per-key event-time order across microbatches); late
data takes the SCD2-style dead-letter guard upstream, same as
streaming/thin.py.

Timeless events (ts NULL) are excluded by the same contract as every
event-time operator in the catalog; the canonical projection, batch
ordering, and the exact id round-trip through the Arrow boundary are
the shared streaming/gate.py machinery (its string id copy closes the
float64-promotion hazard for ids >= 2^53 sharing a batch with a NULL
id).

Scale shape: state is ``_RATE_LIMIT`` × 8 bytes per live user; each
microbatch shuffles once on user_id (the stateful-operator exchange)
and does a per-key linear pass. Append-only output, monotone state —
no watermark needed for kept-set correctness.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.analytics import _BURST_WINDOW_US, _RATE_LIMIT
from .gate import GATE_EMIT_SCHEMA, canonical_events, emit_kept, restore_ids, sort_batch

_STATE_SCHEMA = "times array<bigint>"


def _make_gate_fn(limit: int, window_us: int):
    def gate(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # ring of the last `limit` raw arrival times, oldest first
        (times,) = state.get if state.exists else ([],)
        times = list(times)
        batch = sort_batch(pd.concat(list(pdfs), ignore_index=True))
        keep = []
        for us in batch["us"]:
            us = int(us)
            # kept iff the limit-th most recent prior arrival is
            # outside the trailing window (us - W, us] — exactly the
            # batch LAG(us, limit) <= us - W test
            keep.append(len(times) < limit or times[0] <= us - window_us)
            times.append(us)
            if len(times) > limit:
                times.pop(0)
        state.update((times,))
        if any(keep):
            # user_id IS the grouping key — emit it from the exact key
            # tuple; event_type is a payload string (never promotes)
            yield emit_kept(batch, keep, key[0])

    return gate


def ratelimit_stream(
    events: DataFrame,
    limit: int = _RATE_LIMIT,
    window_us: int = _BURST_WINDOW_US,
) -> DataFrame:
    """Kept events of a STREAMING events DataFrame under the
    raw-arrival rate gate — column-for-column the batch
    :func:`plans.analytics.rate_limited_events` output. ``events``
    needs the canonical columns (event_id, user_id, event_type, ts);
    extra columns are ignored."""
    if limit < 1:
        raise ValueError(
            f"rate limit must be >= 1 (got {limit}); a block-all gate "
            "is a filter, not a rate limiter"
        )
    gated = canonical_events(events).groupBy("user_id").applyInPandasWithState(
        _make_gate_fn(limit, window_us),
        outputStructType=GATE_EMIT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return restore_ids(gated)
