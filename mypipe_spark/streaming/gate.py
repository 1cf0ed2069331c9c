"""Shared plumbing for the stateful per-key event GATES
(streaming/thin.py debounce, streaming/ratelimit.py rate limiter).

Both operators are "keep or drop each event, per key, in
(us, event_id) order" — their correctness contracts (stream==batch
parity with a batch window twin) depend on three projections staying
byte-identical between them and their batch twins:

1. the canonical input (NULL-ts exclusion, bigint casts, ntz ts,
   unix_micros ``us``),
2. the in-batch ordering (us ASC, event_id ASC NULLS LAST), and
3. the exact round-trip of ids through the Arrow/pandas boundary.

(3) is why ``event_id`` ALSO travels as a STRING column: Arrow→pandas
input conversion promotes a NULL-bearing bigint column to float64,
silently corrupting ids ≥ 2^53 that share a batch with a NULL id —
the string copy is lossless, the gate emits it, the wrapper casts it
back to bigint — and the in-batch SORT tiebreak is decoded from the
same string copy (exact arbitrary-precision ints), so two events at
the same microsecond order correctly even when their ids differ only
beyond float64's 53-bit mantissa. ``user_id`` and any other GROUP
KEY columns are emitted from the exact key tuple Spark hands the
gate, never from the (possibly promoted) pandas columns.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# what the gates EMIT from pandas (string ids — exact), and what
# their public wrappers expose after the restoring cast
GATE_EMIT_SCHEMA = (
    "event_id string, user_id bigint, event_type string, ts timestamp_ntz"
)


def canonical_events(events: DataFrame) -> DataFrame:
    """The ONE canonical projection in front of every stateful gate:
    timeless events excluded — filtered on the TRY_CAST ntz value, so
    a non-NULL string ts that fails to parse is excluded exactly like
    a NULL, on BOTH the batch twins (which share this function) and
    the stream. Filtering the raw column instead would either crash
    the query at the plain cast under ANSI mode, or (non-ANSI) let
    the row through with us=NULL and crash the pandas gate's int() on
    NaN — both observed in the round-8 review. The projections below
    keep PLAIN casts: only rows whose ts provably parses survive the
    filter. Then bigint ids, ntz timestamp, integer-microsecond
    ``us`` for ordering/arithmetic, and the lossless string copy of
    event_id (``eid_s``)."""
    return events.filter(
        F.col("ts").try_cast("timestamp_ntz").isNotNull()
    ).select(
        F.col("event_id").cast("bigint"),
        # normalize BEFORE stringifying: a double/decimal event_id
        # upstream must yield the same id as the bigint tiebreak
        # column ('7', never '7.0' — which ANSI cast-back would throw
        # on at restore_ids)
        F.col("event_id").cast("bigint").cast("string").alias("eid_s"),
        F.col("user_id").cast("bigint"),
        "event_type",
        F.col("ts").cast("timestamp_ntz"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
    )


def sort_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """The gates' shared in-batch order — mirrors the batch windows'
    ORDER BY us ASC, event_id ASC NULLS LAST (stable sort, so
    microbatch arrival order breaks any residual tie exactly like
    the batch window's deterministic tiebreak chain).

    The id tiebreak must be EXACT: when a NULL id shares the
    microbatch, Arrow→pandas promotes the numeric ``event_id`` column
    to float64 and two same-microsecond ids differing only beyond the
    53-bit mantissa would mis-tie. Fast path: with no NULL the column
    arrives as exact int64 and sorts vectorized; only a promoted
    (float64) column pays the per-row decode of the lossless ``eid_s``
    string copy into Python ints."""
    if batch["event_id"].dtype.kind in "iu":  # exact ints: no NULL came
        return batch.sort_values(
            ["us", "event_id"], na_position="last", kind="mergesort"
        )
    # dtype=object is load-bearing: .map/inference would promote the
    # int keys straight back to float64, re-creating the hazard
    key = pd.Series(
        [None if pd.isna(s) else int(s) for s in batch["eid_s"]],
        index=batch.index,
        dtype="object",
    )
    out = batch.assign(_eid_key=key).sort_values(
        ["us", "_eid_key"], na_position="last", kind="mergesort"
    )
    return out.drop(columns=["_eid_key"])


_UNSET = object()


def emit_kept(
    batch: pd.DataFrame, keep: list, user_id, event_type=_UNSET
) -> pd.DataFrame:
    """Kept rows in GATE_EMIT_SCHEMA order: exact string event_id from
    the lossless copy, key-derived user_id, event_type from the key
    when it is part of it (pass it — even if its value is None) or
    from the batch column otherwise (strings never promote), and
    pandas-native ts. The caller yields this iff non-empty."""
    idx = batch.index[keep]
    et = (
        batch.loc[idx, "event_type"].reset_index(drop=True)
        if event_type is _UNSET
        else pd.Series([event_type] * len(idx), dtype="object")
    )
    return pd.DataFrame(
        {
            "event_id": batch.loc[idx, "eid_s"].reset_index(drop=True),
            "user_id": pd.Series([user_id] * len(idx), dtype="Int64"),
            "event_type": et,
            "ts": batch.loc[idx, "ts"].reset_index(drop=True),
        }
    )


def restore_ids(gated: DataFrame) -> DataFrame:
    """The public-facing cast back from the gate's exact string ids to
    the canonical bigint output schema."""
    return gated.select(
        F.col("event_id").cast("bigint"),
        "user_id",
        "event_type",
        "ts",
    )
