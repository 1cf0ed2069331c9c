"""Stream-stream event-time joins.

The one Structured Streaming operator the pipe/window/upsert planes
did not yet exercise: a TRUE stream-stream inner join, where BOTH
sides arrive continuously and Spark buffers each in join state until
the watermark plus the join's time bound prove no future match can
exist (state is then evicted — bounded memory on an unbounded
stream). Reference parity note: the reference (mypipe) has no join
plane at all; this exists for the analytics brief, as the streaming
twin of the catalog's q_range_clicks_after_purchase
(plans/tpch.py:616-653), whose equi+range semantics it reproduces
exactly — pinned stream==batch by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Same attribution window as q_range_clicks_after_purchase: a
# purchase opens [ts, ts + 2h) and clicks landing inside pair up.
ATTRIBUTION_WINDOW = "INTERVAL 2 HOURS"


def _purchase_click_sides(
    events: DataFrame, watermark: str
) -> tuple[DataFrame, DataFrame]:
    """The shared side-construction contract for BOTH join modes —
    uniform timeless/anonymous filter, the TIMESTAMP conversion
    watermarks demand, per-side renames, one watermark each. One
    spelling so the inner and outer twins can never drift on the
    lateness or NULL contract.

    The ntz→TIMESTAMP conversion is ``to_utc_timestamp(ts, 'UTC')``,
    NOT a bare cast: a cast interprets the wall time in the SESSION
    zone, and a DST session zone shifts the two sides of a
    transition-straddling pair by different offsets — silently
    breaking the equi+range parity with the batch twin
    (q_range_clicks_after_purchase compares raw wall-clock ts). The
    explicit UTC interpretation is a fixed-offset bijection from wall
    time to instant, so range arithmetic is preserved under ANY
    session timezone (round-8 review finding; under the engine's
    pinned-UTC sessions the two spellings coincide)."""
    # filter on the TRY_CAST value, not the raw column (gate.py's
    # canonical_events contract, round-10 review): a non-NULL ts that
    # fails to parse must be EXCLUDED like a NULL — filtering the raw
    # column would crash the streaming query at the plain cast under
    # ANSI mode (or, non-ANSI, let a NULL-ts row into the watermark).
    # The plain cast below is safe: only rows whose ts provably
    # parses survive the filter.
    typed = events.filter(
        F.col("ts").try_cast("timestamp_ntz").isNotNull()
        & F.col("user_id").isNotNull()
    ).withColumn(
        "ts", F.to_utc_timestamp(F.col("ts").cast("timestamp_ntz"), "UTC")
    )
    purchases = (
        typed.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        typed.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return purchases, clicks


_WINDOW_COND = f"""
    c_user = p_user
    AND c_ts >= p_ts
    AND c_ts < p_ts + {ATTRIBUTION_WINDOW}
"""


def attribution_join_stream(
    events: DataFrame, watermark: str = "4 hours"
) -> DataFrame:
    """Pair every purchase with the same user's clicks inside the
    2-hour attribution window, both sides STREAMING (a self-join of
    the live event stream split by type). Returns
    (purchase_id, click_id, user_id) — the exact output schema and
    semantics of the batch catalog query.

    State story: the range bound ``c_ts in [p_ts, p_ts + 2h)`` plus a
    watermark on each side's event time lets Spark compute, per
    microbatch, which buffered rows can still match anything — a
    click older than (watermark - 2h) below the purchase-side clock
    is unreachable and is dropped from state. ``watermark`` is the
    lateness budget: rows later than this relative to the observed
    max event time may be dropped rather than joined (choose it from
    the source's delivery SLO; tests use a generous one so replay
    order cannot drop rows).

    Timeless and anonymous rows are filtered up front on BOTH sides —
    the same uniform contract as the batch twin, where a NULL ts or
    user can never satisfy the equi+range condition."""
    purchases, clicks = _purchase_click_sides(events, watermark)
    return clicks.join(purchases, F.expr(_WINDOW_COND), "inner").select(
        "purchase_id", "click_id", F.col("c_user").alias("user_id")
    )


def attribution_join_stream_outer(
    events: DataFrame, watermark: str = "4 hours"
) -> DataFrame:
    """The LEFT-OUTER twin of :func:`attribution_join_stream`, driven
    from the purchase side: every purchase eventually emits — with
    its in-window clicks when they exist, or exactly one
    NULL-click row once the watermark proves the 2-hour window closed
    with no click (the streaming spelling of "conversion rate with
    unattributed purchases"). Outer results are inherently DELAYED:
    the engine cannot declare "no click" until event time passes the
    window end plus the lateness budget, so an unmatched purchase
    surfaces only after later data advances the watermark — the
    deterministic emission the test pins.

    Same uniform timeless/anonymous filter and TIMESTAMP cast as the
    inner form (shared _purchase_click_sides — the two modes cannot
    drift). Output: (purchase_id, click_id NULL-able, user_id)."""
    purchases, clicks = _purchase_click_sides(events, watermark)
    return purchases.join(
        clicks, F.expr(_WINDOW_COND), "left_outer"
    ).select(
        "purchase_id", "click_id", F.col("p_user").alias("user_id")
    )
