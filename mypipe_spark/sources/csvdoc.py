"""CSV corpus source/sink for the ``documents`` table.

Tabular corpora and vendor exports ship as CSV at least as often as
JSONL; this adapter lands them in the engine's canonical
``documents`` shape with the SAME nothing-silently-dropped discipline
as sources/jsonl.py (whose docstring states the shared rationale):
raw ``text`` lines + ``from_csv`` in PERMISSIVE mode with a
corrupt-record column, so the original line survives verbatim into
the DLQ, the identical projection runs on ``readStream.text``
(stream==batch pinned), and a malformed line can never silently
become an all-NULL row.

CSV-specific contract, stated rather than hidden:

- LINE-WISE CSV ONLY: a quoted field containing an embedded newline
  is a multi-line record, which a line-wise reader cannot reassemble
  — each physical line dead-letters as ``malformed_csv``. The writer
  REFUSES (ValueError) to export text containing newlines rather
  than emitting records the reader contract cannot round-trip.
- the canonical header line (``doc_id,text,lang,source,n_chars``) is
  structural, not data — skipped wherever it appears (file
  concatenation puts headers mid-stream; a streaming landing zone
  sees one per dropped file), the CSV analog of JSONL's blank-line
  skip. Blank lines are skipped identically.
- standard RFC-4180 quoting/escaping applies per line (embedded
  commas and quotes round-trip; pinned).
- a line that parses but carries no ``doc_id`` dead-letters as
  ``missing_doc_id``; ``n_chars`` densifies from the text when
  absent (same rationale as JSONL — CSV cannot distinguish an empty
  field from a shipped NULL).

Scale shape: identical to the JSONL reader — an embarrassingly
parallel line-wise projection over a text scan, the DLQ a second
filter over the SAME parsed projection, not a second read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .jsonl import _CORRUPT, _PARSE_SCHEMA, split_parsed_documents

_HEADER = "doc_id,text,lang,source,n_chars"
# The ONE CSV dialect, shared by reader and writer (the writer
# derives its options from this dict — a quoting tweak cannot land on
# one side only). Explicit beyond the RFC-4180 quoting because three
# Spark defaults would otherwise silently mutate data with an empty
# DLQ (all three caught by round-7 review passes and pinned):
# - the WRITER defaults ignore*WhiteSpace to true (reads default
#   false) — padded text would come back trimmed;
# - the READER collapses BOTH a quoted empty field ("") and a bare
#   empty field to NULL by default — an empty-string document would
#   change identity to a NULL-text one on re-ingest. The writer
#   already distinguishes them on disk (Spark writes '' as "" and
#   NULL as a bare empty field); pointing the reader's nullValue at a
#   sentinel that can never appear in a physical line (NUL) restores
#   the distinction: quoted "" parses to '', bare empty parses to
#   NULL (univocity treats unquoted-empty as null regardless of
#   nullValue — probed, pinned by test_csv_round_trips_empty_string).
_CSV_READ_OPTS = {
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": _CORRUPT,
    "quote": '"',
    "escape": '"',
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    "nullValue": "\x00",
}
_CSV_WRITE_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    "emptyValue": '""',
    "nullValue": "",
}


def parse_documents_csv_lines(lines: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a DataFrame of raw CSV ``value`` lines into
    (documents, dlq). Works identically on batch ``read.text`` and
    streaming ``readStream.text`` sources (stateless projection —
    tests/test_csvdoc.py pins stream == batch)."""
    parsed = (
        lines.filter(~F.col("value").rlike(r"^\s*$"))
        .filter(F.col("value") != _HEADER)
        .select(
            F.col("value").alias("raw"),
            F.from_csv("value", _PARSE_SCHEMA, _CSV_READ_OPTS).alias("p"),
        )
    )
    # shared DLQ-split + canonical projection (jsonl.py) — one
    # definition of the reason taxonomy and the n_chars densification
    return split_parsed_documents(parsed, "malformed_csv")


def read_documents_csv(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Batch CSV ingest: ``(documents, dlq)`` over every line under
    ``path``."""
    return parse_documents_csv_lines(spark.read.text(path))


def stream_documents_csv(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Streaming CSV ingest over a directory of line files — the
    landing-zone pattern. Same projection as the batch reader by
    construction."""
    return parse_documents_csv_lines(spark.readStream.format("text").load(path))


def write_documents_csv(docs: DataFrame, path: str, mode: str = "error") -> None:
    """Export a documents table as line-wise CSV (canonical header in
    every part file via the csv writer, RFC-4180 quoting) — the
    interchange sink dual to the reader. REFUSES newline-bearing text
    up front: a quoted multi-line record would be unreadable under
    the reader's line-wise contract, and exporting it anyway would
    silently convert good rows into two DLQ lines on the next ingest.
    Round-trip is exact except the documented n_chars densification;
    pinned in tests/test_csvdoc.py."""
    # guard EVERY exported free-form string column, not just text —
    # a newline in lang/source breaks the line-wise contract the same
    # way. Deliberately a separate pre-scan action (one extra read)
    # rather than a raise_error inside the write projection: failing
    # MID-write would leave partial part files behind, and a sink
    # that refuses must refuse before emitting anything.
    bad = (
        docs.filter(
            F.col("text").rlike(r"[\n\r]")
            | F.col("lang").rlike(r"[\n\r]")
            | F.col("source").rlike(r"[\n\r]")
        )
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(
            "write_documents_csv: a string field (text/lang/source) "
            "contains newline characters — line-wise CSV cannot "
            "round-trip multi-line records; clean or re-encode the "
            "field (or export JSONL) instead"
        )
    (
        docs.select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode(mode)
        .options(**_CSV_WRITE_OPTS)
        .csv(path)
    )
