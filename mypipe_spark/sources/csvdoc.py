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

- the STREAMING contract is LINE-WISE: a quoted field containing an
  embedded newline is a multi-line record, which a line-wise reader
  cannot reassemble — each physical line dead-letters as
  ``malformed_csv``, and the line-wise writer REFUSES (ValueError) to
  export text containing newlines rather than emitting records that
  contract cannot round-trip. For real vendor exports with embedded
  newlines there is a BATCH-ONLY twin
  (``read_documents_csv_multiline`` / ``write_documents_csv_multiline``,
  same dialect + DLQ discipline; batch-only because ``multiLine=true``
  makes files unsplittable — see its docstring).
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


def _refuse_then_write(
    docs: DataFrame, path: str, mode: str, pattern: str, message: str
) -> None:
    """The ONE writer tail shared by both CSV sinks: pre-scan every
    exported free-form string column for the dialect's forbidden
    byte class and refuse BEFORE emitting any part file (failing
    MID-write would leave partial parts behind), then write the five
    canonical columns under the one shared dialect."""
    bad = (
        docs.filter(
            F.col("text").rlike(pattern)
            | F.col("lang").rlike(pattern)
            | F.col("source").rlike(pattern)
        )
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(message)
    (
        docs.select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode(mode)
        .options(**_CSV_WRITE_OPTS)
        .csv(path)
    )


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
    # \x00 included: the READER uses NUL as its nullValue sentinel
    # precisely because it can never appear in a physical line — the
    # writer must enforce that invariant, not just rely on it (a field
    # whose value IS "\x00" would otherwise round-trip to NULL).
    _refuse_then_write(
        docs,
        path,
        mode,
        "[\n\r\x00]",
        "write_documents_csv: a string field (text/lang/source) "
        "contains newline or NUL characters — line-wise CSV cannot "
        "round-trip multi-line records (and NUL is the reader's "
        "null sentinel); clean or re-encode the field, or export "
        "via write_documents_csv_multiline / JSONL instead",
    )


# DLQ raw re-serialization for the multiLine reader's missing_doc_id
# rows (the native reader consumes the physical record, so the DLQ
# line is reconstructed canonically with the WRITER's dialect)
_DLQ_RAW_OPTS = {k: v for k, v in _CSV_WRITE_OPTS.items() if k != "header"}


def read_documents_csv_multiline(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """BATCH-ONLY multiLine CSV ingest: ``(documents, dlq)`` for real
    vendor exports whose quoted fields embed newlines — the records
    the line-wise reader deliberately dead-letters.

    Same dialect, DLQ taxonomy (``malformed_csv`` / ``missing_doc_id``
    via jsonl.split_parsed_documents) and n_chars densification as the
    line-wise reader; probed and pinned (tests/test_csvdoc.py):
    embedded \\n and \\r round-trip exactly inside quotes, quoted ""
    parses to '' and a bare empty field to NULL (the same NUL
    nullValue sentinel trick), and header lines — wherever file
    concatenation puts them — fail bigint typing, land verbatim in the
    corrupt column, and are skipped structurally (``header=false`` +
    exact-match filter, so a headerless file can never lose its first
    record to blind header skipping).

    Why batch-only, stated not hidden: ``multiLine=true`` makes each
    file unsplittable (a record boundary is no longer a line
    boundary), so scan parallelism degrades to #files — acceptable for
    a one-shot vendor-export ingest, wrong for the streaming landing
    zone, whose contract stays line-wise (module docstring). For the
    malformed-record DLQ the native reader's corrupt column carries
    the physical record verbatim; rows that PARSE but lack a doc_id
    have no physical form left, so their DLQ ``raw`` is re-serialized
    canonically with the writer's dialect.
    """
    opts = dict(_CSV_READ_OPTS, multiLine="true", header="false")
    scanned = spark.read.schema(_PARSE_SCHEMA).options(**opts).csv(path)
    parsed = (
        # structural header skip, exact-match like the line-wise path
        # (NULL-safe: corrupt is NULL on every good row)
        scanned.filter(
            F.col(_CORRUPT).isNull() | (F.col(_CORRUPT) != _HEADER)
        ).select(
            F.coalesce(
                F.col(_CORRUPT),
                F.to_csv(
                    F.struct("doc_id", "text", "lang", "source", "n_chars"),
                    _DLQ_RAW_OPTS,
                ),
            ).alias("raw"),
            F.struct(
                "doc_id", "text", "lang", "source", "n_chars", _CORRUPT
            ).alias("p"),
        )
    )
    return split_parsed_documents(parsed, "malformed_csv")


def write_documents_csv_multiline(
    docs: DataFrame, path: str, mode: str = "error"
) -> None:
    """Export a documents table as multiLine CSV — the sink dual to
    ``read_documents_csv_multiline``, lifting the line-wise writer's
    newline refusal (embedded \\n/\\r are quoted by the writer and
    round-trip exactly; probed + pinned). Still refuses the one byte
    the dialect reserves: NUL, the reader's nullValue sentinel — a
    field containing it would silently round-trip to NULL. Same
    pre-scan-then-write discipline as the line-wise writer (refuse
    BEFORE emitting any part file)."""
    _refuse_then_write(
        docs,
        path,
        mode,
        "\x00",
        "write_documents_csv_multiline: a string field (text/lang/"
        "source) contains NUL (\\x00), the reader's null sentinel "
        "— it cannot round-trip; clean the field or export JSONL",
    )
