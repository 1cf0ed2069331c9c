"""JSONL corpus source/sink for the ``documents`` table.

Public LLM corpora ship as JSON Lines (one document object per line —
the C4/Pile/RedPajama distribution format), not parquet; this adapter
lands them in the engine's canonical ``documents`` shape with the same
nothing-silently-dropped discipline as the wire plane (every
unusable line is DEAD-LETTERED with a reason, mirroring
sinks/wire.py's NULL-frame DLQ and similarity.validate_embeddings):

- the file is read as RAW TEXT lines and parsed with ``from_json`` in
  PERMISSIVE mode with a corrupt-record column — NOT ``spark.read
  .json``, so (a) the original line survives verbatim into the DLQ,
  (b) the identical projection runs on ``readStream.text`` for
  continuous ingest (stream==batch pinned), and (c) a malformed line
  can never silently become an all-NULL row;
- blank / whitespace-only lines are structural padding, not data —
  skipped (the one documented non-DLQ drop);
- a line that parses but carries no ``doc_id`` cannot join, dedup or
  shard — dead-lettered as ``missing_doc_id`` rather than flowing on
  as an unkeyed row (the NULL-key equi-join lessons);
- ``n_chars`` is derived from the text when absent-or-null (COALESCE),
  never trusted blindly when present — corpora disagree on whether it
  exists. JSON cannot distinguish a shipped ``null`` from a missing
  key after parsing, so a NULL ``n_chars`` beside non-NULL text
  DENSIFIES to the derived value on ingest; every other column
  round-trips exactly (pinned).

Pure column expressions on a text scan: predicate pushdown aside
(there is none to push on raw text), ingest is an embarrassingly
parallel line-wise projection — at 100 TB the line files split at
``maxPartitionBytes`` like any other scan, and the DLQ is a second
filter over the SAME parsed projection, not a second read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# canonical documents schema, plus the corrupt-record capture column
# (PERMISSIVE mode stores the ORIGINAL line there when parsing or
# field-typing fails; the column must be part of the parse schema)
_CORRUPT = "_corrupt_line"
_PARSE_SCHEMA = (
    f"doc_id bigint, text string, lang string, source string,"
    f" n_chars bigint, {_CORRUPT} string"
)


def split_parsed_documents(
    parsed: DataFrame, malformed_reason: str
) -> tuple[DataFrame, DataFrame]:
    """The ONE DLQ-split + canonical-documents projection shared by
    every line-wise corpus source (JSONL here, CSV in csvdoc.py):
    over a (raw, p) frame — p the parsed struct in _PARSE_SCHEMA with
    the _CORRUPT capture column — classify each line
    (format-malformed / missing_doc_id / good), densify n_chars from
    the text when absent, and return (documents, dlq). One
    definition, so the reason taxonomy and the densification rule
    cannot fork between formats."""
    reason = (
        F.when(F.col(f"p.{_CORRUPT}").isNotNull(), malformed_reason)
        .when(F.col("p").isNull(), malformed_reason)
        .when(F.col("p.doc_id").isNull(), "missing_doc_id")
    )
    tagged = parsed.select("raw", "p", reason.alias("reason"))
    docs = tagged.filter(F.col("reason").isNull()).select(
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.text").alias("text"),
        F.col("p.lang").alias("lang"),
        F.col("p.source").alias("source"),
        F.coalesce(F.col("p.n_chars"), F.length("p.text").cast("bigint")).alias(
            "n_chars"
        ),
    )
    dlq = tagged.filter(F.col("reason").isNotNull()).select("raw", "reason")
    return docs, dlq


def parse_documents_lines(lines: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a DataFrame of raw JSONL ``value`` lines into
    (documents, dlq). Works identically on a batch ``read.text`` and
    a streaming ``readStream.text`` source (stateless projection —
    tests/test_jsonl.py pins stream == batch)."""
    # \s-class blank detection: F.trim strips ASCII spaces only, so a
    # tab-padded blank line would otherwise dead-letter as malformed
    parsed = lines.filter(~F.col("value").rlike(r"^\s*$")).select(
        F.col("value").alias("raw"),
        F.from_json(
            "value",
            _PARSE_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("p"),
    )
    return split_parsed_documents(parsed, "malformed_json")


def read_documents_jsonl(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Batch JSONL ingest: ``(documents, dlq)`` over every line under
    ``path``."""
    return parse_documents_lines(spark.read.text(path))


def stream_documents_jsonl(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Streaming JSONL ingest over a directory of line files — the
    drop-a-file-in-the-landing-zone pattern. Same projection as the
    batch reader by construction."""
    lines = spark.readStream.format("text").load(path)
    return parse_documents_lines(lines)


def write_documents_jsonl(docs: DataFrame, path: str, mode: str = "error") -> None:
    """Export a documents table as JSONL (``to_json`` over the five
    canonical columns, one object per line, NULLs written explicitly)
    — the interchange sink dual to the reader. Round-trip is exact
    except the documented n_chars densification (module docstring);
    both pinned in tests/test_jsonl.py."""
    docs.select(
        F.to_json(
            F.struct("doc_id", "text", "lang", "source", "n_chars"),
            {"ignoreNullFields": "false"},
        ).alias("value")
    ).write.mode(mode).text(path)
