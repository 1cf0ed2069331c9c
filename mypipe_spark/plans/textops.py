"""Text-analysis operators over the ``documents`` table.

Training-data pipeline text plane: token counting, quality scoring,
language-ID heuristic, and document fingerprinting. All pure built-in
column expressions (whole-stage codegen; zero UDFs) with exact DuckDB
oracles — ratios are integer-count divisions, so values are engine-
identical before the final rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_tables, register

# Marker stopwords for the language-ID heuristic and quality score.
_STOPWORDS = ("the", "a", "of", "to", "and", "in")
_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)
_SW_SPARK = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "text_token_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(ROUND(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
                / COUNT(*), 4) AS DOUBLE) AS avg_tokens,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
    tags=("text", "tokens"),
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting aggregated by (lang, source). Token
    counts are integers → sums exact → division+round identical.
    Map-side combinable; scales as a pure scan-aggregate."""
    t = load_tables(spark, sf_dir)
    ntok = F.size(F.split("text", " "))
    return (
        t["documents"]
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(ntok).alias("total_tokens"),
            F.round(F.sum(ntok).cast("double") / F.count("*"), 4)
            .cast("double")
            .alias("avg_tokens"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 w -> w IN ({_SW_SQL}))) AS n_stop,
             length(text) AS n_char,
             length(replace(text, ' ', '')) AS n_nonspace
      FROM documents)
    SELECT doc_id, lang, n_tokens,
           CAST(ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS DOUBLE)
             AS stopword_ratio,
           CAST(ROUND(CAST(n_nonspace AS DOUBLE) / n_tokens, 4) AS DOUBLE)
             AS avg_token_len,
           CASE WHEN n_tokens >= 20
                 AND CAST(n_stop AS DOUBLE) / n_tokens >= 0.05
                THEN 1 ELSE 0 END AS keep
    FROM feats
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features (length, stopword ratio, mean token
    length) + a keep/drop gate — the standard pre-training corpus
    filter, as one projection over the scan (no shuffle at all)."""
    t = load_tables(spark, sf_dir)
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.expr(f"filter(split(text, ' '), w -> w IN ({_SW_SPARK}))"))
    n_nonspace = F.length(F.regexp_replace("text", " ", ""))
    stop_ratio = n_stop.cast("double") / n_tokens
    return t["documents"].select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 4).cast("double").alias("stopword_ratio"),
        F.round(n_nonspace.cast("double") / n_tokens, 4)
        .cast("double")
        .alias("avg_token_len"),
        F.when((n_tokens >= 20) & (stop_ratio >= 0.05), 1).otherwise(0).alias("keep"),
    )


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT lang,
             CASE WHEN len(list_filter(string_split(text, ' '),
                          w -> w IN ({_SW_SQL}))) >= 2
                  THEN 'en' ELSE 'unk' END AS pred_lang
      FROM documents)
    SELECT lang, pred_lang, COUNT(*) AS n_docs
    FROM pred GROUP BY lang, pred_lang
    """,
    tags=("text", "langid"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-hit n-gram classifier — the
    fasttext-style stand-in this container can express without model
    weights) scored against the labeled ``lang`` column as a confusion
    matrix. The classifier is a pure column expression; swapping in a
    real model would be one Pandas UDF behind the same projection."""
    t = load_tables(spark, sf_dir)
    n_stop = F.size(F.expr(f"filter(split(text, ' '), w -> w IN ({_SW_SPARK}))"))
    return (
        t["documents"]
        .select("lang", F.when(n_stop >= 2, "en").otherwise("unk").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(text)) AS content_hash,
           md5(array_to_string(list_sort(list_distinct(
               string_split(lower(text), ' '))), ' ')) AS bag_hash
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content hash + an order-insensitive
    bag-of-words hash (sorted distinct tokens re-joined → md5), the
    cheap word-shuffle-dup detector. Both are pure projections; at
    100 TB the fingerprints become the groupBy keys for incremental
    dedup (new batch vs corpus = hash anti-join, not text compare)."""
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.md5(F.lower("text").cast("binary")).alias("content_hash"),
        F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(F.split(F.lower("text"), " "))), " "
            ).cast("binary")
        ).alias("bag_hash"),
    )
