"""Corpus-curation operators over the ``documents`` table.

The curation plane a large-scale training-data pipeline runs between
raw ingest and tokenization: PII scrubbing, temperature-based
multilingual rebalancing (the XLM-R / mT5 p_l^alpha sampling scheme —
public method), and source-level pruning by aggregate quality. All
pure built-in column expressions (whole-stage codegen, zero UDFs)
with exact DuckDB oracles; every data-dependent number that crosses
an engine boundary is integer math (exact isqrt, integer rounding),
never a rounded double.

Reference note: the reference (mypipe) has no text plane at all —
these operators exist for the 100 TB training-data brief, not for
reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import floor4_frac_sql, isqrt_sql, load_tables, register, round4_frac_sql, round_div_sql, scale_out
from .dedup import NORM_TEXT_DUCK, norm_text_col
from .textops import (
    N_STOP_DUCK,
    N_TOKENS_DUCK,
    REP_CTES_DUCK,
    REP_TOP_CNT_SPARK,
    n_stop_col,
    n_tokens_col,
    quality_keep_sql,
    rep_keep_sql,
)

# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Detector patterns, shared verbatim by the Spark plan and the DuckDB
# oracle. Syntax is the RE2-compatible subset (\b, \d, bounded
# repetition, alternation-free) that Java regex and RE2 interpret
# identically — no backreferences, no lookaround. Order matters for
# redaction: longer digit shapes first so a shorter pattern can never
# eat a prefix of a longer one.
PII_PATTERNS = (
    # (name, pattern, replacement)
    ("card", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CARD>"),
    ("phone", r"\b\d{3}[ -]\d{3}[ -]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
)


def _redacted_sql_duck() -> str:
    """Nested regexp_replace applying every pattern in order for the
    DuckDB oracle ('g' flag: DuckDB is first-match by default).
    DuckDB string literals keep backslashes, so the patterns embed
    verbatim."""
    expr = "text"
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def _redacted_col():
    """The same redaction chain as Spark Columns. Deliberately NOT an
    F.expr over shared SQL text: Spark SQL string literals treat
    backslash as an escape (so '\\b\\d' would silently become
    backspace + 'd' and the detectors would never fire), while the
    Column API passes the pattern through untouched."""
    c = F.col("text")
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


_PII_COUNTS_DUCK = ",\n           ".join(
    f"CAST(SUM(len(regexp_extract_all(text, '{pat}'))) AS BIGINT) AS n_{name}"
    for name, pat, _ in PII_PATTERNS
)


@register(
    "pii_scrub",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           {_PII_COUNTS_DUCK},
           CAST(SUM(length(text) - length({_redacted_sql_duck()})) AS BIGINT)
             AS redaction_delta
    FROM documents
    GROUP BY lang
    """,
    tags=("curation", "pii", "regex"),
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction audit: per-language hit counts for
    each detector and the net character delta after applying all
    redactions in sequence. One codegen pass over the scan, counts
    map-side combinable — at 100 TB this is a pure scan-aggregate
    with no shuffle beyond the per-language final exchange, and the
    redacted projection (minus the aggregate) is the write-path form.

    The driver corpus is synthetic word-salad with no PII-shaped
    spans, so the catalog row proves the two regex engines agree on
    zero-hit text; tests/test_newops.py runs the same shared
    detectors over a constructed corpus WITH emails / cards / IPs /
    phones on both engines and pins the positive behavior."""
    t = load_tables(spark, sf_dir)
    count_cols = [
        F.sum(F.regexp_count("text", F.lit(pat))).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    delta = F.length("text") - F.length(_redacted_col())
    return (
        t["documents"]
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            *count_cols,
            F.sum(delta).alias("redaction_delta"),
        )
    )


# ---------------------------------------------------------------------------
# temperature-based multilingual mixing
# ---------------------------------------------------------------------------

# Doc budget for the rebalanced mix; alpha = 0.5 (weights are exact
# integer sqrt of per-language counts, so no double ever crosses the
# engine boundary).
_MIX_BUDGET = 200


@register(
    "curation_mix_temperature",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    wts AS (
      SELECT lang, n, {isqrt_sql('n')} AS wt FROM counts),
    tot AS (
      SELECT CAST(SUM(wt) AS BIGINT) AS sw FROM wts),
    targets AS (
      SELECT lang,
             CAST(LEAST(n, {round_div_sql(f'{_MIX_BUDGET} * wt', 'sw', '//')})
                  AS BIGINT) AS lang_target
      FROM wts, tot),
    ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents)
    SELECT r.doc_id, r.lang, t.lang_target, r.rk
    FROM ranked r JOIN targets t ON t.lang IS NOT DISTINCT FROM r.lang
    WHERE r.rk <= t.lang_target
    """,
    tags=("curation", "sampling", "multilingual"),
)
def curation_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual rebalancing (p_l^alpha sampling,
    alpha=1/2): per-language selection targets proportional to
    sqrt(n_l), capped at n_l, filled by deterministic hash order so
    re-runs and both engines pick the SAME documents. All integer
    math — exact isqrt for the weights, exact half-away rounding for
    the budget split — so no cross-engine double ever exists.

    Scale shape: the weight/target table is one tiny two-level
    aggregate (|langs| rows, broadcast); document ranking is one
    window per lang partition with an rk <= budget pre-filter that
    engages WindowGroupLimit, so each input partition forwards at
    most budget rows per language to the window shuffle."""
    return mix_select(load_tables(spark, sf_dir)["documents"])


def mix_select(docs: DataFrame, budget: int = _MIX_BUDGET) -> DataFrame:
    """Composable core of curation_mix_temperature over any
    (doc_id, lang, …) DataFrame — the selection the end-to-end
    curation runner applies after filtering/scrubbing."""
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    wts = counts.select("lang", "n", F.expr(isqrt_sql("n")).alias("wt"))
    # the weight total rides a global window over the |langs|-row
    # aggregate instead of a separate broadcast scalar: the one-row
    # aggregate branch re-planned the whole counts subtree (a second
    # corpus scan per action — round-8 plan audit; no cross-branch
    # exchange reuse), where the window costs one trivial pass over
    # the already-aggregated language rows
    targets = wts.withColumn(
        "sw", F.sum("wt").over(Window.partitionBy()).cast("bigint")
    ).select(
        "lang",
        F.least(
            F.col("n"),
            F.expr(round_div_sql(f"{budget} * wt", "sw", "div")),
        )
        .cast("bigint")
        .alias("lang_target"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    ranked = (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        # lang_target <= budget by construction (wt <= sw), so this
        # constant pre-filter cannot drop a selected row — it exists to
        # engage WindowGroupLimit before the data-dependent join filter.
        .filter(F.col("rk") <= budget)
    )
    # eqNullSafe: NULL-lang documents form their own stratum (groupBy
    # keeps the NULL group, the window partitions it) — an equi-join
    # would silently exclude the whole stratum from the mix, the same
    # totality bug class the funnel's source join had.
    targets_r = F.broadcast(targets.withColumnRenamed("lang", "__lang"))
    return (
        ranked.join(targets_r, F.col("lang").eqNullSafe(F.col("__lang")))
        .filter(F.col("rk") <= F.col("lang_target"))
        .select("doc_id", "lang", "lang_target", "rk")
    )


# ---------------------------------------------------------------------------
# source-level pruning by aggregate quality
# ---------------------------------------------------------------------------

# A source survives when >= 60% of its documents pass the per-doc
# quality gate (integer cross-multiply — no ratio is ever compared
# as a double).
_PRUNE_NUM = 3
_PRUNE_DEN = 5


@register(
    "curation_source_prune",
    oracle=f"""
    WITH feats AS (
      SELECT source,
             {N_TOKENS_DUCK} AS n_tokens,
             {N_STOP_DUCK} AS n_stop
      FROM documents),
    agg AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM({quality_keep_sql('n_stop', 'n_tokens')}) AS BIGINT)
               AS n_keep
      FROM feats GROUP BY source)
    SELECT source, n_docs, n_keep,
           {round4_frac_sql('n_keep', 'n_docs', '//')} AS keep_rate,
           CASE WHEN {_PRUNE_DEN} * n_keep >= {_PRUNE_NUM} * n_docs
                THEN 1 ELSE 0 END AS source_kept
    FROM agg
    """,
    tags=("curation", "quality", "source"),
)
def curation_source_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level curation: aggregate the per-document quality gate
    (the SAME shared expression text_quality_score applies — one
    definition, so the gates cannot drift) to a per-source keep-rate,
    and drop whole sources below the 60% bar — the Dolma-style
    "prune at the provenance granularity" pass that runs before any
    per-document filtering at scale. Pure scan-aggregate: map-side
    combinable, one |sources|-row exchange, no joins."""
    t = load_tables(spark, sf_dir)
    feats = t["documents"].select(
        "source",
        n_tokens_col().alias("n_tokens"),
        n_stop_col().alias("n_stop"),
    )
    agg = feats.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.expr(quality_keep_sql("n_stop", "n_tokens")))
        .cast("bigint")
        .alias("n_keep"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_keep",
        F.expr(round4_frac_sql("n_keep", "n_docs", "div")).alias("keep_rate"),
        F.when(
            _PRUNE_DEN * F.col("n_keep") >= _PRUNE_NUM * F.col("n_docs"), 1
        )
        .otherwise(0)
        .alias("source_kept"),
    )


# ---------------------------------------------------------------------------
# the full curation funnel (composite keep/drop with reasons)
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = f"""
    WITH {REP_CTES_DUCK},
    feats AS (
      SELECT doc_id, lang, source, n_chars,
             {N_TOKENS_DUCK} AS n_tokens,
             {N_STOP_DUCK} AS n_stop
      FROM documents),
    sagg AS (
      SELECT source,
             CASE WHEN {_PRUNE_DEN} *
                       SUM({quality_keep_sql('n_stop', 'n_tokens')})
                       >= {_PRUNE_NUM} * COUNT(*)
                  THEN 1 ELSE 0 END AS source_kept
      FROM feats GROUP BY source),
    rep AS (
      SELECT w.doc_id, GREATEST(len(ws) - 1, 0) AS n_bigrams,
             COALESCE(tc.top_cnt, 0) AS top_cnt
      FROM w LEFT JOIN tc ON tc.doc_id = w.doc_id),
    norm AS (
      SELECT doc_id, n_chars, {NORM_TEXT_DUCK} AS ntext FROM documents),
    rnk AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY md5(ntext)
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM norm),
    flags AS (
      SELECT f.doc_id, f.lang, f.source,
             1 - s.source_kept AS drop_source,
             1 - {quality_keep_sql('f.n_stop', 'f.n_tokens')} AS drop_quality,
             1 - {rep_keep_sql('r.top_cnt', 'r.n_bigrams')} AS drop_repetition,
             CASE WHEN k.rk > 1 THEN 1 ELSE 0 END AS drop_duplicate
      FROM feats f
      -- NULL-safe: a NULL-source document belongs to the NULL-source
      -- stratum (GROUP BY keeps it); a plain equi-join would silently
      -- DROP such rows and the audit would no longer be total.
      JOIN sagg s ON s.source IS NOT DISTINCT FROM f.source
      JOIN rep r ON r.doc_id = f.doc_id
      JOIN rnk k ON k.doc_id = f.doc_id)
    SELECT doc_id, lang, source, drop_source, drop_quality,
           drop_repetition, drop_duplicate,
           CASE WHEN drop_source + drop_quality + drop_repetition
                     + drop_duplicate = 0
                THEN 1 ELSE 0 END AS final_keep
    FROM flags
    """


@register(
    "curation_funnel",
    oracle=_FUNNEL_ORACLE,
    tags=("curation", "funnel", "composite"),
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole keep/drop decision chain as ONE query: per-document
    drop reasons for source-level pruning, the quality gate, the
    repetition gate, and duplicate resolution, plus the final verdict
    — the audit table a curation pipeline materializes so every
    dropped document is explainable. Every gate is the SAME shared
    expression its standalone query uses (quality_keep_sql,
    rep_keep_sql, the canonicalization, the 60% source bar), so the
    funnel cannot disagree with its parts.

    Scale shape: per-document features (token counts, repetition fold,
    normalized hash) are one codegen projection over the scan; the
    duplicate window is one uniform-hash shuffle; the source verdict
    is a tiny broadcast-joined aggregate computed from a LEAN
    (source, counts) projection so its branch re-scans cheaply rather
    than re-running the heavy feature subtree (Spark does not reuse
    exchanges across branches). Two real exchanges end to end."""
    return funnel_flags(load_tables(spark, sf_dir)["documents"])


def _doc_feats(docs: DataFrame, extra: list) -> DataFrame:
    """ONE per-document feature projection shared by funnel_flags and
    gate_documents — the stream==batch guarantee those two advertise
    rests on the token/stopword/repetition features being the same
    expressions, so they are built in exactly one place. ``extra`` is
    a list of (name, Column) pairs to carry alongside."""
    return docs.select(
        "doc_id",
        "lang",
        "source",
        *[c.alias(n) for n, c in extra],
        F.split("text", " ").alias("ws"),
        n_tokens_col().alias("n_tokens"),
        n_stop_col().alias("n_stop"),
    ).select(
        "doc_id",
        "lang",
        "source",
        *[n for n, _ in extra],
        "n_tokens",
        "n_stop",
        F.greatest(F.size("ws") - 1, F.lit(0)).alias("n_bigrams"),
        F.expr(REP_TOP_CNT_SPARK).alias("top_cnt"),
    )


def funnel_flags(docs: DataFrame) -> DataFrame:
    """Composable core of curation_funnel over any
    (doc_id, lang, source, n_chars, text) DataFrame."""
    feats = _doc_feats(
        docs,
        [
            ("n_chars", F.col("n_chars")),
            ("nhash", F.md5(norm_text_col().cast("binary"))),
        ],
    )
    lean = docs.select(
        "source", n_tokens_col().alias("n_tokens"), n_stop_col().alias("n_stop")
    )
    sagg = lean.groupBy("source").agg(
        F.when(
            _PRUNE_DEN
            * F.sum(F.expr(quality_keep_sql("n_stop", "n_tokens")))
            >= _PRUNE_NUM * F.count("*"),
            1,
        )
        .otherwise(0)
        .alias("source_kept")
    )
    wr = Window.partitionBy("nhash").orderBy(F.desc("n_chars"), "doc_id")
    ranked = feats.withColumn("rk", F.row_number().over(wr))
    # eqNullSafe mirrors the oracle's IS NOT DISTINCT FROM: the audit
    # must stay TOTAL over input docs, and an equi-join would silently
    # drop every NULL-source row (observed on a planted corpus; the
    # driver corpus has no NULLs so parity alone could not catch it).
    sagg_r = F.broadcast(sagg.withColumnRenamed("source", "__src"))
    flags = ranked.join(
        sagg_r, F.col("source").eqNullSafe(F.col("__src"))
    ).select(
        "doc_id",
        "lang",
        "source",
        (1 - F.col("source_kept")).alias("drop_source"),
        (1 - F.expr(quality_keep_sql("n_stop", "n_tokens"))).alias(
            "drop_quality"
        ),
        (1 - F.expr(rep_keep_sql("top_cnt", "n_bigrams"))).alias(
            "drop_repetition"
        ),
        F.when(F.col("rk") > 1, 1).otherwise(0).alias("drop_duplicate"),
    )
    total = (
        F.col("drop_source")
        + F.col("drop_quality")
        + F.col("drop_repetition")
        + F.col("drop_duplicate")
    )
    return flags.withColumn(
        "final_keep", F.when(total == 0, 1).otherwise(0)
    )


def scrub_documents(docs: DataFrame) -> DataFrame:
    """Composable write-path form of pii_scrub: the redacted text plus
    per-pattern hit counts, per document. A stateless deterministic
    projection (no aggregate, no watermark needed), so it runs
    unchanged on a STREAMING DataFrame — the per-microbatch scrub a
    continuously ingesting pipeline applies is byte-identical to the
    batch form (tests/test_windows.py pins stream == batch on a
    corpus with planted PII)."""
    counts = [
        F.regexp_count("text", F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    return docs.select(
        "doc_id", "lang", "source", _redacted_col().alias("text"), *counts
    )


def gate_documents(docs: DataFrame) -> DataFrame:
    """The funnel's STATELESS stages (quality gate + repetition gate)
    as a per-document projection — safe on a live streaming
    DataFrame, where the corpus-wide stages (source keep-rate,
    duplicate resolution) cannot run without a batch/foreachBatch
    boundary. Shares the exact gate expressions with the funnel, so
    a document gated out on the stream is gated out in the batch
    audit too (tests/test_windows.py pins stream == batch)."""
    feats = _doc_feats(docs, [("text", F.col("text"))])
    quality = F.expr(quality_keep_sql("n_stop", "n_tokens"))
    repetition = F.expr(rep_keep_sql("top_cnt", "n_bigrams"))
    return feats.select(
        "doc_id",
        "lang",
        "source",
        "text",
        quality.alias("quality_keep"),
        repetition.alias("repetition_keep"),
        (quality * repetition).alias("gate_keep"),
    )


# ---------------------------------------------------------------------------
# token-budget selection: greedy per-language prefix under a budget
# ---------------------------------------------------------------------------

_TOKEN_BUDGET = 5000  # tokens per language


@register(
    "curation_token_budget",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             {N_TOKENS_DUCK} AS n_tokens,
             {N_STOP_DUCK} AS n_stop
      FROM documents WHERE text IS NOT NULL
    ), ranked AS (
      SELECT doc_id, lang, n_tokens,
             CAST(n_stop AS BIGINT) * 1000000 // n_tokens AS score,
             SUM(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY CAST(n_stop AS BIGINT) * 1000000 // n_tokens DESC,
                        doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM feats)
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM ranked WHERE cum_tokens <= {_TOKEN_BUDGET}
    """,
    tags=("curation", "sampling", "budget"),
)
def curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget curation: per language, take documents in quality
    order (the shared integer stopword-ratio key, doc_id tiebreak)
    until the cumulative token count reaches the language's budget —
    the materialized selection step downstream of
    curation_mix_temperature's proportion planning (that query decides
    HOW MANY tokens per language; this one decides WHICH documents).
    Greedy prefix-by-quality is the standard corpus-assembly rule.

    NULL-text documents carry no tokens and are excluded up front on
    both engines (an unfiltered NULL would ride along at the previous
    cumulative count and be selected for free). The running sum is a
    per-language ROWS window over integer token counts — exact, and
    at 100 TB the sort is per-language (the CCNet tier shape); the
    output is budget-bounded per language regardless of corpus size.
    """
    t = load_tables(spark, sf_dir)
    feats = t["documents"].filter(F.col("text").isNotNull()).select(
        "doc_id",
        "lang",
        n_tokens_col().alias("n_tokens"),
        n_stop_col().alias("n_stop"),
    )
    score = F.expr("cast(n_stop as bigint) * 1000000 div n_tokens")
    w = (
        Window.partitionBy("lang")
        .orderBy(score.desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        feats.select(
            "doc_id",
            "lang",
            "n_tokens",
            F.sum("n_tokens").over(w).alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= _TOKEN_BUDGET)
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "cum_tokens",
        )
    )


# ---------------------------------------------------------------------------
# corpus constraint audit (the runner's ingest-trust gate, as a query)
# ---------------------------------------------------------------------------

def _corpus_audit_oracle() -> str:
    from ..operators.audit import audit_oracle_sql, default_doc_checks

    return audit_oracle_sql("documents", default_doc_checks())


@register(
    "curation_corpus_audit",
    oracle=_corpus_audit_oracle(),
    tags=("curation", "audit", "constraints"),
)
def curation_corpus_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact constraint gate run_curation runs before trusting a
    corpus (curate.default_doc_checks: addressable non-NULL unique
    doc_id, non-NULL text, truthful n_chars), surfaced as a catalog
    query so the driver hash-verifies the gate itself — including
    over the dirty sweep corpora, where several checks genuinely
    fail. One scan, one aggregate, four conditional counts + one
    distinct-struct count (operators/audit.py)."""
    from ..operators.audit import audit, default_doc_checks

    docs = load_tables(spark, sf_dir)["documents"]
    return audit(docs, "documents", default_doc_checks())


# ---------------------------------------------------------------------------
# small-file compaction planning
# ---------------------------------------------------------------------------

# Target output-object size for the compaction plan. Scaled to the
# fixture corpus (text bytes per (source, lang) run ~tens of KB at
# sf0.01) so both the multi-file and single-file branches get
# exercised; a production lake uses 128 MB-1 GB. The PLAN shape —
# ceil-division file counts, balanced docs-per-file, oversize
# detection — is size-independent.
_COMPACT_TARGET_BYTES = 8_192


@register(
    "layout_compaction_plan",
    oracle=f"""
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS est_bytes,
           CAST(GREATEST(
             (COALESCE(SUM(n_chars), 0) + {_COMPACT_TARGET_BYTES - 1})
               // {_COMPACT_TARGET_BYTES}, 1) AS BIGINT) AS n_files,
           CAST({round_div_sql(
               "COUNT(*)",
               f"GREATEST((COALESCE(SUM(n_chars), 0) + "
               f"{_COMPACT_TARGET_BYTES - 1}) // {_COMPACT_TARGET_BYTES}, 1)",
               "//")} AS BIGINT) AS docs_per_file,
           CAST(SUM(CASE WHEN n_chars > {_COMPACT_TARGET_BYTES}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize
    FROM documents
    GROUP BY source, lang
    """,
    tags=("layout", "compaction", "ops"),
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan per (source, lang) layout partition:
    document count, estimated text bytes, the ceil-divided number of
    target-size output files, the balanced docs-per-file quota a
    writer would use, and how many single documents exceed the target
    (unsplittable — they force an oversized object each). This is the
    planning half of the 100 TB lake's small-files problem: a
    partition-clustered corpus written naively produces one object
    per task per partition, and readers pay per-object overhead; the
    plan is what a compaction job's ``repartition(n_files)`` per
    partition consumes. All integer arithmetic (ceil division via
    (s + T-1) div T, exactly-rounded quota), so both engines emit the
    identical plan. NULL source/lang are their own partition (they
    land in real directories); NULL n_chars contributes zero bytes
    but still counts as a document.

    Scale shape: one scan, one map-side-combinable aggregate over the
    layout key — the plan is proportional to |partitions|, never to
    corpus size."""
    return compaction_plan_for(load_tables(spark, sf_dir)["documents"])


def compaction_plan_for(
    docs: DataFrame, target_bytes: int = _COMPACT_TARGET_BYTES
) -> DataFrame:
    """Composable core of layout_compaction_plan over any
    (source, lang, n_chars, …) DataFrame — shared by the registered
    query and :func:`mypipe_spark.curate.compact_write`, which
    executes the plan, so the written layout can never drift from
    the reported one."""
    t = target_bytes
    est = F.coalesce(F.sum("n_chars"), F.lit(0))
    n_files = F.greatest(
        F.expr(
            f"(COALESCE(SUM(n_chars), 0) + {t - 1}) div {t}"
        ),
        F.lit(1).cast("long"),
    )
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        est.cast("long").alias("est_bytes"),
        n_files.cast("long").alias("n_files"),
        F.expr(
            round_div_sql(
                "COUNT(*)",
                f"GREATEST((COALESCE(SUM(n_chars), 0) + {t - 1}) div {t},"
                " CAST(1 AS BIGINT))",
                "div",
            )
        )
        .cast("long")
        .alias("docs_per_file"),
        # when/otherwise, not sum-of-cast: an all-NULL-n_chars
        # partition must report 0 oversize docs like the oracle's
        # CASE form, not NULL (the count_of_sql lesson)
        F.sum(F.when(F.col("n_chars") > t, 1).otherwise(0))
        .cast("long")
        .alias("n_oversize"),
    )


# ---------------------------------------------------------------------------
# z-order layout quality
# ---------------------------------------------------------------------------

_Z_BITS = 8          # per-dimension bucket resolution (256 buckets)
_Z_BUCKETS = 1 << _Z_BITS
_Z_BLOCK_SHIFT = 8   # a "file" is a contiguous run of 256 z-codes


def _morton16(xb: str, yb: str, dialect: str) -> str:
    """16-bit Morton (z-order) interleave of two _Z_BITS-bit bucket
    ids, as SQL text for either engine — the bit-twiddling is plain
    shifts/masks, but Spark spells them shiftleft()/shiftright()
    while DuckDB uses << / >> operators. Every term is parenthesized;
    the sum form needs no OR because the per-bit terms occupy
    disjoint bit positions."""
    terms = []
    for b in range(_Z_BITS):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({xb}, {b}) & 1, {2 * b})")
            terms.append(f"shiftleft(shiftright({yb}, {b}) & 1, {2 * b + 1})")
        else:
            terms.append(f"((({xb} >> {b}) & 1) << {2 * b})")
            terms.append(f"((({yb} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


_Z_SPANS = """
      SELECT blk,
             MAX(xb) - MIN(xb) + 1 AS sx,
             MAX(yb) - MIN(yb) + 1 AS sy,
             COUNT(*) AS c
      FROM {src} GROUP BY blk
"""


@register(
    "layout_zorder_quality",
    oracle=f"""
    WITH src AS (
      SELECT l_orderkey AS x, l_partkey AS y FROM lineitem
      WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
    bounds AS (
      SELECT MIN(x) AS minx, MAX(x) AS maxx,
             MIN(y) AS miny, MAX(y) AS maxy FROM src),
    t AS (
      SELECT ((x - minx) * {_Z_BUCKETS}) // (maxx - minx + 1) AS xb,
             ((y - miny) * {_Z_BUCKETS}) // (maxy - miny + 1) AS yb
      FROM src, bounds),
    zt AS (SELECT xb, yb,
                  {_morton16('xb', 'yb', 'duck')} >> {_Z_BLOCK_SHIFT} AS blk
           FROM t),
    lt AS (SELECT xb, yb, xb AS blk FROM t),
    zb AS ({_Z_SPANS.format(src='zt')}),
    lb AS ({_Z_SPANS.format(src='lt')})
    SELECT 'zorder' AS layout,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           {round4_frac_sql('CAST(SUM(sx) AS BIGINT)', 'COUNT(*)', '//')}
             AS avg_span_x,
           {round4_frac_sql('CAST(SUM(sy) AS BIGINT)', 'COUNT(*)', '//')}
             AS avg_span_y
    FROM zb
    UNION ALL
    SELECT 'linear',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(c) AS BIGINT),
           {round4_frac_sql('CAST(SUM(sx) AS BIGINT)', 'COUNT(*)', '//')},
           {round4_frac_sql('CAST(SUM(sy) AS BIGINT)', 'COUNT(*)', '//')}
    FROM lb
    """,
    tags=("layout", "zorder", "pruning"),
)
def layout_zorder_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout clustering quality: bucket the two lineitem join
    keys to 256 range buckets each (_Z_BITS = 8), group rows into
    equal z-range "files" under a 16-bit Morton (z-order) interleave
    versus a plain sort-by-one-key layout, and report each layout's
    average per-file bucket SPAN on both dimensions. A file's span on
    a column is exactly what min/max zone maps expose to scan
    pruning: span 256 means a predicate on that column prunes
    nothing, span ~16 means ~94% of files skip. The report quantifies
    the z-order trade — the linear layout is perfect on its sort key
    and useless on the other; z-order is ~sqrt-good on BOTH — which
    is the decision input for a 100 TB OPTIMIZE/CLUSTER BY job over a
    two-column workload. Buckets derive from broadcast corpus bounds
    via exact integer division, the interleave is pure shifts/masks,
    and the span averages go through the exact rounding helper, so
    both engines emit the identical report. NULL keys are outside
    every zone map (filtered, documented).

    Scale shape: ONE fact scan for the span stage plus the 1-row
    bounds aggregate's scan (broadcast back); each row fans out to
    its two (layout, block) assignments in-operator, so one
    map-side-combinable aggregate over at most 512 groups covers both
    layouts; nothing is ever globally sorted — the z-code IS the
    cluster assignment."""
    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .filter(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
        .select(F.col("l_orderkey").alias("x"), F.col("l_partkey").alias("y"))
    )
    bounds = li.agg(
        F.min("x").alias("minx"),
        F.max("x").alias("maxx"),
        F.min("y").alias("miny"),
        F.max("y").alias("maxy"),
    )
    t = li.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"((x - minx) * {_Z_BUCKETS}) div (maxx - minx + 1)").alias("xb"),
        F.expr(f"((y - miny) * {_Z_BUCKETS}) div (maxy - miny + 1)").alias("yb"),
    )
    # both layout assignments emitted from ONE pass over the bucketed
    # rows (explode of a 2-struct array), so the fact table is scanned
    # once for the span stage instead of once per layout branch
    both = t.select(
        "xb",
        "yb",
        F.explode(
            F.expr(
                f"""
                array(
                  named_struct('layout', 'zorder', 'blk',
                    shiftright({_morton16('xb', 'yb', 'spark')},
                               {_Z_BLOCK_SHIFT})),
                  named_struct('layout', 'linear', 'blk', xb))
                """
            )
        ).alias("e"),
    ).select("xb", "yb", F.col("e.layout").alias("layout"), F.col("e.blk").alias("blk"))
    per_blk = both.groupBy("layout", "blk").agg(
        (F.max("xb") - F.min("xb") + 1).alias("sx"),
        (F.max("yb") - F.min("yb") + 1).alias("sy"),
        F.count(F.lit(1)).alias("c"),
    )
    return per_blk.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("c").cast("long").alias("n_rows"),
        F.expr(
            round4_frac_sql("CAST(SUM(sx) AS BIGINT)", "COUNT(*)", "div")
        ).alias("avg_span_x"),
        F.expr(
            round4_frac_sql("CAST(SUM(sy) AS BIGINT)", "COUNT(*)", "div")
        ).alias("avg_span_y"),
    )


# ---------------------------------------------------------------------------
# per-source duplication report
# ---------------------------------------------------------------------------


@register(
    "curation_dedup_report",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source, md5(text) AS ch
      FROM documents),
    c AS (
      SELECT doc_id, source,
             COUNT(*) OVER (PARTITION BY ch) AS n_same,
             ROW_NUMBER() OVER (PARTITION BY ch ORDER BY doc_id)
               AS rn
      FROM h)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_same > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_involved,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removable,
           {floor4_frac_sql("CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS HUGEINT)", "COUNT(*)", "//")}
             AS removable_rate
    FROM c GROUP BY source
    """,
    tags=("curation", "dedup", "audit"),
)
def curation_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication pressure — the report a curation run
    reads before choosing which sources need the full dedup pass:
    per source, how many docs are INVOLVED in an exact-duplicate
    group (share content hash with any other doc, across source
    boundaries) and how many are REMOVABLE (every occurrence past the
    group's smallest doc_id — dedup_exact's keep-smallest survivor
    convention, so n_removable sums to exactly the rows dedup would
    drop), plus the removable rate. NULL-text docs follow
    dedup_exact's grouping exactly (md5(NULL) is NULL and window
    PARTITION BY groups NULLs together on both engines), so the
    cross-plane sum contract holds on dirty corpora too — a
    text-IS-NOT-NULL filter here would silently break it the moment a
    corpus holds two NULL-text docs. Distinguishing involved from
    removable matters: a source can be 100% dup-involved but 0%
    removable when it holds every group's canonical copy.

    Scale: one exchange on the content hash for the group window (no
    ORDER on the count, doc_id order for the survivor rank), one on
    source for the rollup — both 16-byte keys; the rate is the house
    floor-to-4-digits integer ratio. NULL sources report as their own
    row (same convention as the compaction plan)."""
    h = scale_out(load_tables(spark, sf_dir)["documents"]).select(
        "doc_id", "source", F.md5(F.col("text").cast("binary")).alias("ch")
    )
    wc = Window.partitionBy("ch")
    wr = Window.partitionBy("ch").orderBy("doc_id")
    c = h.select(
        "doc_id",
        "source",
        F.count(F.lit(1)).over(wc).alias("n_same"),
        F.row_number().over(wr).alias("rn"),
    )
    return c.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_same") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_involved"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_removable"),
        F.expr(
            floor4_frac_sql(
                "CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DECIMAL(38,0))",
                "COUNT(*)",
                "div",
            )
        ).alias("removable_rate"),
    )


# ---------------------------------------------------------------------------
# partition-column advisor (layout-plane decision input)
# ---------------------------------------------------------------------------

# Advisory thresholds, shared by plan and oracle: a candidate column
# is too granular past this many distinct values (tiny files at write
# time) and too skewed when one value holds more than half the corpus
# (one giant partition defeats pruning AND parallel writes).
_ADVISOR_MAX_VALUES = 64
_ADVISOR_MAX_SHARE_X4 = 5000  # 0.5 in the floor-4-digits domain


def _advisor_cte(col: str) -> str:
    return f"""
      SELECT '{col}' AS candidate,
             CAST(COUNT(*) AS BIGINT) AS n_values,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(MAX(n) AS BIGINT) AS max_partition_rows,
             {floor4_frac_sql("CAST(MAX(n) AS HUGEINT)", "SUM(n)", "//")}
               AS max_share,
             CAST(CASE WHEN COUNT(*) > {_ADVISOR_MAX_VALUES} THEN 1
                       ELSE 0 END AS INT) AS too_granular,
             CAST(CASE WHEN CAST(MAX(n) AS HUGEINT) * 10000
                            > {_ADVISOR_MAX_SHARE_X4} * CAST(SUM(n) AS HUGEINT)
                       THEN 1 ELSE 0 END AS INT) AS too_skewed
      FROM (SELECT {col} AS v, COUNT(*) AS n FROM documents GROUP BY {col})
    """


@register(
    "layout_partition_advisor",
    oracle=f"""
    SELECT * FROM ({_advisor_cte("source")})
    UNION ALL
    SELECT * FROM ({_advisor_cte("lang")})
    """,
    tags=("layout", "advisor", "diagnostics"),
)
def layout_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-column advisor for the documents corpus — the
    decision input in front of compact_write / partitionBy at 100 TB:
    for each candidate partition column (source, lang), its value
    cardinality, the largest partition's row count and corpus share
    (floor-4-digits, never rounded up past the true share), and two
    integer-exact advisory flags — ``too_granular`` (more values than
    the files-per-write budget tolerates: tiny-file explosion) and
    ``too_skewed`` (one value holds >50% of rows: a straggler
    partition that defeats both pruning and parallel writes; the
    comparison is a HUGEINT/DECIMAL38 cross-multiplication — no
    double crosses the engine boundary). NULL is a value like any
    other (it becomes the hive default partition on disk).

    Scale: one map-side-combinable per-value count + a one-row rollup
    PER CANDIDATE, unioned — each candidate costs exactly the
    aggregate a real partitionBy would pay anyway; candidates never
    join or multiply."""
    docs = scale_out(load_tables(spark, sf_dir)["documents"])

    def side(col: str) -> DataFrame:
        per = docs.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        return per.agg(
            F.lit(col).alias("candidate"),
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.sum("n").cast("long").alias("n_rows"),
            F.max("n").cast("long").alias("max_partition_rows"),
            F.expr(
                floor4_frac_sql(
                    "CAST(MAX(n) AS DECIMAL(38,0))", "SUM(n)", "div"
                )
            ).alias("max_share"),
            F.expr(
                f"CAST(CASE WHEN COUNT(*) > {_ADVISOR_MAX_VALUES} THEN 1"
                " ELSE 0 END AS INT)"
            ).alias("too_granular"),
            F.expr(
                "CAST(CASE WHEN CAST(MAX(n) AS DECIMAL(38,0)) * 10000"
                f" > {_ADVISOR_MAX_SHARE_X4} * CAST(SUM(n) AS DECIMAL(38,0))"
                " THEN 1 ELSE 0 END AS INT)"
            ).alias("too_skewed"),
        )

    return side("source").unionByName(side("lang"))
