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

from .catalog import ASCII_LOWER, ASCII_UPPER, load_tables, register, round4_frac_sql, scale_out

# Marker stopwords for the language-ID heuristic and quality score.
_STOPWORDS = ("the", "a", "of", "to", "and", "in")
_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)
_SW_SPARK = _SW_SQL  # one constant: the oracle and the plan must agree

# Quality keep-gate: ONE expression string, valid verbatim in both
# Spark SQL and DuckDB, shared by text_quality_score (per-doc gate)
# and curation_source_prune (source-level keep-rate) so the two
# queries can never drift apart on what "keep" means. The ratio
# compare stays in DOUBLE exactly as the per-doc gate always did —
# the division is correctly rounded in both engines and compared to
# the same literal, so the outcome is engine-identical.
QUALITY_MIN_TOKENS = 20
QUALITY_STOP_RATIO = "0.05"


def quality_keep_sql(n_stop: str, n_tokens: str) -> str:
    """The keep/drop gate over precomputed integer token counts as a
    dialect-portable SQL expression (1 = keep)."""
    return (
        f"(CASE WHEN {n_tokens} >= {QUALITY_MIN_TOKENS}"
        f" AND CAST({n_stop} AS DOUBLE) / {n_tokens} >= {QUALITY_STOP_RATIO}"
        " THEN 1 ELSE 0 END)"
    )


# The gate's two integer features, one definition per dialect (DuckDB
# list_filter vs Spark filter — same lambda, same stopword list).
N_TOKENS_DUCK = "len(string_split(text, ' '))"
N_STOP_DUCK = f"len(list_filter(string_split(text, ' '), w -> w IN ({_SW_SQL})))"


def n_tokens_col():
    return F.size(F.split("text", " "))


def n_stop_col():
    return F.size(F.expr(f"filter(split(text, ' '), w -> w IN ({_SW_SPARK}))"))


@register(
    "text_token_stats",
    oracle=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           {round4_frac_sql("SUM(len(string_split(text, ' ')))", "COUNT(*)", "//")}
             AS avg_tokens,
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
            F.expr(
                round4_frac_sql(
                    "SUM(size(split(text, ' ')))", "COUNT(*)", "div"
                )
            ).alias("avg_tokens"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             {N_TOKENS_DUCK} AS n_tokens,
             {N_STOP_DUCK} AS n_stop,
             length(text) AS n_char,
             length(replace(text, ' ', '')) AS n_nonspace
      FROM documents)
    SELECT doc_id, lang, n_tokens,
           {round4_frac_sql('n_stop', 'n_tokens', '//')}
             AS stopword_ratio,
           {round4_frac_sql('n_nonspace', 'n_tokens', '//')}
             AS avg_token_len,
           {quality_keep_sql('n_stop', 'n_tokens')} AS keep
    FROM feats
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features (length, stopword ratio, mean token
    length) + a keep/drop gate — the standard pre-training corpus
    filter, as one projection over the scan (no shuffle at all)."""
    t = load_tables(spark, sf_dir)
    n_tokens = n_tokens_col()
    n_stop = n_stop_col()
    n_nonspace = F.length(F.regexp_replace("text", " ", ""))
    feats = t["documents"].select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stop"),
        n_nonspace.alias("n_nonspace"),
    )
    # keep-gate on the raw ratio; display ratios in exact integer
    # rounding (ROUND(double, 4) is not portable at .5-repr boundaries)
    return feats.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(round4_frac_sql("n_stop", "n_tokens", "div")).alias("stopword_ratio"),
        F.expr(round4_frac_sql("n_nonspace", "n_tokens", "div")).alias(
            "avg_token_len"
        ),
        F.expr(quality_keep_sql("n_stop", "n_tokens")).alias("keep"),
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
           md5(text) AS content_hash,
           md5(array_to_string(list_sort(list_distinct(string_split(
               translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                         'abcdefghijklmnopqrstuvwxyz'), ' '))), ' '))
             AS bag_hash
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content hash + an order-insensitive
    bag-of-words hash (ASCII-case-folded sorted distinct tokens
    re-joined → md5 — see catalog.ascii_fold_sql for why NOT full
    Unicode lower()), the cheap word-shuffle-dup detector. content_hash is
    md5(text) VERBATIM — the same key dedup_exact and
    incremental_dedup_flags group/join on, so this table IS the
    materialized fingerprint corpus those ops read (a case-folded hash
    here would wrongly flag case-variant docs as exact dups). Both
    columns are pure projections; at 100 TB the fingerprints become
    the groupBy keys for incremental dedup (new batch vs corpus =
    hash anti-join, not text compare)."""
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("content_hash"),
        # ASCII-only fold: engine-tailored Unicode lower() would make
        # this hash differ by engine on non-ASCII corpora
        F.md5(
            F.array_join(
                F.array_sort(
                    F.array_distinct(
                        F.split(
                            F.translate(
                                F.col("text"), ASCII_UPPER, ASCII_LOWER
                            ),
                            " ",
                        )
                    )
                ),
                " ",
            ).cast("binary")
        ).alias("bag_hash"),
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------

# Keep 3 of every 10 hash buckets — a fixed, reproducible 30% sample.
_SAMPLE_BUCKETS = 10
_SAMPLE_KEEP = 3


@register(
    "text_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)
          % {_SAMPLE_BUCKETS} < {_SAMPLE_KEEP}
    """,
    tags=("text", "sampling"),
)
def text_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucket sampling — the reproducible form of
    df.sample() a training pipeline needs (re-runs, audits, and
    incremental appends must select the SAME documents; rand()-based
    sampling can't). The doc_id md5 prefix parses to the same 28-bit
    integer in both engines (conv vs CAST '0x'), so the sample is
    engine-exact. A pure scan filter: no shuffle, fully pushdown-
    compatible, trivially parallel at any scale. Stratification is
    implicit — a uniform hash samples every (lang, source) stratum at
    the same rate; the companion oracle-checked aggregate in
    tests/test_oracle_parity.py pins per-stratum rates."""
    return stratified_sample(load_tables(spark, sf_dir)["documents"])


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Composable core of text_sample_stratified: the deterministic
    hash-bucket filter over any (doc_id, lang, source, …) DataFrame.
    A pure stateless row filter, so it runs unchanged on a STREAMING
    DataFrame (append mode, no watermark) — the per-microbatch sample
    a streaming ingest takes is the same set the batch job would pick
    (tests/test_windows.py pins stream==batch)."""
    bucket = (
        F.expr(
            "cast(conv(substring(md5(cast(cast(doc_id as string) as binary)), 1, 7), 16, 10) as bigint)"
        )
        % _SAMPLE_BUCKETS
    )
    return docs.filter(bucket < _SAMPLE_KEEP).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# token-budget sequence packing
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256  # tokens per packed training sequence


@register(
    "text_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    runs AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks)
    SELECT doc_id, lang, n_tokens,
           CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST((cum - n_tokens) % {_PACK_BUDGET} AS BIGINT) AS seq_offset
    FROM runs
    """,
    tags=("text", "packing", "window"),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid head-to-
    tail in doc_id order and cut into fixed token-budget training
    sequences; each doc learns which sequence it starts in and at what
    offset (the standard pre-training packing layout). One running-sum
    window per ``lang`` partition — integer arithmetic, so both
    engines agree exactly. 100 TB note: packing is per-stratum
    (PARTITION BY lang), never a global single-partition sort; a real
    pipeline packs per output shard the same way."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    n_tokens = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Integer floor-division on both sides: DuckDB's `/` is float
    # division and its double→BIGINT cast ROUNDS (Spark's truncates),
    # so the quotient must stay integral end-to-end.
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        t["documents"]
        .select("doc_id", "lang", n_tokens.alias("n_tokens"))
        .withColumn("__start", start)
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr(f"__start div {_PACK_BUDGET}").cast("bigint").alias("seq_id"),
            (F.col("__start") % _PACK_BUDGET).cast("bigint").alias("seq_offset"),
        )
    )


# ---------------------------------------------------------------------------
# top bigrams per language
# ---------------------------------------------------------------------------

_TOP_BIGRAMS = 5


@register(
    "text_top_bigrams",
    oracle=f"""
    WITH words AS (
      SELECT lang, string_split(text, ' ') AS ws FROM documents),
    bigrams AS (
      SELECT lang, UNNEST(list_transform(
               range(1, greatest(len(ws), 1)),
               i -> ws[i] || ' ' || ws[i+1])) AS bigram
      FROM words),
    counts AS (
      SELECT lang, bigram, COUNT(*) AS n
      FROM bigrams GROUP BY lang, bigram),
    ranked AS (
      SELECT lang, bigram, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, bigram) AS rk
      FROM counts)
    SELECT lang, bigram, n, rk FROM ranked WHERE rk <= {_TOP_BIGRAMS}
    """,
    tags=("text", "ngram", "topk"),
    bench=True,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram statistics: the {_TOP_BIGRAMS} most frequent word
    bigrams per language (vocabulary/LM preprocessing). Bigrams emerge
    from one higher-order transform (no UDF), counts map-side-combine
    on (lang, bigram), and the top-k window runs over the already-
    aggregated counts only — never the raw bigram stream. Ties break
    lexicographically so both engines pick identical rows."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    # `words` is a named intermediate so the split runs once per row,
    # not three times per bigram inside the transform lambda. The `if`
    # guard is load-bearing: Spark's sequence(a, b) is bidirectional,
    # so a single-word doc would otherwise get the DESCENDING [1, 0]
    # and index words out of range (an ANSI runtime error).
    bigram = F.expr(
        """
        if(size(words) < 2, array(),
          transform(
            sequence(1, size(words) - 1),
            i -> concat(words[i - 1], ' ', words[i])
          ))
        """
    )
    counts = (
        t["documents"]
        .select("lang", F.split("text", " ").alias("words"))
        .select("lang", F.explode(bigram).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "bigram")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOP_BIGRAMS)
    )


# ---------------------------------------------------------------------------
# regex marker counts (the PII/pattern-scan shape)
# ---------------------------------------------------------------------------

@register(
    "text_pattern_counts",
    oracle="""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, 'spark'))) AS BIGINT)
             AS n_spark,
           CAST(SUM(len(regexp_extract_all(text, '\\bthe\\b'))) AS BIGINT)
             AS n_the,
           CAST(SUM(len(regexp_extract_all(text, 'fast (sort|merge)'))) AS BIGINT)
             AS n_fast_pair,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "regex", "scan"),
)
def text_pattern_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide regex occurrence counts — the PII-scan shape (email/
    phone/URL detectors are the same plan with different patterns; this
    fixture's vocabulary has word markers instead). regexp_count is a
    JVM-side codegen expression over the scan, aggregated map-side:
    the whole query is one pass, no shuffle beyond the 10-row final
    exchange. Patterns use RE2-compatible syntax (word boundaries,
    alternation) so Spark's Java regex and DuckDB's RE2 agree."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .groupBy("lang")
        .agg(
            F.sum(F.regexp_count("text", F.lit("spark"))).alias("n_spark"),
            F.sum(F.regexp_count("text", F.lit(r"\bthe\b"))).alias("n_the"),
            F.sum(F.regexp_count("text", F.lit("fast (sort|merge)"))).alias(
                "n_fast_pair"
            ),
            F.count("*").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic per-stratum reservoir (top-k by hash order)
# ---------------------------------------------------------------------------

_RESERVOIR_K = 20


@register(
    "text_reservoir_per_lang",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents)
    WHERE rk <= {_RESERVOIR_K}
    """,
    tags=("text", "sampling", "window"),
)
def text_reservoir_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded per-stratum sample: exactly {k} documents per language,
    chosen by hash order — the deterministic equivalent of a per-group
    reservoir sample (same docs every run, every engine). The rank-≤-k
    predicate engages WindowGroupLimit, so each partition forwards at
    most k rows per stratum to the shuffle; total output is
    strata×k, independent of corpus size."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    return (
        t["documents"]
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _RESERVOIR_K)
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# BPE-ish subtoken estimation
# ---------------------------------------------------------------------------

_SUBTOKEN_CHARS = 4  # crude BPE stand-in: ceil(len/4) subtokens per word

_SQL_SUBTOK_SUM = (
    "SUM(list_sum(list_transform(string_split(text, ' '),"
    f" w -> (length(w) + {_SUBTOKEN_CHARS - 1}) // {_SUBTOKEN_CHARS})))"
)


@register(
    "text_subtoken_estimate",
    oracle=f"""
    SELECT lang,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
           CAST({_SQL_SUBTOK_SUM} AS BIGINT) AS total_subtokens,
           {round4_frac_sql(_SQL_SUBTOK_SUM, "SUM(len(string_split(text, ' ')))", "//")}
             AS subtokens_per_word
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "tokens", "bpe"),
)
def text_subtoken_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-token budget estimation — the BPE-ish complement to
    whitespace counting (LLM training budgets are subword counts, and
    ceil(len/{n}) per word is the standard quick estimator). Pure
    integer higher-order expressions (transform → aggregate) in
    whole-stage codegen; exact integer sums so the ratio is
    engine-identical before rounding."""
    t = load_tables(spark, sf_dir)
    subtok = F.expr(
        f"aggregate(transform(split(text, ' '),"
        f" w -> (length(w) + {_SUBTOKEN_CHARS - 1}) div {_SUBTOKEN_CHARS}),"
        " 0L, (acc, x) -> acc + x)"
    )
    nwords = F.size(F.split("text", " "))
    return (
        t["documents"]
        .groupBy("lang")
        .agg(
            F.sum(nwords).alias("total_words"),
            F.sum(subtok).alias("total_subtokens"),
        )
        .select(
            "lang",
            "total_words",
            "total_subtokens",
            F.expr(
                round4_frac_sql("total_subtokens", "total_words", "div")
            ).alias("subtokens_per_word"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------------

_TFIDF_TOP = 3
# Rational idf: (N * scale) // df — exact integers. The scale and the
# saturating tf cap together BOUND the score in BIGINT at any corpus
# size: score <= TF_CAP * N * IDF_SCALE <= 1e5 * N * 1e3, which stays
# under 2^63 for corpora up to ~9e10 documents (a 1e6 idf scale with
# uncapped tf overflows at the 100 TB brief's own scale — a df=1 term
# repeated enough in one document — and Spark 4 ANSI mode / DuckDB
# both turn that into a runtime error, not a wrap).
_IDF_SCALE = 1_000
_TF_CAP = 100_000


@register(
    "text_tfidf_topterms",
    oracle=f"""
    WITH tfc AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tfc GROUP BY doc_id, term),
    df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.term, t.tf, d.df,
             LEAST(t.tf, {_TF_CAP}) * ((n.n_docs * {_IDF_SCALE}) // d.df)
               AS score
      FROM tf t JOIN df d ON d.term = t.term, n),
    ranked AS (
      SELECT doc_id, term, tf, df, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rk
      FROM scored)
    SELECT doc_id, term, tf, df, score, rk
    FROM ranked WHERE rk <= {_TFIDF_TOP}
    """,
    tags=("text", "tfidf", "topk"),
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the {k} highest TF-IDF terms
    per doc. IDF is the RATIONAL form (N·10³) div df — a monotone
    integer-exact stand-in for log(N/df), so scores are BIGINTs both
    engines compute identically (a log-based idf is a double whose
    libm rounding the two engines need not share); tf saturates at
    {cap} so the score provably fits BIGINT at any realistic corpus
    size (see the constants' note). Tie-break is (score desc, term
    asc) so both engines pick identical rows.

    Scale shape: tf is one (doc,term) map-side-combinable aggregate
    off the exploded scan; df rides an UNORDERED count window over the
    term partitioning of those already-distinct tf pairs (never the
    raw token stream) instead of a groupBy-then-join-back — Spark
    plans each reference to the tf subtree as its own scan+explode
    (no cross-branch exchange reuse), so the join-back form executed
    the exploded corpus pass TWICE; the window form costs the same
    term exchange the join would have and pays the corpus pass once
    (the dedup_duplicate_spans lesson; plan-pinned: ONE Generate).
    The corpus size joins in as a broadcast scalar off a plain
    un-exploded count scan; the final top-k window runs per doc_id
    with WindowGroupLimit."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    docs = t["documents"]
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    with_df = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        with_df
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.expr(
                f"least(tf, {_TF_CAP}L) * ((n_docs * {_IDF_SCALE}) div df)"
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TFIDF_TOP)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


# Repetition primitives, shared by text_repetition_score and the
# curation funnel. Spark: the top-bigram multiplicity as one
# aggregate() fold over the sorted per-row bigram list (expects a
# column ``ws`` = split words). DuckDB: the same quantity the
# relational way, as a reusable CTE chain defining ``w``(doc_id, ws)
# and ``tc``(doc_id, top_cnt).
REP_TOP_CNT_SPARK = """
    aggregate(
      array_sort(if(size(ws) < 2, array(),
        transform(sequence(1, size(ws) - 1),
          i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))))),
      struct(0 AS best, 0 AS run, CAST(NULL AS STRING) AS prev),
      (acc, x) -> struct(
        greatest(acc.best, if(x = acc.prev, acc.run + 1, 1)),
        if(x = acc.prev, acc.run + 1, 1),
        x),
      acc -> acc.best)
    """

REP_CTES_DUCK = """w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    b AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(ws)),
                    i -> ws[i] || ' ' || ws[i+1])) AS bg
      FROM w WHERE len(ws) >= 2),
    tc AS (
      SELECT doc_id, MAX(c) AS top_cnt
      FROM (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY 1, 2)
      GROUP BY doc_id)"""

# The repetition keep-gate over (top_cnt, n_bigrams) integers — top
# bigram may take at most 1/5 of all bigrams; bigram-free docs keep.
def rep_keep_sql(top_cnt: str, n_bigrams: str) -> str:
    return (
        f"(CASE WHEN {n_bigrams} = 0 OR 5 * {top_cnt} <= {n_bigrams}"
        " THEN 1 ELSE 0 END)"
    )


@register(
    "text_repetition_score",
    oracle=f"""
    WITH {REP_CTES_DUCK},
    feats AS (
      SELECT w.doc_id,
             len(ws) AS n_words,
             len(ws) - len(list_distinct(ws)) AS n_dup_words,
             GREATEST(len(ws) - 1, 0) AS n_bigrams,
             COALESCE(tc.top_cnt, 0) AS top_cnt
      FROM w LEFT JOIN tc ON tc.doc_id = w.doc_id)
    SELECT doc_id, n_words,
           {round4_frac_sql('n_dup_words', 'n_words', '//')} AS dup_word_frac,
           CASE WHEN n_bigrams = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE {round4_frac_sql('top_cnt', 'n_bigrams', '//')}
           END AS top_bigram_frac,
           {rep_keep_sql('top_cnt', 'n_bigrams')} AS keep
    FROM feats
    """,
    tags=("text", "quality", "repetition"),
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals — the Gopher/MassiveText
    repetition filters (Rae et al. 2021, table A1 — public method):
    duplicate-word fraction and the fraction of bigrams taken by the
    single most frequent bigram, plus the keep-gate 'top bigram ≤ 20%
    of bigrams' (short docs with no bigrams keep). Boilerplate-looped
    pages score high and drop before any cross-document dedup runs.

    Pure higher-order functions, no shuffle: the top-bigram
    multiplicity is the longest equal-run in the SORTED per-row bigram
    list, computed by one aggregate() fold instead of an
    explode+groupBy round trip (the oracle states the same quantity
    the relational way). Ratios render through the exact integer
    round4 machinery; the keep-gate compares integers (5·top ≤ n), so
    neither engine ever rounds a double."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].select("doc_id", F.split("text", " ").alias("ws"))
    feats = d.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        (F.size("ws") - F.size(F.array_distinct("ws"))).alias("n_dup_words"),
        F.greatest(F.size("ws") - 1, F.lit(0)).alias("n_bigrams"),
        F.expr(REP_TOP_CNT_SPARK).alias("top_cnt"),
    )
    return feats.select(
        "doc_id",
        "n_words",
        F.expr(round4_frac_sql("n_dup_words", "n_words", "div")).alias(
            "dup_word_frac"
        ),
        F.when(F.col("n_bigrams") == 0, F.lit(0.0))
        .otherwise(F.expr(round4_frac_sql("top_cnt", "n_bigrams", "div")))
        .alias("top_bigram_frac"),
        F.expr(rep_keep_sql("top_cnt", "n_bigrams")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# sliding-window chunking (embedding/RAG chunker)
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 128
_CHUNK_STRIDE = 96  # 25% overlap


@register(
    "text_chunk_sliding",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    starts AS (
      SELECT doc_id, n_tokens,
             UNNEST(range(0, GREATEST(n_tokens - {_CHUNK_TOKENS}, 0)
                             + {_CHUNK_STRIDE},
                          {_CHUNK_STRIDE})) AS tok_start
      FROM toks
      WHERE n_tokens IS NOT NULL)
    SELECT doc_id, n_tokens,
           CAST(tok_start // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(tok_start AS BIGINT) AS tok_start,
           CAST(LEAST({_CHUNK_TOKENS}, n_tokens - tok_start) AS BIGINT)
             AS tok_len
    FROM starts
    """,
    tags=("text", "chunking", "rag"),
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap — the embedding/RAG
    chunker (window 128, stride 96: 25% overlap so no boundary
    context is lost), distinct from text_pack_sequences' head-to-tail
    training layout. Each document explodes into its chunk work list
    (chunk_idx, tok_start, tok_len); the last chunk is short rather
    than padded. Stride-aligned starts guarantee every token is
    covered and chunk_idx is derivable from tok_start in both
    engines' integer arithmetic. A pure sequence→explode projection:
    no shuffle, no UDF, output bounded by total_tokens/stride."""
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    # NULL text must yield NO chunks: greatest/least skip NULLs, so an
    # unguarded sequence would emit a phantom full-width chunk for a
    # document with no text (both engines agree, so parity alone
    # cannot catch it).
    starts = toks.filter(F.col("n_tokens").isNotNull()).select(
        "doc_id",
        "n_tokens",
        F.explode(
            # bound greatest(n-w, 0) + stride - 1 (Spark sequence is
            # bound-INCLUSIVE; the oracle's range is exclusive, hence
            # its + stride): one extra stride-aligned start past n-w,
            # so trailing tokens always land in a (shorter) final
            # chunk — the bare n-w bound left up to stride-1 tokens
            # of every document uncovered — while a start whose
            # predecessor already reached the end is never emitted.
            F.expr(
                f"sequence(0, greatest(n_tokens - {_CHUNK_TOKENS}, 0)"
                f" + {_CHUNK_STRIDE - 1}, {_CHUNK_STRIDE})"
            )
        ).alias("tok_start"),
    )
    return starts.select(
        "doc_id",
        "n_tokens",
        F.expr(f"tok_start div {_CHUNK_STRIDE}").cast("bigint").alias("chunk_idx"),
        F.col("tok_start").cast("bigint"),
        F.least(F.lit(_CHUNK_TOKENS), F.col("n_tokens") - F.col("tok_start"))
        .cast("bigint")
        .alias("tok_len"),
    )


# ---------------------------------------------------------------------------
# CCNet-style per-language quality buckets
# ---------------------------------------------------------------------------

_QB_N = 3  # head / middle / tail


@register(
    "text_quality_buckets_per_lang",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             {N_TOKENS_DUCK} AS n_tokens,
             {N_STOP_DUCK} AS n_stop
      FROM documents
    ), scored AS (
      SELECT lang, n_tokens, n_stop, doc_id,
             COALESCE(CAST(n_stop AS BIGINT) * 1000000 // n_tokens, -1)
               AS score
      FROM feats
    ), bucketed AS (
      SELECT lang, n_tokens, n_stop,
             NTILE({_QB_N}) OVER (
               PARTITION BY lang ORDER BY score DESC, doc_id) AS b
      FROM scored)
    SELECT lang,
           CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
           COUNT(*) AS n_docs,
           {round4_frac_sql('SUM(n_stop)', 'SUM(n_tokens)', '//')}
             AS stop_ratio,
           CAST(SUM({quality_keep_sql('n_stop', 'n_tokens')}) AS BIGINT)
             AS n_keep
    FROM bucketed GROUP BY 1, 2
    """,
    tags=("text", "quality", "buckets"),
)
def text_quality_buckets_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language quality tiers: within each language,
    rank documents by quality (the shared stopword-ratio signal — the
    perplexity stand-in this container can express) and NTILE them
    into head / middle / tail thirds, reporting each tier's size,
    aggregate stop-ratio and how many docs the standing keep-gate
    (quality_keep_sql — the SAME expression the funnel and source
    pruner use) would retain. CCNet trains on the head and discards
    the tail; the tier assignment is the reusable part.

    Portability: the rank key is the INTEGER micro-ratio
    n_stop·10⁶ div n_tokens (a double ratio could order differently
    at the last ulp), tie-broken by doc_id, and NULL-text documents
    get an explicit -1 key so the tail placement is a stated contract
    rather than a default: Spark and DuckDB agree on DESC (both NULLS
    LAST) but diverge on ASC (Spark NULLS FIRST, DuckDB NULLS LAST —
    the events-plane divergences were all ASC orderings), so never
    leave a NULLable sort key to engine defaults. NTILE's ceil/floor
    fill is standard SQL and identical in both. Scale: one shuffle on
    lang; per-language NTILE is a within-partition sort, which is the
    documented CCNet shape — a production variant at extreme per-lang
    skew would switch to approx-percentile cutoffs (the _check-twin
    pattern) instead of a total order."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    feats = t["documents"].select(
        "doc_id",
        "lang",
        n_tokens_col().alias("n_tokens"),
        n_stop_col().alias("n_stop"),
    )
    scored = feats.select(
        "lang",
        "n_tokens",
        "n_stop",
        "doc_id",
        F.expr(
            "coalesce(cast(n_stop as bigint) * 1000000 div n_tokens, -1)"
        ).alias("score"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), "doc_id")
    bucketed = scored.select(
        "lang", "n_tokens", "n_stop", F.ntile(_QB_N).over(w).alias("b")
    )
    return bucketed.groupBy(
        "lang",
        F.when(F.col("b") == 1, "head")
        .when(F.col("b") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    ).agg(
        F.count("*").alias("n_docs"),
        F.expr(
            round4_frac_sql("SUM(n_stop)", "SUM(n_tokens)", "div")
        ).alias("stop_ratio"),
        F.sum(F.expr(quality_keep_sql("n_stop", "n_tokens"))).alias("n_keep"),
    )


# ---------------------------------------------------------------------------
# boilerplate line removal (CCNet / RefinedWeb line-level dedup)
# ---------------------------------------------------------------------------

_LINE_DF = 2  # a line present in >= this many distinct docs is boilerplate


@register(
    "text_line_dedup",
    oracle=f"""
    WITH ls AS (
      SELECT doc_id, string_split(text, chr(10)) AS arr
      FROM documents WHERE text IS NOT NULL
    ), lines0 AS (
      -- generate_subscripts zips with unnest (the lateral range table
      -- function rejects column parameters in DuckDB)
      SELECT doc_id, generate_subscripts(arr, 1) AS pos,
             unnest(arr) AS line
      FROM ls
    ), lines AS (
      SELECT doc_id, pos, line, md5(line) AS lkey FROM lines0
    ), boiler AS (
      SELECT lkey FROM (
        SELECT lkey, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY lkey)
      WHERE df >= {_LINE_DF}
    ), kept AS (
      SELECT l.doc_id, l.pos, l.line FROM lines l
      WHERE l.lkey NOT IN (SELECT lkey FROM boiler)
    ), reasm AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
           CAST(len(string_split(d.text, chr(10)))
                - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(r.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN reasm r ON d.doc_id = r.doc_id
    WHERE d.text IS NOT NULL
    """,
    tags=("text", "dedup", "lines"),
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    f"""Boilerplate line removal — the CCNet / RefinedWeb line-level
    dedup stage: a line occurring in ≥ {_LINE_DF} DISTINCT documents
    (nav bars, cookie banners, license headers) is dropped from every
    document, and the survivors are reassembled in original order.

    Shape: posexplode keeps each line's position; the corpus-wide
    document frequency groups on the line's md5 DIGEST (the shuffle
    carries 16-byte keys, never the line text — the snapshot-diff
    discipline); the boilerplate set joins back as a left-anti, and
    reassembly is one per-doc aggregate (collect → array_sort by pos
    → concat_ws), giving deterministic text independent of shuffle
    arrival order. Totality: every text-bearing doc returns a row —
    a fully-boilerplate doc keeps an EMPTY clean_text rather than
    vanishing with the anti-join (the funnel lesson). The driver
    corpus has single-line texts, so there the stage degenerates to
    whole-text boilerplate removal (exact dups); the planted pin and
    the dirty sweep exercise true multi-line reassembly."""
    t = load_tables(spark, sf_dir)
    base = t["documents"].filter(F.col("text").isNotNull())
    lines = base.select(
        "doc_id",
        F.posexplode(F.split("text", "\n")).alias("pos", "line"),
    ).withColumn("lkey", F.md5("line"))
    boiler = (
        lines.select("lkey", "doc_id")
        .distinct()
        .groupBy("lkey")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= _LINE_DF)
        .select("lkey")
    )
    reasm = (
        lines.join(boiler, "lkey", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.expr(
                "concat_ws('\n', transform(array_sort("
                "collect_list(struct(pos, line))), s -> s.line))"
            ).alias("clean_text"),
        )
    )
    n_lines = F.size(F.split("text", "\n")).cast("bigint")
    return (
        base.select("doc_id", n_lines.alias("n_lines"))
        .join(reasm, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


# ---------------------------------------------------------------------------
# weighted (PPS) systematic sampling per language
# ---------------------------------------------------------------------------

_PPS_STEP = 4096  # one sampling point per this many characters


@register(
    "text_sample_weighted",
    oracle=f"""
    WITH w AS (
      -- n_chars through a registered pandas frame is DOUBLE (float64
      -- from NULLs), and DuckDB's // only FLOOR-divides integral
      -- types — cast before any division, as everywhere else
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
             SUM(CAST(n_chars AS BIGINT)) OVER (
               PARTITION BY lang
               ORDER BY doc_id ASC NULLS LAST
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, lang, n_chars,
           CAST(cum // {_PPS_STEP} - (cum - n_chars) // {_PPS_STEP}
                AS BIGINT) AS picks
    FROM w
    WHERE cum // {_PPS_STEP} > (cum - n_chars) // {_PPS_STEP}
    """,
    tags=("text", "sampling", "window"),
)
def text_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size systematic sampling: lay each
    language's documents head-to-tail in doc_id order along a
    character axis and take one sampling point every _PPS_STEP
    characters — a document is drawn iff its span covers a point, so
    inclusion probability is proportional to its length (the PPS
    design data-mixing recipes weight corpora by), and a doc longer
    than the step can be drawn multiple times (``picks`` carries the
    multiplicity, the with-replacement convention). Deterministic and
    exact: the running sum and the floor-divided point counts are
    pure integer arithmetic, so both engines select the identical
    set. Zero/NULL-length docs are outside the design by contract
    (n_chars > 0 on both sides).

    Scale shape: mirrors text_pack_sequences — ONE exchange on lang,
    then a linear per-partition running sum; never a global
    single-partition sort. Per-lang totals need not be known up
    front (the step is fixed), which is what makes this a one-pass
    streaming-friendly design compared to Poisson/A-ES sampling."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("doc_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", "n_chars")
        .withColumn("__cum", F.sum("n_chars").over(w))
    )
    picks = F.expr(f"__cum div {_PPS_STEP}") - F.expr(
        f"(__cum - n_chars) div {_PPS_STEP}"
    )
    return (
        runs.withColumn("picks", picks.cast("bigint"))
        .filter(F.col("picks") > 0)
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            "picks",
        )
    )


# ---------------------------------------------------------------------------
# vocabulary coverage
# ---------------------------------------------------------------------------

@register(
    "text_vocab_coverage",
    oracle="""
    WITH words AS (
      SELECT lang, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE text IS NOT NULL),
    counts AS (
      SELECT lang, w, COUNT(*) AS c FROM words GROUP BY lang, w),
    ranked AS (
      SELECT lang, c,
             SUM(c) OVER (PARTITION BY lang ORDER BY c DESC, w ASC
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY lang) AS tot
      FROM counts)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(c) AS BIGINT) AS total_tokens,
           CAST(1 + SUM(CASE WHEN cum * 2 < tot THEN 1 ELSE 0 END)
                AS BIGINT) AS words_50pct,
           CAST(1 + SUM(CASE WHEN cum * 10 < tot * 9 THEN 1 ELSE 0 END)
                AS BIGINT) AS words_90pct
    FROM ranked
    GROUP BY lang
    """,
    tags=("text", "vocab", "coverage"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve per language: distinct word count,
    total occurrences, and how many of the most frequent words cover
    50% / 90% of all occurrences — the tokenizer-budget question
    (how large must a vocab be before coverage flattens) asked of a
    pre-training corpus. "Smallest prefix covering p" is computed as
    1 + |{ranks whose CUMULATIVE count is still < p*total}|, all in
    integer arithmetic (cum*2 < tot, cum*10 < tot*9 — no ratio ever
    crosses the engine boundary); ties in frequency break
    lexicographically, so the prefix is a total order both engines
    agree on.

    Scale shape: (lang, word) counts map-side combine on the explode
    (the only pass over raw text); the window + final aggregate run
    over the already-aggregated VOCABULARY (tiny by comparison),
    partitioned by lang — one exchange for the counts, one lang
    exchange for the window, aggregate reuses the window partitioning.
    """
    from pyspark.sql import Window

    docs = load_tables(spark, sf_dir)["documents"]
    counts = (
        docs.filter(F.col("text").isNotNull())
        .select("lang", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("lang")
    ranked = counts.select(
        "lang",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_tot).alias("tot"),
    )
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum("c").cast("long").alias("total_tokens"),
        (
            F.lit(1)
            + F.sum((F.col("cum") * 2 < F.col("tot")).cast("int"))
        )
        .cast("long")
        .alias("words_50pct"),
        (
            F.lit(1)
            + F.sum((F.col("cum") * 10 < F.col("tot") * 9).cast("int"))
        )
        .cast("long")
        .alias("words_90pct"),
    )


# ---------------------------------------------------------------------------
# token-rarity quality score (libm-free integer surprisal)
# ---------------------------------------------------------------------------


@register(
    "text_rarity_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
      FROM documents WHERE text IS NOT NULL),
    cnts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM cnts),
    sc AS (
      SELECT t.doc_id,
             length(bin(n_total)) - length(bin(cnt)) AS ibits
      FROM tok t JOIN cnts USING (token) CROSS JOIN tot)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           {round4_frac_sql("CAST(SUM(ibits) AS BIGINT)", "COUNT(*)", "//")}
             AS rarity_bits
    FROM sc GROUP BY doc_id
    """,
    tags=("text", "quality", "rarity"),
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean token rarity per document in WHOLE BITS of unigram
    surprisal — floor(log2(N_total)) − floor(log2(count(token))) per
    occurrence, averaged over the doc — the libm-free integer stand-in
    for a unigram-LM perplexity quality score (rare-vocabulary docs
    score high, boilerplate scores low). floor(log2(x)) is computed as
    ``length(bin(x)) − 1`` (binary-string length, identical on both
    engines) — no transcendental call whose last-ulp could differ
    across libm builds, the same discipline as text_tfidf_topterms'
    rational idf.

    Scale: ONE exploded corpus pass — the per-token occurrence count
    rides an UNORDERED count window over the token partitioning of the
    occurrence stream itself, not a groupBy-then-join-back (Spark
    plans each reference to the exploded subtree as its own
    scan+explode, so the join-back form executed the corpus pass
    THREE times: the counts branch, the totals branch derived from it,
    and the join's probe side — measured in this round's plan audit;
    the window costs the same token exchange the join would have, and
    hot boilerplate tokens stream through it exactly as they did the
    count aggregate). The corpus total is a broadcast one-row
    token-count aggregate off a plain UN-exploded documents scan
    (sum of per-doc sizes — the identical integer), then one doc
    rollup. Plan-pinned: ONE Generate, two corpus scans (exploded +
    plain-count)."""
    docs = load_tables(spark, sf_dir)["documents"]
    from pyspark.sql import Window

    tok = (
        scale_out(docs)
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )
    occ = tok.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("token"))
    )
    tot = (
        docs.filter(F.col("text").isNotNull())
        .agg(
            F.sum(F.size(F.split("text", " ")))
            .cast("long")
            .alias("n_total")
        )
    )
    sc = (
        occ.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            (F.length(F.bin("n_total")) - F.length(F.bin("cnt"))).alias("ibits"),
        )
    )
    return sc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.expr(
            round4_frac_sql("CAST(SUM(ibits) AS BIGINT)", "COUNT(*)", "div")
        ).alias("rarity_bits"),
    )
