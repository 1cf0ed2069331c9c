"""Edge-case and equivalence tests for the round-2 operators:
posting-list pair emission vs the classic self-join (the rewrite must
be a pure topology change), packing invariants under straddling
documents, and reservoir stratum bounds."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_posting_list_pairs_equal_classic_self_join(spark, sf_dir):
    """jaccard_pairs_from emits candidate pairs from sorted posting
    arrays; the classic two-sided self-join must yield the SAME pair
    multiset (per-shingle) — the rewrite changes shuffle topology,
    never semantics."""
    from mypipe_spark.plans.dedup import _with_shingle_arrays, jaccard_pairs_from

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = sorted(
        map(tuple, jaccard_pairs_from(docs).select("doc_a", "doc_b", "jaccard").collect())
    )
    sh = _with_shingle_arrays(docs).select(
        "doc_id", "n_sh", F.explode("hsh").alias("shingle")
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                 F.col("a.n_sh").alias("na"), F.col("b.n_sh").alias("nb"))
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    # display rounding via the same exact-integer helper as the engine
    # path — F.round over the double quotient banker's-rounds the
    # binary value and can disagree at .5-boundary rationals, which
    # would fail this equivalence test spuriously on a corpus change
    from mypipe_spark.plans.catalog import round4_frac_sql

    old = sorted(
        map(tuple, inter.filter(jac >= 0.5)
            .select(
                "doc_a",
                "doc_b",
                F.expr(
                    round4_frac_sql("n_common", "na + nb - n_common", "div")
                ).alias("jaccard"),
            )
            .collect())
    )
    assert new == old and len(new) > 0


def test_pack_sequences_invariants_with_straddlers(spark):
    """Crafted corpus with a doc far larger than the budget: every doc
    gets exactly one (seq_id, offset); offsets are < budget; within a
    stratum, consecutive docs satisfy next_start = start + n_tokens
    (head-to-tail layout, no gaps, no overlaps)."""
    from mypipe_spark.plans import textops as T

    budget = T._PACK_BUDGET
    rows = [
        # (doc_id, lang, n_words) - text built to match
        (1, "aa", 10), (2, "aa", budget * 2 + 5), (3, "aa", 1),
        (4, "bb", budget - 1), (5, "bb", 2),
    ]
    docs = spark.createDataFrame(
        [(i, lang, " ".join(["w"] * n)) for i, lang, n in rows],
        "doc_id long, lang string, text string",
    )
    docs.createOrReplaceTempView("documents")
    # reuse the registered plan body against a temp-view catalog
    w = (
        Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tokens = F.size(F.split("text", " "))
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    out = (
        docs.select("doc_id", "lang", n_tokens.alias("n_tokens"))
        .withColumn("start", start)
        .select(
            "doc_id", "lang", "n_tokens", "start",
            F.expr(f"start div {budget}").alias("seq_id"),
            (F.col("start") % budget).alias("seq_offset"),
        )
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert len(got) == len(rows)
    for r in out:
        assert 0 <= r["seq_offset"] < budget
        assert r["seq_id"] == r["start"] // budget
    # head-to-tail within stratum
    by_lang: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["lang"], r["doc_id"])):
        by_lang.setdefault(r["lang"], []).append(r)
    for rs in by_lang.values():
        assert rs[0]["start"] == 0
        for prev, nxt in zip(rs, rs[1:]):
            assert nxt["start"] == prev["start"] + prev["n_tokens"]


def test_reservoir_keeps_exactly_k_or_all(spark):
    """Strata smaller than k keep everything; larger strata keep
    exactly k — and re-running selects the same documents."""
    from mypipe_spark.plans import textops as T

    k = T._RESERVOIR_K
    docs = spark.createDataFrame(
        [(i, "big" if i < 500 else "tiny", "x") for i in range(510)],
        "doc_id long, lang string, text string",
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    pick = (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "lang")
    )
    first = sorted(map(tuple, pick.collect()))
    again = sorted(map(tuple, pick.collect()))
    assert first == again
    counts = {r["lang"]: r["n"] for r in
              pick.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": k, "tiny": 10}


def test_repetition_score_flags_planted_loops(spark):
    """text_repetition_score on planted documents: a boilerplate loop
    (one bigram dominating) drops, ordinary prose keeps, the
    degenerate one-word doc keeps with zero fractions, and the
    duplicate-word fraction is the exact multiset excess."""
    from pyspark.sql import functions as F

    from mypipe_spark.plans import textops  # registration side effects  # noqa: F401
    from mypipe_spark.plans.catalog import QUERIES, load_tables

    rows = [
        (1, "spam eggs " * 30),              # 'eggs spam'/'spam eggs' loops
        (2, "the quick brown fox jumps over a lazy dog near the bank"),
        (3, "single"),
    ]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id int, text string"
    )
    # run the registered builder against the planted docs by swapping
    # the table through a temp view-compatible path: call the inner
    # logic via the same expressions (builder reads load_tables, so
    # drive the expression path directly instead)
    fn = QUERIES["text_repetition_score"].fn
    import mypipe_spark.plans.catalog as C

    real = C.load_tables
    try:
        C.load_tables = lambda spark, sf_dir: {"documents": docs}
        textops.load_tables = C.load_tables
        out = {r["doc_id"]: r for r in fn(spark, "ignored").collect()}
    finally:
        C.load_tables = real
        textops.load_tables = real
    assert out[1]["keep"] == 0 and out[1]["top_bigram_frac"] > 0.4
    assert out[2]["keep"] == 1 and out[2]["dup_word_frac"] < 0.2
    assert out[3]["keep"] == 1 and out[3]["top_bigram_frac"] == 0.0
    # exact multiset excess: 60 words, 2 distinct -> 58/60
    assert abs(out[1]["dup_word_frac"] - round(58 / 60, 4)) < 1e-9
