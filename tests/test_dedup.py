from __future__ import annotations

from pyspark.sql import functions as F

from mypipe_spark.plans.catalog import all_queries

_Q = all_queries()


def test_exact_dedup_counts(spark, sf_dir):
    out = _Q["dedup_exact"].fn(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert out.count() == docs.select("text").distinct().count()
    assert out.agg(F.sum("n_copies")).collect()[0][0] == docs.count()


def test_minhash_lsh_high_recall_vs_exact(spark, sf_dir):
    """LSH candidates must recover (nearly) all true near-dup pairs:
    with 4 bands of 4 the detection probability at jaccard 0.5 is
    ~0.23 per doc pair *per band structure*, but our corpus pairs sit
    well above threshold — require >=90% recall of the exact pairs."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in _Q["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in _Q["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    assert lsh <= exact  # candidates are verified with true jaccard
    if exact:
        assert len(lsh) / len(exact) >= 0.9


def test_simhash_recall_vs_exact_jaccard(spark, sf_dir):
    """SimHash (hamming<=3 over 32 bits) must recover most strong
    near-dups found by exact jaccard, and its pairs must be plausible
    (every simhash pair shares at least one shingle-set overlap)."""
    exact_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _Q["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    sim_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in _Q["dedup_simhash"].fn(spark, sf_dir).collect()
    }
    strong = {p for p, j in exact_pairs.items() if j >= 0.8}
    if strong:
        recall = len(strong & sim_pairs) / len(strong)
        assert recall >= 0.8
    # precision proxy: simhash pairs overlap the exact near-dup set
    if sim_pairs:
        assert len(sim_pairs & set(exact_pairs)) / len(sim_pairs) >= 0.5


def test_embedding_neardup_within_cells_only(spark, sf_dir):
    out = _Q["dedup_embedding_cosine"].fn(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in out.collect():
        assert labels[r["vec_a"]] == labels[r["vec_b"]]
        assert 0.4 <= r["cosine"] <= 1.0


def test_ann_ivf_structure_and_recall(spark, sf_dir):
    """IVF with nprobe=2 of 10 cells. The fixture's labels are weak
    clusters (max within-cell cosine ~0.5), so recall@10 vs brute
    force is bounded by how much of the true top-10 lands in 2 cells —
    assert the structural contract (results from ≤ nprobe cells,
    scores agree with brute force where they overlap) plus non-trivial
    recall."""
    brute = {r["vec_id"]: r["cosine"] for r in _Q["ann_topk_bruteforce"].fn(spark, sf_dir).collect()}
    ivf_rows = _Q["ann_topk_ivf"].fn(spark, sf_dir).collect()
    assert len(ivf_rows) == 10
    assert len({r["label"] for r in ivf_rows}) <= 2  # nprobe cells only
    overlap = [r for r in ivf_rows if r["vec_id"] in brute]
    assert overlap, "IVF found none of the true top-10"
    for r in overlap:  # scores are the same exact arithmetic
        assert r["cosine"] == brute[r["vec_id"]]
