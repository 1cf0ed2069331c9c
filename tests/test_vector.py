from __future__ import annotations

from pyspark.sql import functions as F

from mypipe_spark.functions.vector import cosine_scores_vectorized
from mypipe_spark.plans.catalog import all_queries

_Q = all_queries()


def test_pandas_ann_matches_expression_ann(spark, sf_dir):
    """The Arrow-vectorized kernel and the JVM expression path must be
    bit-identical (same quantized-integer arithmetic)."""
    expr_rows = _Q["ann_topk_bruteforce"].fn(spark, sf_dir).collect()
    pd_rows = _Q["ann_topk_pandas"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in expr_rows] == [tuple(r) for r in pd_rows]


def test_cosine_vectorized_self_similarity(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    scored = cosine_scores_vectorized(emb, list(q))
    self_row = scored.filter(F.col("vec_id") == 7).collect()[0]
    assert abs(self_row["cos_raw"] - 1.0) < 1e-9
