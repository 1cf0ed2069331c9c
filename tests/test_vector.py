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


def test_zero_norm_vectors_score_zero_not_crash(spark):
    """Under ANSI mode (Spark 4 default) a bare dot/sqrt(na*nb) throws
    DIVIDE_BY_ZERO on an all-zero embedding, killing the whole query.
    Both cosine paths define the convention cos(x, 0) = 0.0 instead —
    a zero vector is never anyone's neighbor. Regression for both the
    expression path (_cos) and the Arrow-vectorized twin."""
    from mypipe_spark.plans.similarity import _cos
    from mypipe_spark.functions.vector import QSCALE

    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.6, 0.8])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = df.select(
        "vec_id",
        F.expr(f"transform(embedding, x -> CAST(ROUND(x * {QSCALE}) AS BIGINT))").alias("qv"),
    ).withColumn(
        "nrm2", F.expr("aggregate(qv, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)")
    )
    qvec = [1.0, 0.0]
    qq = q.sparkSession.createDataFrame(
        [(list(int(round(x * QSCALE)) for x in qvec),)], "qqv array<bigint>"
    ).withColumn("qn", F.expr("aggregate(qqv, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
    scored = {
        r["vec_id"]: r["c"]
        for r in q.crossJoin(qq).withColumn("c", _cos("qv", "nrm2", "qqv", "qn")).collect()
    }
    assert scored[1] == 1.0 and scored[2] == 0.0 and abs(scored[3] - 0.6) < 1e-9

    arrow = {
        r["vec_id"]: r["cos_raw"]
        for r in cosine_scores_vectorized(df, qvec, emb_col="embedding").collect()
    }
    assert arrow == scored  # bit-equal, including the zero-norm row

    # a zero QUERY vector scores everyone 0.0 in both paths
    zq = cosine_scores_vectorized(df, [0.0, 0.0], emb_col="embedding")
    assert {r["cos_raw"] for r in zq.collect()} == {0.0}
