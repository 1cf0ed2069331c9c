"""Vectorized embedding kernels (Arrow/Pandas UDF path).

The expression-based cosine in plans.dedup/plans.similarity
(``aggregate(zip_with(...))``) is pure JVM but evaluates element-wise
per row. For wide embeddings or big batches the faster shape is one
numpy matmul per Arrow batch — this module provides that kernel with
EXACTLY the same quantized-integer arithmetic (round(x*1e4) → int64;
integer dots/norms; one final double op), so results are bit-identical
to the expression path and share its DuckDB oracle.

This is the pattern the guide calls out: when Python is unavoidable
(or profitable), Arrow-batched and columnar — never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QSCALE = 10_000


def _quantize_batch(embs: pd.Series) -> np.ndarray:
    """(batch, dim) int64 matrix with round-half-away-from-zero —
    matching Spark's ROUND(double) and DuckDB's ROUND semantics
    (np.round alone is banker's rounding, which would diverge)."""
    m = np.stack(embs.to_numpy()).astype(np.float64) * QSCALE
    return (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64)


def cosine_scores_vectorized(
    df: DataFrame,
    query_vec: list[float],
    emb_col: str = "embedding",
) -> DataFrame:
    """Append ``cos_raw`` (double) — cosine of each row's embedding
    against one query vector, computed as a single int64 matrix-vector
    product per Arrow batch. mapInPandas keeps all other columns."""
    q = np.asarray(query_vec, dtype=np.float64) * QSCALE
    q = (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int64)
    qn_sq = float(q @ q)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", cos_raw double"

    dim = len(q)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # mask NULL/ragged embeddings BEFORE stacking: np.stack on
            # a None or off-dimension row would kill the whole query,
            # where the expression twin (plans/similarity._cos) yields
            # a NULL dot → 0.0 for that row and completes — the two
            # plans are advertised as interchangeable (round-8
            # review). Bad rows score 0.0, same as the zero-norm
            # convention.
            embs = pdf[emb_col].to_numpy()
            good = np.array(
                [e is not None and len(e) == dim for e in embs], dtype=bool
            )
            pdf = pdf.copy()
            if not good.any():
                pdf["cos_raw"] = 0.0
                yield pdf
                continue
            m = _quantize_batch(pd.Series(embs[good]))
            dots = np.zeros(len(embs), dtype=np.float64)
            norms_sq = np.zeros(len(embs), dtype=np.float64)
            dots[good] = (m @ q).astype(np.float64)
            norms_sq[good] = (m * m).sum(axis=1).astype(np.float64)
            # Denominator as sqrt(na*nb) — one sqrt over the exact
            # integer product, matching the expression path and the
            # DuckDB oracle bit-for-bit; sqrt(a)*sqrt(b) can differ in
            # the last ulp and flip a ROUND boundary or top-k tie.
            # Zero-norm mask mirrors the expression path's convention
            # (plans/similarity._cos): cosine vs an all-zero vector is
            # 0.0, not a division error / NaN.
            nprod = norms_sq * qn_sq
            with np.errstate(divide="ignore", invalid="ignore"):
                raw = dots.astype(np.float64) / np.sqrt(nprod)
            pdf["cos_raw"] = np.where(nprod > 0, raw, 0.0)
            yield pdf

    return df.mapInPandas(score, out_schema)
