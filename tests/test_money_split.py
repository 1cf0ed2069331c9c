"""Round-11 pins: the long-split micro-unit money sums must be
bit-identical to the DECIMAL(38,6) forms they replaced (catalog.py
round-11 block), including the edge classes a groupBy can produce —
negatives, NULL rows, all-NULL groups, and .5-boundary rounding."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mypipe_spark.plans.catalog import (
    MICRO_SPLIT_MASK,
    MICRO_SPLIT_SHIFT,
    micro_long_col,
    micro_split_sum_cols,
    micro_split_total_col,
    micro_sum_spark_sql,
    money_sum_col,
)

ROWS = [
    # (group, value) — negatives, exact .5 display boundaries, NULLs
    ("a", 1.005),
    ("a", -2.5),
    ("a", 0.0000004),
    ("a", None),
    ("b", -0.005),
    ("b", 1234567.891234),
    ("c", None),  # all-NULL group must stay NULL
    ("d", 17954.55),
    ("d", 0.125),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        ROWS, "g string, v double"
    )


def test_money_sum_col_matches_decimal_form(frame):
    dec = frame.groupBy("g").agg(
        F.round(F.sum(F.col("v").cast("decimal(38,6)")), 2)
        .cast("double")
        .alias("m")
    )
    new = frame.groupBy("g").agg(money_sum_col(F.col("v"), "m"))
    assert sorted(map(tuple, dec.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_micro_split_identity_for_negative_values(frame):
    """hi·2²⁰ + lo == Σmicro exactly for either sign (arithmetic shift
    floors, the masked low bits are non-negative — the identity the
    split rests on)."""
    micro = micro_long_col(F.col("v"))
    hi, lo = micro_split_sum_cols(micro)
    both = frame.groupBy("g").agg(
        micro_split_total_col(hi, lo).alias("split_total"),
        F.sum(micro).cast("decimal(38,0)").alias("plain_total"),
    )
    for r in both.collect():
        assert r.split_total == r.plain_total, r


def test_micro_sum_spark_sql_matches_decimal_text_form(frame):
    from mypipe_spark.plans.catalog import micro_sum_sql

    frame.createOrReplaceTempView("money_split_probe")
    spark = frame.sparkSession
    a = spark.sql(
        f"SELECT g, CAST({micro_sum_sql('v')} AS DECIMAL(38,0)) AS s"
        " FROM money_split_probe GROUP BY g"
    )
    b = spark.sql(
        f"SELECT g, CAST({micro_sum_spark_sql('v')} AS DECIMAL(38,0)) AS s"
        " FROM money_split_probe GROUP BY g"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_split_constants_are_consistent():
    assert MICRO_SPLIT_MASK == (1 << MICRO_SPLIT_SHIFT) - 1
