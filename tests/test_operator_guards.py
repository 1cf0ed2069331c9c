"""Round-10 operators/ review pins: namespace fences, fail-fast
validation, corrupt-input guards, and NULL rendering."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_salted_join_fences_its_salt_column(spark):
    """withColumn would silently OVERWRITE a caller column named
    __salt and drop it from the output — corruption plus column loss;
    the fence refuses up front like every sibling operator."""
    from mypipe_spark.operators.scale import salted_join

    a = spark.range(4).withColumn("__salt", F.lit("real data"))
    b = spark.range(4)
    with pytest.raises(ValueError, match="__salt"):
        salted_join(a, b, on="id")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(b, a, on="id")


def test_exact_ntile_rejects_nonpositive_k(spark):
    """k=0 previously died mid-job on ANSI DIVIDE_BY_ZERO after the
    boundary sketch already ran; k<0 silently emitted wrong buckets.
    Window ntile fails fast at analysis — so does this now."""
    from mypipe_spark.operators.scale import exact_ntile

    df = spark.range(10).withColumn("v", F.col("id") * 2)
    for bad_k in (0, -5):
        with pytest.raises(ValueError, match="ntile k"):
            exact_ntile(df, bad_k, ["v", "id"])


def test_mg_summary_reserves_grouping_column_name(spark):
    """A summarized column named __mg_g would duplicate the merge's
    grouping label in the pandas frame and zip would iterate LABELS —
    silently garbage output; refused up front like 'cnt'."""
    from mypipe_spark.operators.heavyhitters import mg_summary

    df = spark.range(10).withColumnRenamed("id", "__mg_g")
    with pytest.raises(ValueError, match="__mg_g"):
        mg_summary(df, "__mg_g", 4)
    with pytest.raises(ValueError, match="cnt"):
        mg_summary(df.withColumnRenamed("__mg_g", "cnt"), "cnt", 4)


def test_range_join_survives_inverted_and_null_intervals(spark):
    """One corrupt row with end < start must not explode into a huge
    DESCENDING bucket sequence (Spark's sequence(a, b) auto-steps -1)
    — the row is provably joinless under ts >= start AND ts < end, so
    it is filtered before bucketing, mirroring intervals.py's CASE
    guard."""
    from mypipe_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "uid int, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", "2024-01-01 11:00:00", "good"),
            (1, "2024-01-01 09:00:00", "1970-01-01 00:00:00", "inverted"),
            (1, None, "2024-01-01 11:00:00", "null_start"),
        ],
        "uid2 int, w_start string, w_end string, tag string",
    ).select(
        "uid2",
        F.col("w_start").cast("timestamp").alias("w_start"),
        F.col("w_end").cast("timestamp").alias("w_end"),
        "tag",
    )
    out = range_join(
        left.withColumnRenamed("uid", "uid2"),
        right,
        on="uid2",
        left_ts="ts",
        right_start="w_start",
        right_end="w_end",
        bucket_seconds=3600,
    )
    assert [r["tag"] for r in out.collect()] == ["good"]


def test_render_sql_keeps_null_valued_columns(spark):
    """A NULL map value must render as unquoted SQL NULL, not vanish
    from the SET/WHERE clause (plain concat NULLed the element and
    array_join silently dropped it)."""
    from mypipe_spark.changelog import changelog_df
    from mypipe_spark.operators.filters import render_sql

    ev = (
        changelog_df(spark, num_transactions=2)
        .filter(F.col("op") == "insert")
        .limit(1)
        .withColumn(
            "new_strings",
            F.expr("map('a', CAST(NULL AS STRING), 'b', 'x')"),
        )
    )
    sql = render_sql(ev).select("sql_text").collect()[0]["sql_text"]
    assert "a=NULL" in sql and "b='x'" in sql


def test_with_topic_supports_sql_functions_in_placeholders(spark):
    """${upper(database)} is a documented template form; the old
    \\w+-only pattern silently emitted it as literal text."""
    from mypipe_spark.operators.filters import with_topic

    df = spark.createDataFrame(
        [("mydb", "t1")], "database string, table string"
    )
    out = with_topic(df, "${upper(database)}_${table}")
    assert out.collect()[0]["topic"] == "MYDB_t1"
