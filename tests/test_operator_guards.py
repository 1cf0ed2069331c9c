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


def test_with_topic_identifier_placeholders_are_columns_not_sql(spark):
    """ADVICE r10: a plain-identifier placeholder resolves via F.col,
    never F.expr — a column named like a SQL keyword or function
    cannot be parsed as SQL, and `${`my-col`}` (backticked) reaches a
    non-identifier column name instead of parsing as `my - col`."""
    from mypipe_spark.operators.filters import with_topic

    # 'table' and 'current_date' are keyword/function-shaped names —
    # F.expr would mis-parse or shadow them; F.col must not
    df = spark.createDataFrame(
        [("db1", "t1", "cd")], "database string, table string, current_date string"
    )
    out = with_topic(df, "${database}_${table}_${current_date}")
    assert out.collect()[0]["topic"] == "db1_t1_cd"
    # backticked placeholder targets a dashed column as a column ref
    df2 = spark.createDataFrame(
        [("x", 1, 2)], "`my-col` string, my long, col long"
    )
    out2 = with_topic(df2, "pre_${`my-col`}")
    assert out2.collect()[0]["topic"] == "pre_x"
    # backticks pass through to F.col, so a DOTTED column name stays a
    # single column instead of parsing as nested-field access
    df3 = spark.createDataFrame([("y",)], "`my.col` string")
    assert with_topic(df3, "p_${`my.col`}").collect()[0]["topic"] == "p_y"
    # SQL literals keep their pre-round-11 expression semantics
    assert with_topic(df, "v${123}").collect()[0]["topic"] == "v123"
    assert with_topic(df, "f_${true}").collect()[0]["topic"] == "f_true"
    # function-bearing placeholders still execute as SQL
    out3 = with_topic(df, "${concat(database, '_', table)}")
    assert out3.collect()[0]["topic"] == "db1_t1"


def test_mg_summary_refuses_float_columns_unless_opted_in(spark):
    """Round-11 (VERDICT r10 ask #4): on the pandas path float dtype
    uses NaN as the missing marker, so SQL NULLs and genuine NaN data
    values merge into one item and the deficit bound holds only for
    the merged item — refuse float/double summarized columns up front
    (like the module's reserved-name fences) with allow_float as the
    explicit escape hatch."""
    import pytest
    from pyspark.sql import functions as F

    from mypipe_spark.operators.heavyhitters import (
        mg_merge_summaries,
        mg_summary,
    )

    df = spark.range(20).withColumn("score", F.col("id").cast("double"))
    with pytest.raises(ValueError, match="allow_float"):
        mg_summary(df, "score", 4)
    with pytest.raises(ValueError, match="allow_float"):
        mg_merge_summaries(
            df.withColumn("cnt", F.lit(1).cast("long")), "score", 4
        )
    # the escape hatch works, and the merged NULL+NaN item is the
    # documented semantics: NULL and NaN inputs land on ONE counter
    nan_df = spark.createDataFrame(
        [(1.5,), (1.5,), (float("nan"),), (None,)], "score double"
    )
    got = {
        r["score"]: r["cnt"]
        for r in mg_summary(nan_df, "score", 4, allow_float=True).collect()
    }
    assert got[1.5] == 2
    assert got[None] == 2  # NULL + NaN merged, per the disclosure
    # integer/string columns stay unaffected (a heavy item — 6 of 10
    # rows — must survive, per the deficit bound)
    skew = spark.range(10).withColumn(
        "bucket", F.when(F.col("id") < 6, F.lit(0)).otherwise(F.col("id"))
    )
    got = {r["bucket"]: r["cnt"] for r in mg_summary(skew, "bucket", 4).collect()}
    assert got.get(0, 0) > 0
