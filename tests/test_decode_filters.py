from __future__ import annotations

from pyspark.sql import functions as F

from mypipe_spark.changelog import changelog_df
from mypipe_spark.operators.decode import (
    classify_query,
    decode_query_events,
    mutations_only,
)
from mypipe_spark.operators.filters import (
    bytes_to_uuid,
    demux_by_type,
    include_events,
    primary_key_string,
    render_sql,
    uuid_to_bytes,
    with_topic,
)


def test_classify_query(spark):
    rows = [
        ("BEGIN",), ("begin",), ("COMMIT /* xid=7 */",), ("rollback",),
        ("ALTER TABLE mypipe.user ADD COLUMN email varchar(128)",),
        ("CREATE TABLE foo (x int)",), ("  Begin  ",),
    ]
    df = spark.createDataFrame(rows, "sql string")
    got = [r[0] for r in df.select(classify_query(F.col("sql"))).collect()]
    assert got == ["begin", "begin", "commit", "rollback", "alter", "unknown", "begin"]


def test_decode_query_events_alter_extraction(spark):
    rows = [
        (1, "unknown", "otherdb", None, "ALTER TABLE mypipe.user ADD COLUMN email varchar(128)"),
        (2, "unknown", "mypipe", None, "alter table `user` drop column email"),
        (3, "unknown", "mypipe", None, "ALTER IGNORE TABLE db2.t2 ADD x int"),
        (4, "unknown", "mypipe", "user", "BEGIN"),
    ]
    df = spark.createDataFrame(rows, "seq long, op string, database string, table string, sql string")
    out = {r["seq"]: r for r in decode_query_events(df).collect()}
    assert out[1]["op"] == "alter" and out[1]["database"] == "mypipe" and out[1]["table"] == "user"
    # unqualified ALTER falls back to the session database
    assert out[2]["database"] == "mypipe" and out[2]["table"] == "user"
    assert out[3]["database"] == "db2" and out[3]["table"] == "t2"
    assert out[4]["op"] == "begin" and out[4]["table"] == "user"


def test_include_events_and_demux(spark):
    df = changelog_df(spark, num_transactions=20)
    kept = include_events(df, "database = 'mypipe' AND op != 'update'")
    assert kept.filter(F.col("op") == "update").count() == 0
    # no-op condition keeps everything (F2)
    assert include_events(df, None).count() == df.count()

    parts = demux_by_type(mutations_only(df))
    total = sum(p.count() for p in parts.values())
    assert total == mutations_only(df).count()
    assert parts["insert"].filter(F.col("op") != "insert").count() == 0


def test_pk_string_and_topic(spark):
    df = changelog_df(spark, num_transactions=5)
    ins = mutations_only(df).filter(F.col("op") == "insert")
    row = ins.select(primary_key_string(["id"]).alias("pk")).limit(1).collect()[0]
    assert row["pk"].isdigit()
    # composite pk joins with '.'
    row2 = ins.select(primary_key_string(["id", "login_count"]).alias("pk")).limit(1).collect()[0]
    assert "." in row2["pk"]

    t = with_topic(ins).select("topic").limit(1).collect()[0][0]
    assert t == "mypipe_user_generic"
    t2 = with_topic(ins, "cdc.${database}.${table}").select("topic").limit(1).collect()[0][0]
    assert t2 == "cdc.mypipe.user"


def test_uuid_roundtrip(spark):
    df = spark.createDataFrame([("bdd640fb-0667-4ad1-9c80-317fa3b1799d",)], "u string")
    out = df.select(
        F.length(uuid_to_bytes(F.col("u"))).alias("n"),
        bytes_to_uuid(uuid_to_bytes(F.col("u"))).alias("back"),
    ).collect()[0]
    assert out["n"] == 16
    assert out["back"] == "bdd640fb-0667-4ad1-9c80-317fa3b1799d"


def test_render_sql(spark):
    df = changelog_df(spark, num_transactions=10)
    rendered = render_sql(mutations_only(df))
    ins = rendered.filter(F.col("op") == "insert").select("sql_text").limit(1).collect()[0][0]
    assert ins.startswith("INSERT INTO mypipe.user SET ")
    assert "username='username0'" in ins
    upd = rendered.filter(F.col("op") == "update").select("sql_text").limit(1).collect()[0][0]
    assert upd.startswith("UPDATE mypipe.user SET ") and " WHERE " in upd
    dele = rendered.filter(F.col("op") == "delete").select("sql_text").limit(1).collect()[0][0]
    assert dele.startswith("DELETE FROM mypipe.user WHERE ")


def test_render_sql_includes_bytes_bucket(spark):
    """BLOB/VAR_STRING columns land in the bytes maps; render_sql must
    print them (as hex) like the reference's stdout producer prints
    all four typed maps — previously a bytes-only table rendered an
    empty SET clause and UPDATE/DELETE an empty WHERE."""
    from mypipe_spark.operators.filters import render_sql
    from mypipe_spark.sources.snapshot import to_insert_mutations

    src = spark.createDataFrame([(b"\x01\xab",)], "payload binary")
    muts = to_insert_mutations(src, database="mypipe", table="blobs")
    (row,) = render_sql(muts).select("sql_text").collect()
    assert row[0] == "INSERT INTO mypipe.blobs SET payload='01AB'"


def test_primary_key_string_bytes_and_missing_components(spark):
    """Composite PKs must consult the bytes bucket (a VAR_STRING/BLOB
    component renders as hex) and never silently DROP a missing
    component — concat_ws skips NULLs, so ('a',1) and ('b',1) would
    both have collapsed to '1' and merged distinct rows onto one key."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, {"id": 7}, {"blob_key": bytearray(b"\x01\x02")}),
            (2, {"id": 7}, None),
        ],
        "row int, new_integers map<string,int>, new_bytes map<string,binary>",
    ).withColumn("new_longs", F.lit(None).cast("map<string,bigint>")) \
     .withColumn("new_strings", F.lit(None).cast("map<string,string>"))
    got = {
        r["row"]: r["pk"]
        for r in df.select(
            "row", primary_key_string(["id", "blob_key"]).alias("pk")
        ).collect()
    }
    assert got[1] == "7.0102"  # bytes component as hex
    assert got[2] == "7."  # missing component kept as empty, not dropped
