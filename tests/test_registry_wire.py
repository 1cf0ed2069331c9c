from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from mypipe_spark.changelog import changelog_df
from mypipe_spark.model import MUTATION_MAGIC, generic_subject
from mypipe_spark.operators.decode import mutations_only
from mypipe_spark.registry import SchemaRegistry, in_memory_repo, register_table
from mypipe_spark.sinks.wire import decode_generic, encode_generic, specific_projection


def test_registry_versioning_and_flush():
    reg = SchemaRegistry()
    s = "subj"
    id1 = reg.register(s, "schema-v1")
    id2 = reg.register(s, "schema-v2")
    assert (id1, id2) == (1, 2)
    # idempotent re-register returns the same id
    assert reg.register(s, "schema-v1") == 1
    assert reg.get_schema(s, 1) == "schema-v1"
    assert reg.get_schema_id(s, "schema-v2") == 2
    # latest-wins with cache flush (AvroSchemaSpec.scala:82-94 analog)
    assert reg.get_latest(s) == (2, "schema-v2")
    reg.register(s, "schema-v3")
    assert reg.get_latest(s, flush_cache=True) == (3, "schema-v3")
    assert reg.versions(s) == [1, 2, 3]
    assert reg.get_latest("missing") is None
    assert reg.get_schema(s, 99) is None


def test_in_memory_repo_preseeded():
    reg = in_memory_repo()
    for mtype in ("insert", "update", "delete"):
        assert reg.get_latest(generic_subject(mtype)) is not None


def test_register_table_subjects():
    reg = SchemaRegistry()
    schema = StructType([StructField("id", IntegerType()), StructField("u", StringType())])
    ids = register_table(reg, "mypipe", "user", schema)
    assert set(ids) == {"mypipe_user_insert", "mypipe_user_update", "mypipe_user_delete"}
    assert all(v == 1 for v in ids.values())


@pytest.fixture(params=["in_memory", "rest"])
def wire_repo(request):
    """The encode path duck-types over the repo — run the round-trip
    once against the in-memory registry and once against a LIVE
    RestSchemaRegistry over a loopback serve_registry, so the REST
    client drives real encoding the way the reference serializer talks
    to its remote schema repo (KafkaAvroSerializer.scala:41-67)."""
    if request.param == "in_memory":
        yield in_memory_repo()
        return
    import threading

    from mypipe_spark.registry import RestSchemaRegistry, serve_registry

    server, url = serve_registry(in_memory_repo())
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield RestSchemaRegistry(url)
    finally:
        server.shutdown()


def test_wire_roundtrip(spark, wire_repo):
    reg = wire_repo
    df = mutations_only(changelog_df(spark, num_transactions=15))
    encoded = encode_generic(df, reg)

    # framing: header bytes are exactly [0x0][mtype][short BE]
    first = encoded.filter(F.col("op") == "update").select("value").limit(1).collect()[0][0]
    assert first[0] == 0x0
    assert first[1] == MUTATION_MAGIC["update"]
    schema_id = int.from_bytes(first[2:4], "big")
    assert schema_id == reg.get_latest(generic_subject("update"))[0]

    decoded = decode_generic(encoded.select("value"))
    assert decoded.filter(~F.col("magic_ok")).count() == 0
    # ops survive the mtype round-trip
    n_by_op = {r["op"]: r["n"] for r in decoded.groupBy("op").agg(F.count("*").alias("n")).collect()}
    orig = {r["op"]: r["n"] for r in df.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert n_by_op == orig
    # payload fields survive, including binary map values (base64 in JSON)
    one = (
        decoded.filter(F.col("op") == "insert")
        .select("payload.database", "payload.table", "payload.integers", "payload.bytes")
        .limit(1)
        .collect()[0]
    )
    assert one["database"] == "mypipe" and one["table"] == "user"
    assert "id" in one["integers"]
    assert bytes(one["bytes"]["bio"]).startswith(b"bio")


def test_specific_projection(spark):
    df = mutations_only(changelog_df(spark, num_transactions=10))
    user_schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("username", StringType()),
            StructField("login_count", IntegerType()),
        ]
    )
    out = specific_projection(df.filter(F.col("op") == "insert"), user_schema)
    row = out.limit(1).collect()[0]
    assert row["username"].startswith("username")
    assert isinstance(row["id"], int) and row["login_count"] == 0
    # before-image projection for deletes
    deletes = df.filter(F.col("op") == "delete")
    if deletes.count():
        row = specific_projection(deletes, user_schema, image="old").limit(1).collect()[0]
        assert row["id"] is not None


def test_avro_codec_gated_by_functional_probe(spark):
    """pyspark always ships the Python wrapper for to_avro, so import
    success must NOT be trusted — availability is a functional probe.
    When the spark-avro jar is absent the avro codec raises the clear
    gate error instead of failing deep inside the plan; when present,
    the avro payload must round-trip the same envelope as JSON."""
    from mypipe_spark.registry import in_memory_repo
    from mypipe_spark.sinks.wire import (
        avro_available,
        decode_generic,
        encode_generic,
    )

    df = mutations_only(changelog_df(spark, num_transactions=5))
    reg = in_memory_repo()
    if not avro_available(spark):
        with pytest.raises(RuntimeError, match="spark-avro jar"):
            encode_generic(df, reg, codec="avro").collect()
        return
    # jar present: full round-trip parity with the JSON codec
    encoded = encode_generic(df, reg, codec="avro")
    decoded = decode_generic(encoded.select("value"), codec="avro")
    assert decoded.filter(~F.col("magic_ok")).count() == 0
    got = {
        r["op"]: r["n"]
        for r in decoded.groupBy("op").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r["op"]: r["n"]
        for r in df.groupBy("op").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_short_be_rejects_out_of_range_ids(spark):
    """An id outside [0, 0xFFFF] must fail loudly at execution — never
    silently truncate into a corrupted wire header."""
    from mypipe_spark.sinks.wire import _short_be

    ok = spark.range(1).select(_short_be(F.lit(0xFFFF)).alias("b")).collect()
    assert ok[0]["b"] == b"\xff\xff"
    for bad in (0x10000, -1):
        with pytest.raises(Exception, match="schema id out of 2-byte range"):
            spark.range(1).select(_short_be(F.lit(bad)).alias("b")).collect()


def test_parse_bytes_size_suffixes():
    """scale_out must survive legal Spark size strings like '128m'."""
    from mypipe_spark.plans.catalog import _parse_bytes

    assert _parse_bytes("134217728b") == 128 << 20
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("512k") == 512 << 10
    assert _parse_bytes("junk") == 134217728  # falls back, never raises
    assert _parse_bytes("64") == 64


def test_registry_id_overflow():
    # simulate a subject at the Short ceiling
    from mypipe_spark.registry import _Subject

    reg = SchemaRegistry()
    sub = _Subject()
    sub.latest_id = SchemaRegistry.MAX_ID
    reg._store["s"] = sub
    with pytest.raises(OverflowError):
        reg.register("s", "one-too-many")


def test_registry_save_load_roundtrip(tmp_path):
    from mypipe_spark.registry import load_registry, save_registry

    reg = SchemaRegistry()
    reg.register("a", "s1")
    reg.register("a", "s2")
    reg.register("b", "x1")
    path = str(tmp_path / "reg.json")
    save_registry(reg, path)
    back = load_registry(path)
    assert back.subjects() == ["a", "b"]
    assert back.get_latest("a") == (2, "s2")
    assert back.get_schema("a", 1) == "s1"
    assert back.versions("b") == [1]
