"""The Kafka wire twin (sources/kafka_shim.py): the REGISTERED kafka
producer and consumer configurations exercised end-to-end against the
file-backed ``kafkafile`` stand-in — framing, keying, offset/resume
semantics and the decode cascade, with byte-for-byte parity against
the batch encoder. Moves S14/K4 from "partial (no broker binary)" to
"tested against a wire twin"; the real connector stays the
production path (same option names, same record schema, format name
is the only switch)."""

from __future__ import annotations

import base64
import glob
import json
import os

from mypipe_spark.changelog import write_changelog
from mypipe_spark.operators.decode import mutations_only
from mypipe_spark.operators.filters import primary_key_string, with_topic
from mypipe_spark.registry import in_memory_repo
from mypipe_spark.sinks.wire import encode_generic
from mypipe_spark.sources.kafka_shim import register_kafka_file_shim
from mypipe_spark.sources.stream import changelog_batch, changelog_stream
from mypipe_spark.streaming.pipe import Pipe


def _produce_pipe(
    broker: str, src: str, ckpt: str, reg, partitions: int | None = None
) -> Pipe:
    """The registered kafka producer wiring, verbatim (topic + value +
    pk key columns -> producer 'kafka'), pointed at the stand-in.
    ``partitions`` opts the created topic into the twin's N-partition
    mode through the producer option, like a config would."""

    def _frame(df):
        from pyspark.sql import functions as F

        framed = with_topic(encode_generic(df, reg))
        # key by the image that CARRIES the pk: deletes only have the
        # old image (new_* maps are NULL there -> empty-string key)
        pk = F.when(
            F.col("op") == "delete", primary_key_string(["id"], image="old")
        ).otherwise(primary_key_string(["id"], image="new"))
        return framed.withColumn("key", pk.cast("binary"))

    popts = {"brokers": broker, "format": "kafkafile"}
    if partitions:
        popts["partitions"] = partitions
    return Pipe(
        pipe_id="kshim_prod",
        source=lambda s: changelog_stream(s, src, max_files_per_trigger=1),
        transforms=[mutations_only, _frame],
        producer="kafka",
        producer_options=popts,
        checkpoint_dir=ckpt,
    )


def test_kafka_producer_writes_framed_keyed_records(spark, tmp_path):
    """Produce path (K4): the kafka producer's exact column wiring
    lands every framed mutation in the broker log byte-for-byte equal
    to the batch encoder's output, keyed by the primary key, with
    strictly increasing offsets from 0."""
    register_kafka_file_shim(spark)
    src, broker = str(tmp_path / "cl"), str(tmp_path / "broker")
    write_changelog(spark, src, num_transactions=10, num_files=2)
    reg = in_memory_repo()
    _produce_pipe(broker, src, str(tmp_path / "ckpt"), reg).run_available(spark)

    logs = sorted(glob.glob(f"{broker}/mypipe_user_generic/data-*.jsonl"))
    assert logs, "no topic log written"
    recs = [json.loads(l) for p in logs for l in open(p)]
    got_values = sorted(base64.b64decode(r["v"]) for r in recs)

    batch = mutations_only(changelog_batch(spark, src))
    want_values = sorted(
        bytes(r["value"])
        for r in encode_generic(batch, reg).select("value").collect()
    )
    assert got_values == want_values and len(got_values) > 0
    # every record carries the pk key (ordering contract), non-empty
    assert all(r["k"] and base64.b64decode(r["k"]) for r in recs)


def test_kafka_config_pipe_consumes_and_decodes(spark, tmp_path):
    """Consume path (S14) through the RUNNER's registered kafka
    consumer config (decode cascade included): records produced by
    the kafka producer come back as canonical change events — same
    op/db/table/pk multiset as the original mutations, seq = broker
    offset, zero rows diverted."""
    from mypipe_spark.runner import build_pipes
    from mypipe_spark.streaming.pipe import run_pipes

    register_kafka_file_shim(spark)
    src, broker = str(tmp_path / "cl"), str(tmp_path / "broker")
    write_changelog(spark, src, num_transactions=8, num_files=2)
    reg = in_memory_repo()
    _produce_pipe(broker, src, str(tmp_path / "ckpt_p"), reg).run_available(spark)

    config = {
        "consumers": {
            "k1": {
                "type": "kafka",
                "brokers": broker,
                "topics": "mypipe_user_generic",
                "format": "kafkafile",
                "codec": "json",
            }
        },
        "pipes": {
            "kshim_cons": {
                "consumer": "k1",
                "producer": {"name": "memory"},
                "checkpoint": str(tmp_path / "ckpt_c"),
            }
        },
    }
    (pipe,) = build_pipes(config)
    pipe.checkpoint_dir = str(tmp_path / "ckpt_c")
    q = run_pipes(spark, [pipe])[0]
    q.processAllAvailable()
    q.stop()

    out = spark.sql("select * from kshim_cons")
    batch = mutations_only(changelog_batch(spark, src))
    sig = lambda df: sorted(
        (r["op"], r["database"], r["table"], r["pk"])
        for r in df.withColumn("pk", primary_key_string(["id"])).collect()
    )
    assert sig(out) == sig(batch) and out.count() > 0
    # seq is the broker offset: dense 0..n-1 within the one partition
    seqs = sorted(r["seq"] for r in out.select("seq").collect())
    assert seqs == list(range(len(seqs)))


def test_kafka_consumer_resumes_by_offset_without_duplicates(spark, tmp_path):
    """Offset/checkpoint semantics (S2 analog on the kafka leg): a
    restarted consumer with the same checkpoint picks up exactly the
    records produced while it was down — no reprocessing, no gaps."""
    register_kafka_file_shim(spark)
    broker = str(tmp_path / "broker")
    reg = in_memory_repo()

    src1 = str(tmp_path / "cl1")
    write_changelog(spark, src1, num_transactions=6, num_files=1)
    _produce_pipe(broker, src1, str(tmp_path / "ckpt_p1"), reg).run_available(spark)

    from mypipe_spark.sources.stream import kafka_stream

    sink = str(tmp_path / "consumed")

    def consume() -> None:
        # parquet sink: the memory sink cannot recover from a
        # checkpoint, and recovery is exactly what this test pins
        df = kafka_stream(
            spark, broker, "mypipe_user_generic", format="kafkafile"
        )
        q = (
            df.selectExpr("offset", "CAST(value AS BINARY) AS value")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt_c"))
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    consume()
    n1 = spark.read.parquet(sink).count()
    assert n1 > 0

    # consumer down; more mutations arrive on the topic
    src2 = str(tmp_path / "cl2")
    write_changelog(spark, src2, num_transactions=4, num_files=1, seed=7, seq_start=50_000)
    _produce_pipe(broker, src2, str(tmp_path / "ckpt_p2"), reg).run_available(spark)

    consume()
    offsets = sorted(r["offset"] for r in spark.read.parquet(sink).collect())
    # no duplicates, no gaps: the resumed run appended ONLY the new
    # records, continuing the offset log densely from 0
    assert len(offsets) > n1
    assert offsets == list(range(len(offsets)))


def test_kafka_producer_via_config_registers_shim_itself(spark, tmp_path):
    """The changelog->Kafka bridge from pure config (changelog
    consumer + kafkafile-format kafka producer, no kafka leg on the
    consume side): the PRODUCER path must register the Python
    DataSource itself — review pass 1 found registration only on the
    consumer path, so this exact config died with
    DATA_SOURCE_NOT_FOUND."""
    from mypipe_spark.runner import build_pipes
    from mypipe_spark.streaming.pipe import run_pipes

    src, broker = str(tmp_path / "cl"), str(tmp_path / "broker")
    write_changelog(spark, src, num_transactions=5, num_files=1)
    config = {
        "consumers": {"cl": {"type": "changelog", "path": src}},
        "pipes": {
            "kshim_cfg_prod": {
                "consumer": "cl",
                "wire": {"flavor": "generic"},
                "topic-template": "${database}_${table}_generic",
                "producer": {
                    "name": "kafka",
                    "brokers": broker,
                    "format": "kafkafile",
                },
                "checkpoint": str(tmp_path / "ckpt"),
            }
        },
    }
    for p in build_pipes(config):
        q = run_pipes(spark, [p])[0]
        q.processAllAvailable()
        q.stop()
    logs = glob.glob(f"{broker}/*/data-*.jsonl")
    n = sum(1 for p in logs for _ in open(p))
    assert n == mutations_only(changelog_batch(spark, src)).count() > 0


def test_append_log_file_claims_next_slot_without_clobbering(tmp_path):
    """Offset-slot claiming under contention: a slot already taken by
    a concurrent committer must be skipped (create-only link, derive
    and retry), never clobbered — review pass 1 found os.replace
    silently overwrote a racing batch."""
    import os

    from mypipe_spark.sources.kafka_shim import _append_log_file, _next_offset

    broker = str(tmp_path)
    tdir = str(tmp_path / "topic")
    os.makedirs(tdir)
    assert _append_log_file(broker, tdir, ['{"a":1}\n', '{"a":2}\n']) == 0
    # simulate the race: a competing commit landed at the derived slot
    with open(f"{tdir}/data-{2:012d}.jsonl", "w") as f:
        f.write('{"race":1}\n')
    start = _append_log_file(broker, tdir, ['{"a":3}\n'])
    assert start == 3
    assert _next_offset(tdir) == 4
    # nothing was clobbered: all four files' contents intact
    names = sorted(os.listdir(tdir))
    assert names == [
        "data-000000000000.jsonl",
        "data-000000000002.jsonl",
        "data-000000000003.jsonl",
    ]
    assert open(f"{tdir}/data-000000000002.jsonl").read() == '{"race":1}\n'


def test_kafka_consumer_starting_offsets_latest(spark, tmp_path):
    """startingOffsets=latest parity with the connector: records
    already on the topic when the query FIRST starts are skipped;
    records produced after are consumed from the checkpointed
    position."""
    register_kafka_file_shim(spark)
    broker = str(tmp_path / "broker")
    reg = in_memory_repo()
    src1 = str(tmp_path / "cl1")
    write_changelog(spark, src1, num_transactions=5, num_files=1)
    _produce_pipe(broker, src1, str(tmp_path / "ckpt_p1"), reg).run_available(spark)
    pre = sum(
        1
        for p in glob.glob(f"{broker}/mypipe_user_generic/data-*.jsonl")
        for _ in open(p)
    )
    assert pre > 0

    from mypipe_spark.sources.stream import kafka_stream

    sink = str(tmp_path / "consumed")

    def consume() -> None:
        df = kafka_stream(
            spark,
            broker,
            "mypipe_user_generic",
            starting_offsets="latest",
            format="kafkafile",
        )
        q = (
            df.selectExpr("offset")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt_c"))
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    consume()  # first start at latest: the pre-existing log is skipped
    import os

    n1 = (
        spark.read.parquet(sink).count()
        if any(f.endswith(".parquet") for f in os.listdir(sink))
        else 0
    )
    assert n1 == 0

    src2 = str(tmp_path / "cl2")
    write_changelog(spark, src2, num_transactions=3, num_files=1, seed=9, seq_start=90_000)
    _produce_pipe(broker, src2, str(tmp_path / "ckpt_p2"), reg).run_available(spark)

    consume()  # resumed from the checkpointed latest position
    offsets = sorted(r["offset"] for r in spark.read.parquet(sink).collect())
    assert offsets and offsets[0] == pre  # only the post-start records
    assert offsets == list(range(pre, pre + len(offsets)))


def test_kafkafile_sink_refuses_illegal_topics(spark, tmp_path):
    """A NULL topic (null-propagating topic template upstream), an
    empty topic, or a non-Kafka-legal one (path separators!) must fail
    at write() with a clear per-row refusal — the real broker's topic
    charset rule — not an opaque path error (or a log file linked into
    the broker root) at commit (review passes 2+3)."""
    import pytest
    from pyspark.sql import Row
    from pyspark.sql.types import StructType

    from mypipe_spark.sources.kafka_shim import _KafkaFileStreamWriter

    schema = StructType.fromDDL("topic string, value binary")
    w = _KafkaFileStreamWriter(
        {"kafka.bootstrap.servers": str(tmp_path / "broker")}, schema
    )
    for bad in (None, "", "a/b", "a\x00b", "x" * 250):
        with pytest.raises(ValueError, match="illegal topic"):
            w.write(iter([Row(topic=bad, value=b"x")]))


def test_kafka_twin_roundtrips_avro_codec(spark, tmp_path):
    """The reference's ACTUAL wire format through the kafka-shaped
    pipe: avro-framed mutations (pure-Python codec — no spark-avro
    jar here) produced to the twin broker, consumed back through the
    runner's kafka consumer with codec=avro, decode cascade included
    — same op/db/table multiset as the source, zero diverted."""
    from mypipe_spark.runner import build_pipes
    from mypipe_spark.streaming.pipe import run_pipes

    register_kafka_file_shim(spark)
    src, broker = str(tmp_path / "cl"), str(tmp_path / "broker")
    write_changelog(spark, src, num_transactions=6, num_files=1)
    reg = in_memory_repo()

    def _frame(df, _reg=reg):
        return with_topic(encode_generic(df, _reg, codec="avro"))

    Pipe(
        pipe_id="kshim_avro_prod",
        source=lambda s: changelog_stream(s, src),
        transforms=[mutations_only, _frame],
        producer="kafka",
        producer_options={"brokers": broker, "format": "kafkafile"},
        checkpoint_dir=str(tmp_path / "ckpt_p"),
    ).run_available(spark)

    config = {
        "consumers": {
            "k1": {
                "type": "kafka",
                "brokers": broker,
                "topics": "mypipe_user_generic",
                "format": "kafkafile",
                "codec": "avro",
            }
        },
        "pipes": {
            "kshim_avro_cons": {
                "consumer": "k1",
                "producer": {"name": "memory"},
                "checkpoint": str(tmp_path / "ckpt_c"),
            }
        },
    }
    (pipe,) = build_pipes(config)
    q = run_pipes(spark, [pipe])[0]
    q.processAllAvailable()
    q.stop()

    out = spark.sql("select * from kshim_avro_cons")
    batch = mutations_only(changelog_batch(spark, src))
    sig = lambda df: sorted(
        (r["op"], r["database"], r["table"]) for r in df.collect()
    )
    assert sig(out) == sig(batch) and out.count() > 0


def test_kafkafile_refuses_dot_topics_and_validates_subscribe(spark, tmp_path):
    """Kafka reserves '.' and '..' as illegal topic names — the twin
    must too, or a '.' topic lands log files in the broker ROOT and
    '..' in its PARENT (round-8 review: the charset regex alone
    admitted both); the reader applies the same rule to subscribe so
    '../x' can never read outside the broker dir."""
    import pytest
    from pyspark.sql import Row
    from pyspark.sql.types import StructType

    from mypipe_spark.sources.kafka_shim import (
        _KafkaFileStreamReader,
        _KafkaFileStreamWriter,
    )

    schema = StructType.fromDDL("topic string, value binary")
    w = _KafkaFileStreamWriter(
        {"kafka.bootstrap.servers": str(tmp_path / "broker")}, schema
    )
    for bad in (".", ".."):
        with pytest.raises(ValueError, match="illegal topic"):
            w.write(iter([Row(topic=bad, value=b"x")]))
    for bad in ("..", "../evil", "a/b"):
        with pytest.raises(ValueError, match="illegal subscribe|single topic"):
            _KafkaFileStreamReader(
                {
                    "kafka.bootstrap.servers": str(tmp_path / "broker"),
                    "subscribe": bad,
                }
            )


def test_kafkafile_sink_accepts_string_value_like_the_connector(spark, tmp_path):
    """The real connector casts string key/value columns to binary;
    the twin must accept them identically (round-8 review: bytes(str)
    raised an opaque executor TypeError where format('kafka') would
    have worked)."""
    import glob as _glob
    import json as _json

    register_kafka_file_shim(spark)
    broker = str(tmp_path / "broker")
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("t1", "payload-as-string", "key-as-string")],
        "topic string, value string, key string",
    ).write.parquet(src)
    q = (
        spark.readStream.schema("topic string, value string, key string")
        .parquet(src)
        .writeStream.format("kafkafile")
        .option("kafka.bootstrap.servers", broker)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    recs = [
        _json.loads(l)
        for p in _glob.glob(f"{broker}/t1/data-*.jsonl")
        for l in open(p)
    ]
    assert len(recs) == 1
    assert base64.b64decode(recs[0]["v"]) == b"payload-as-string"
    assert base64.b64decode(recs[0]["k"]) == b"key-as-string"


# ---------------------------------------------------------------------------
# N-partition mode (round-8 verdict ask #4): the per-(db,table) ordering
# guarantee the reference relies on (README.md:119-124) under PARTITIONED
# produce — keyed order survives, round-robin demonstrably does not.


def test_murmur2_matches_kafka_test_vectors():
    """The twin's partitioner must be the REAL default partitioner:
    murmur2 pinned against the vectors from Kafka's own UtilsTest, so
    a consumer moving between the twin and a real broker sees the
    identical key->partition mapping."""
    from mypipe_spark.sources.kafka_shim import _murmur2

    def signed(x: int) -> int:
        return x - 2**32 if x >= 2**31 else x

    vectors = {
        b"21": -973932308,
        b"foobar": -790332482,
        b"a-little-bit-long-string": -985981536,
        b"a-little-bit-longer-string": -1486304829,
        b"lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8": -58897971,
        b"": 275646681,
    }
    for data, want in vectors.items():
        assert signed(_murmur2(data)) == want, data


def _write_waves(spark, src: str, waves, keys, keyed: bool = True) -> None:
    """One parquet file per wave (seq range), mtime-ordered so the
    file stream (maxFilesPerTrigger=1) replays them as one batch per
    wave, oldest first — the produce order the assertions reason
    about."""
    import os
    import time

    # stamp mtimes PER WAVE as the files appear: the parquet part
    # names carry random UUIDs, so any name-sorted stamping would
    # scramble wave order and the produce-order assertions with it
    seen: set[str] = set()
    base = time.time()
    for i, w in enumerate(waves):
        rows = [(k, f"{k}:{s}") for s in w for k in keys]
        df = spark.createDataFrame(rows, "key string, value string")
        if not keyed:
            df = df.select("value")
        df.coalesce(1).write.mode("append").parquet(src)
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in seen:
                os.utime(os.path.join(src, f), (base + i, base + i))
                seen.add(f)


def _produce_partitioned(
    spark, src: str, broker: str, ckpt: str, topic: str, keyed: bool = True
) -> None:
    from pyspark.sql import functions as F

    schema = "key string, value string" if keyed else "value string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("topic", F.lit(topic))
    )
    q = (
        stream.writeStream.format("kafkafile")
        .option("kafka.bootstrap.servers", broker)
        .option("kafkafile.partitions", "4")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_partitioned_keyed_produce_preserves_per_key_order(spark, tmp_path):
    """pk-keyed produce across a 4-partition topic: every key lands in
    exactly its murmur2 partition, per-partition offsets are dense
    from 0, and each key's values read back in produce order — across
    BOTH a producer restart and a consumer checkpoint resume. This is
    the reference's ordering contract (README.md:119-124: per-table
    topics stay ordered because records are pk-keyed) under the real
    broker's partitioning rules."""
    import os

    from mypipe_spark.sources.kafka_shim import (
        _partition_for_key,
        register_kafka_file_shim,
    )
    from mypipe_spark.sources.stream import kafka_stream

    register_kafka_file_shim(spark)
    src = str(tmp_path / "src")
    broker = str(tmp_path / "broker")
    topic = "orders_by_pk"
    keys = [f"user{i}" for i in range(16)]

    _write_waves(spark, src, [range(0, 2), range(2, 4)], keys)
    _produce_partitioned(
        spark, src, broker, str(tmp_path / "ckpt_p"), topic
    )

    tdir = os.path.join(broker, topic)
    assert os.path.exists(os.path.join(tdir, ".partitions"))
    pdirs = sorted(d for d in os.listdir(tdir) if d.startswith("p-"))
    assert pdirs == [f"p-{p:05d}" for p in range(4)]

    sink = str(tmp_path / "consumed")

    def consume() -> None:
        df = kafka_stream(spark, broker, topic, format="kafkafile")
        q = (
            df.selectExpr(
                "CAST(key AS STRING) AS key",
                "CAST(value AS STRING) AS value",
                "partition",
                "offset",
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt_c"))
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    consume()
    n1 = spark.read.parquet(sink).count()
    assert n1 == 16 * 4

    # producer down; two more waves arrive; producer restarts from its
    # checkpoint, consumer resumes from its own
    _write_waves(spark, src, [range(4, 6)], keys)
    _produce_partitioned(
        spark, src, broker, str(tmp_path / "ckpt_p"), topic
    )
    consume()

    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 16 * 6, "resume duplicated or dropped records"
    by_key: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["partition"], r["offset"])):
        # the partition IS the murmur2 route for the key
        assert r["partition"] == _partition_for_key(
            r["key"].encode(), 4
        ), r
        by_key.setdefault(r["key"], []).append(r)
    for k, recs in by_key.items():
        # one partition per key, and values in produce order when read
        # in that partition's offset order — the ordering contract
        assert len({r["partition"] for r in recs}) == 1, k
        assert [r["value"] for r in recs] == [
            f"{k}:{s}" for s in range(6)
        ], k
    # per-partition offsets are dense from 0 (broker-assigned)
    for p in {r["partition"] for r in rows}:
        offs = sorted(r["offset"] for r in rows if r["partition"] == p)
        assert offs == list(range(len(offs))), p


def test_partitioned_unkeyed_produce_breaks_order(spark, tmp_path):
    """The negative half of the ordering pin: UNKEYED produce
    round-robins across partitions, and since the consumer only
    orders within a partition, the read-back sequence provably
    diverges from the produce sequence. This is why the production
    guidance (sinks/producers.py) REQUIRES pk-keying on partitioned
    topics — not a twin artifact, the real broker contract."""
    from mypipe_spark.sources.kafka_shim import register_kafka_file_shim
    from mypipe_spark.sources.stream import kafka_stream

    register_kafka_file_shim(spark)
    src = str(tmp_path / "src")
    broker = str(tmp_path / "broker")
    topic = "unkeyed_topic"

    # one wave, one file, ONE task: values v:0..v:11 staged in order
    _write_waves(spark, src, [range(12)], ["v"], keyed=False)
    _produce_partitioned(
        spark, src, broker, str(tmp_path / "ckpt_p"), topic, keyed=False
    )

    df = kafka_stream(spark, broker, topic, format="kafkafile")
    sink = str(tmp_path / "consumed")
    q = (
        df.selectExpr("CAST(value AS STRING) AS value", "partition", "offset")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_c"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = spark.read.parquet(sink).collect()
    produced = [f"v:{s}" for s in range(12)]
    assert sorted(r["value"] for r in rows) == sorted(produced)
    # records spread across several partitions...
    assert len({r["partition"] for r in rows}) > 1
    # ...and the consumer's only available order (partition, offset)
    # does NOT reproduce the produce order
    consumed = [
        r["value"]
        for r in sorted(rows, key=lambda r: (r["partition"], r["offset"]))
    ]
    assert consumed != produced


def test_partition_count_is_topic_config_not_producer_option(spark, tmp_path):
    """Producing to an EXISTING flat topic with kafkafile.partitions=4
    must not repartition it (the real broker's partition count is
    topic configuration): the log stays flat, offsets keep continuing
    densely, and no .partitions metadata appears."""
    import os

    from mypipe_spark.sources.kafka_shim import register_kafka_file_shim

    register_kafka_file_shim(spark)
    broker = str(tmp_path / "broker")
    topic = "flat_first"

    def produce(src: str, ckpt: str, partitions: str | None) -> None:
        from pyspark.sql import functions as F

        w = (
            spark.readStream.schema("key string, value string")
            .parquet(src)
            .withColumn("topic", F.lit(topic))
            .writeStream.format("kafkafile")
            .option("kafka.bootstrap.servers", broker)
            .option("checkpointLocation", ckpt)
        )
        if partitions:
            w = w.option("kafkafile.partitions", partitions)
        q = w.start()
        q.processAllAvailable()
        q.stop()

    src1 = str(tmp_path / "s1")
    _write_waves(spark, src1, [range(3)], ["a", "b"])
    produce(src1, str(tmp_path / "c1"), None)

    src2 = str(tmp_path / "s2")
    _write_waves(spark, src2, [range(3, 6)], ["a", "b"])
    produce(src2, str(tmp_path / "c2"), "4")

    tdir = os.path.join(broker, topic)
    assert not os.path.exists(os.path.join(tdir, ".partitions"))
    assert not any(d.startswith("p-") for d in os.listdir(tdir))
    import glob as _glob
    import json as _json

    files = sorted(_glob.glob(f"{tdir}/data-*.jsonl"))
    n = sum(1 for p in files for _ in open(p))
    assert n == 12  # both produces landed in the one flat log


def test_partitioned_kafka_pipe_keeps_per_pk_latest(spark, tmp_path):
    """The SEMANTIC consequence of pk-keyed partitioned produce,
    pinned through the full config-driven cascade: on a 4-partition
    topic, broker offsets (→ seq) are only PER-PARTITION dense — two
    rows of different pks may share a seq — but every pk's history
    lives in exactly one partition, so per-pk argmax(seq), the
    keep-last rule every latest-state consumer applies, still selects
    exactly the changelog's last mutation for every pk. This is why
    decoded_change_events can keep offset→seq unchanged under the
    round-9 partition mode."""
    import os

    from mypipe_spark.runner import build_pipes
    from mypipe_spark.streaming.pipe import run_pipes

    register_kafka_file_shim(spark)
    src, broker = str(tmp_path / "cl"), str(tmp_path / "broker")
    write_changelog(spark, src, num_transactions=30, num_files=3)
    reg = in_memory_repo()
    _produce_pipe(
        broker, src, str(tmp_path / "ckpt_p"), reg, partitions=4
    ).run_available(spark)

    tdir = os.path.join(broker, "mypipe_user_generic")
    assert os.path.exists(os.path.join(tdir, ".partitions"))
    used = [d for d in os.listdir(tdir) if d.startswith("p-") and os.listdir(os.path.join(tdir, d))]
    assert len(used) > 1, "fixture keys all hashed to one partition"

    config = {
        "consumers": {
            "k1": {
                "type": "kafka",
                "brokers": broker,
                "topics": "mypipe_user_generic",
                "format": "kafkafile",
                "codec": "json",
            }
        },
        "pipes": {
            "kshim_part_latest": {
                "consumer": "k1",
                "producer": {"name": "memory"},
                "checkpoint": str(tmp_path / "ckpt_c"),
            }
        },
    }
    (pipe,) = build_pipes(config)
    pipe.checkpoint_dir = str(tmp_path / "ckpt_c")
    q = run_pipes(spark, [pipe])[0]
    q.processAllAvailable()
    q.stop()

    # pk derived EXACTLY like the producer keys records (deletes carry
    # only the old image). Deriving it from the new image alone
    # collapsed every delete into pk '' — a group whose rows span
    # partitions, where argmax(seq) promptly picked a different row
    # than the batch ground truth: the keying hazard this test
    # documents, demonstrated live by its own first draft.
    from pyspark.sql import functions as F

    pk = F.when(
        F.col("op") == "delete", primary_key_string(["id"], image="old")
    ).otherwise(primary_key_string(["id"], image="new"))
    out = spark.sql("select * from kshim_part_latest").withColumn("pk", pk)
    batch = mutations_only(changelog_batch(spark, src)).withColumn("pk", pk)
    map_cols = [
        c
        for c in batch.columns
        if c.startswith("old_") or c.startswith("new_")
    ]

    def norm(v):
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        return v

    def latest_by(df, seq_col):
        best: dict = {}
        for r in df.collect():
            k = r["pk"]
            if k not in best or r[seq_col] > best[k][seq_col]:
                best[k] = r
        return {
            k: (r["op"],)
            + tuple(
                tuple(sorted((kk, norm(vv)) for kk, vv in (r[c] or {}).items()))
                for c in map_cols
            )
            for k, r in best.items()
        }

    got = latest_by(out, "seq")
    want = latest_by(batch, "seq")
    assert got == want and len(got) > 1
    # and the collision premise is real: consumed seqs are NOT
    # globally unique (per-partition offsets), yet per pk they are
    seqs = [r["seq"] for r in out.select("seq").collect()]
    assert len(set(seqs)) < len(seqs)
    per_pk = {}
    for r in out.select("pk", "seq").collect():
        per_pk.setdefault(r["pk"], []).append(r["seq"])
    assert all(len(set(v)) == len(v) for v in per_pk.values())


def test_ensure_topic_creation_race_agrees_on_one_count(tmp_path):
    """The create-only (O_EXCL) metadata claim under REAL concurrency:
    many threads race the first-ever produce of one topic with the
    SAME partition count (the supported race — conflicting counts are
    documented undefined), and every one must come back with the
    winner's count, one metadata file, and all four partition dirs —
    never a torn half-created topic."""
    import os
    import threading

    from mypipe_spark.sources.kafka_shim import _ensure_topic

    tdir = str(tmp_path / "broker" / "raced_topic")
    results: list[int] = []
    errors: list[BaseException] = []
    start = threading.Barrier(8)

    def run():
        try:
            start.wait()
            results.append(_ensure_topic(str(tmp_path / "broker"), tdir, 4))
        except BaseException as exc:  # noqa: BLE001 — collected
            errors.append(exc)

    threads = [threading.Thread(target=run) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors and results == [4] * 8
    with open(os.path.join(tdir, ".partitions")) as fh:
        assert fh.read().strip() == "4"
    pdirs = sorted(d for d in os.listdir(tdir) if d.startswith("p-"))
    assert pdirs == [f"p-{p:05d}" for p in range(4)]


def test_murmur2_tail_lengths_route_in_range():
    """The Kafka UtilsTest vectors cover byte lengths {0, 2, 6, 24,
    26, 48} — remainders 0 and 2 only, and Java's switch fall-through
    means the rem-2 vectors also execute the rem-1 XOR and the tail
    multiply. The one line no vector reaches is the rem-3 XOR
    (<<16), verified against the published algorithm text; this test
    at least pins that every tail length is deterministic, in range,
    and actually sensitive to its last byte (a truncation bug that
    ignored the tail would collide these)."""
    from mypipe_spark.sources.kafka_shim import (
        _murmur2,
        _partition_for_key,
    )

    for length in range(1, 9):
        a = bytes(range(length))
        b = bytes(range(length - 1)) + bytes([0xFF])
        assert _murmur2(a) == _murmur2(bytes(a))  # deterministic
        assert 0 <= _partition_for_key(a, 7) < 7
        if length >= 1:
            assert _murmur2(a) != _murmur2(b) or a == b
    # tail-byte sensitivity for each remainder class specifically
    for rem_len in (1, 2, 3):
        base = b"abcd" * 2 + bytes(rem_len)
        flip = b"abcd" * 2 + bytes(rem_len - 1) + b"\x01"
        assert _murmur2(base) != _murmur2(flip), rem_len


def test_ensure_topic_meta_never_visible_empty_to_racing_readers(tmp_path):
    """ADVICE r9 (kafka_shim.py:186): O_CREAT|O_EXCL made .partitions
    visible BEFORE its content was written, so a concurrent
    _topic_partitions reader could crash on ValueError(int('')).
    The fix publishes via staged-content + create-only os.link (the
    _append_log_file pattern), so the meta file only ever appears
    complete. Pin it under real concurrency: creators race readers
    that poll _topic_partitions in a tight loop; every observation
    must be 1 (meta not yet linked) or 4 (linked complete) — never a
    parse error, never a torn value."""
    import threading

    from mypipe_spark.sources.kafka_shim import (
        _ensure_topic,
        _topic_partitions,
    )

    tdir = str(tmp_path / "broker" / "read_raced")
    os.makedirs(tdir, exist_ok=True)
    observed: set[int] = set()
    errors: list[BaseException] = []
    start = threading.Barrier(8)
    done = threading.Event()

    def create():
        try:
            start.wait()
            _ensure_topic(str(tmp_path / "broker"), tdir, 4)
        except BaseException as exc:  # noqa: BLE001 — collected
            errors.append(exc)

    def read():
        try:
            start.wait()
            while not done.is_set():
                observed.add(_topic_partitions(tdir))
        except BaseException as exc:  # noqa: BLE001 — collected
            errors.append(exc)

    threads = [threading.Thread(target=create) for _ in range(4)] + [
        threading.Thread(target=read) for _ in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads[:4]:
        t.join()
    done.set()
    for t in threads[4:]:
        t.join()
    assert not errors, errors
    assert observed <= {1, 4} and 4 in observed
    # and nothing staged leaked: the claim temp is always removed
    staging = os.path.join(os.path.dirname(tdir), "_staging")
    assert not os.path.exists(staging) or not os.listdir(staging)


def test_kafka_producer_validates_partitions_option(spark, tmp_path):
    """ADVICE r9 (producers.py:118): 'partitions' was silently ignored
    for the real 'kafka' format (and for falsy values like 0) — a
    config that believed it set topic partitioning got no feedback.
    Now: non-kafkafile format raises (a real broker's partition count
    is administrative topic config), and the value is validated as a
    positive int HERE rather than only inside the twin."""
    import pytest

    from mypipe_spark.sinks.producers import get_producer

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    df = spark.readStream.schema("topic string, value string").parquet(src)
    kafka = get_producer("kafka")
    broker = str(tmp_path / "broker")

    with pytest.raises(ValueError, match="only honored by the .*kafkafile"):
        kafka(df, {"brokers": broker, "partitions": 4})
    with pytest.raises(ValueError, match="only honored by the .*kafkafile"):
        kafka(df, {"brokers": broker, "format": "kafka", "partitions": 4})
    # exact-int only: int() coercion would silently truncate a
    # config's 4.9 to 4 partitions and accept True as 1
    for bad in (0, -1, "zero", None, True, 4.9, "4.9"):
        with pytest.raises(ValueError, match="positive int"):
            kafka(
                df,
                {"brokers": broker, "format": "kafkafile", "partitions": bad},
            )
    # the happy path still builds: kafkafile + positive int (and the
    # string form a config file would carry)
    for ok in (4, "4"):
        kafka(df, {"brokers": broker, "format": "kafkafile", "partitions": ok})


def test_flat_nonzero_checkpoint_against_partitioned_topic_raises(tmp_path):
    """ADVICE r9 (kafka_shim.py:432): a flat int checkpoint offset > 0
    against a now-partitioned topic silently seeded EVERY partition
    with that offset — skipping that many records per partition —
    while the symmetric mismatch (dict checkpoint, flat topic) raised.
    Now only offset 0 (the documented stream-started-before-the-topic
    case) seeds partitions; any nonzero flat offset raises like its
    mirror guard."""
    import pytest

    from mypipe_spark.sources.kafka_shim import (
        _ensure_topic,
        _KafkaFileStreamReader,
    )

    broker = str(tmp_path / "broker")
    _ensure_topic(broker, os.path.join(broker, "ptopic"), 4)
    reader = _KafkaFileStreamReader(
        {"kafka.bootstrap.servers": broker, "subscribe": "ptopic"}
    )
    with pytest.raises(ValueError, match="flat offset"):
        reader.read({"offset": 5})
    # offset 0 is the legitimate pre-topic start: seeds every
    # partition at 0 and reports per-partition ends from here on
    rows, end = reader.read({"offset": 0})
    assert list(rows) == []
    assert end == {"offset": {str(p): 0 for p in range(4)}}


def test_reserved_internal_names_are_not_topics(tmp_path):
    """'_staging' and '_commits' are broker-INTERNAL directories of
    the twin (claim temps, idempotent-commit markers) living beside
    the topic dirs; a topic with either name would interleave its log
    with in-flight temps and the documented recovery ('delete
    _staging/') would delete real data. Both refused at the sink's
    per-row check and at subscribe — a twin-only reservation,
    documented at _RESERVED_TOPICS."""
    import pytest
    from pyspark.sql import Row
    from pyspark.sql.types import StructType

    from mypipe_spark.sources.kafka_shim import (
        _KafkaFileStreamReader,
        _KafkaFileStreamWriter,
    )

    schema = StructType.fromDDL("topic string, value binary")
    w = _KafkaFileStreamWriter(
        {"kafka.bootstrap.servers": str(tmp_path / "broker")}, schema
    )
    for bad in ("_staging", "_commits"):
        with pytest.raises(ValueError, match="illegal topic"):
            w.write(iter([Row(topic=bad, value=b"x")]))
        with pytest.raises(ValueError, match="illegal subscribe"):
            _KafkaFileStreamReader(
                {
                    "kafka.bootstrap.servers": str(tmp_path / "broker"),
                    "subscribe": bad,
                }
            )


def test_explicit_partition_column_routes_and_headers_refused(
    spark, tmp_path
):
    """The real connector honors an explicit 'partition' column and a
    'headers' column; the twin must not silently ignore either
    (round-10 review — sinks/producers.py deliberately forwards both).
    'partition' ROUTES the record (out-of-range is the broker's loud
    refusal at commit); 'headers' is refused at construction (the
    twin's record format has no headers — a documented divergence,
    never a silent drop)."""
    import pytest
    from pyspark.sql.types import StructType

    from mypipe_spark.sources.kafka_shim import _KafkaFileStreamWriter

    register_kafka_file_shim(spark)
    broker = str(tmp_path / "broker")

    def produce(rows, name):
        src = str(tmp_path / f"src_{name}")
        spark.createDataFrame(
            rows, "topic string, value string, partition int"
        ).write.parquet(src)
        q = (
            spark.readStream.schema(
                "topic string, value string, partition int"
            )
            .parquet(src)
            .writeStream.format("kafkafile")
            .option("kafka.bootstrap.servers", broker)
            .option("kafkafile.partitions", "4")
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    produce(
        [("t1", "a", 2), ("t1", "b", 2), ("t1", "c", 0), ("t1", "d", None)],
        "ok",
    )
    tdir = os.path.join(broker, "t1")
    recs_by_part = {
        p: [
            base64.b64decode(json.loads(l)["v"]).decode()
            for f in sorted(glob.glob(f"{tdir}/p-{p:05d}/data-*.jsonl"))
            for l in open(f)
        ]
        for p in range(4)
    }
    # explicit routing (source-file read order is not deterministic
    # across parquet parts, so membership, not order, is the claim)
    assert sorted(recs_by_part[2]) == ["a", "b"]
    assert "c" in recs_by_part[0]
    # the NULL-partition row fell back to the default partitioner
    # (keyless round-robin: lands SOMEWHERE, possibly partition 0)
    all_values = sorted(v for vs in recs_by_part.values() for v in vs)
    assert all_values == ["a", "b", "c", "d"]

    # out of range: loud refusal (the query fails at commit)
    with pytest.raises(Exception, match="out of range"):
        produce([("t1", "x", 9)], "oor")

    # headers: refused at writer construction, never silently dropped
    schema = StructType.fromDDL(
        "topic string, value binary, headers array<struct<key:string,value:binary>>"
    )
    with pytest.raises(ValueError, match="headers"):
        _KafkaFileStreamWriter(
            {"kafka.bootstrap.servers": broker}, schema
        )


def test_checkpoint_partition_count_mismatch_raises(tmp_path):
    """Per-partition offsets taken against an 8-partition log must not
    seed a 4-partition topic by key overlap (round-10 review: records
    silently skipped, offsets for the extra partitions silently
    discarded) — same loud data-loss refusal as the flat/partitioned
    mismatches."""
    import pytest

    from mypipe_spark.sources.kafka_shim import (
        _ensure_topic,
        _KafkaFileStreamReader,
    )

    broker = str(tmp_path / "broker")
    _ensure_topic(broker, os.path.join(broker, "ptopic"), 4)
    reader = _KafkaFileStreamReader(
        {"kafka.bootstrap.servers": broker, "subscribe": "ptopic"}
    )
    with pytest.raises(ValueError, match="4"):
        reader.read({"offset": {str(p): 5 for p in range(8)}})


def test_truncated_log_raises_like_fail_on_data_loss(spark, tmp_path):
    """A checkpoint offset past the log's end means the log was
    truncated/recreated under the checkpoint: the real connector
    kills the query (failOnDataLoss default); the twin must raise,
    not clamp and silently skip the new log's first records forever
    (round-10 review)."""
    import pytest

    from mypipe_spark.sources.kafka_shim import _KafkaFileStreamReader

    register_kafka_file_shim(spark)
    broker = str(tmp_path / "broker")
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("t1", "a"), ("t1", "b")], "topic string, value string"
    ).write.parquet(src)
    q = (
        spark.readStream.schema("topic string, value string")
        .parquet(src)
        .writeStream.format("kafkafile")
        .option("kafka.bootstrap.servers", broker)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    reader = _KafkaFileStreamReader(
        {"kafka.bootstrap.servers": broker, "subscribe": "t1"}
    )
    rows, end = reader.read({"offset": 0})
    assert len(list(rows)) == 2 and end == {"offset": 2}
    with pytest.raises(ValueError, match="truncated|recreated"):
        reader.read({"offset": 7})


def test_line_count_cache_keys_on_identity_not_path(tmp_path):
    """Data files are immutable once linked, so counts are cacheable —
    but the cache must key on (path, size, mtime) so a recreated
    same-name file can never serve a stale count (round-10 review:
    the O(tail-file) re-read per trigger was the cost being removed)."""
    import os as _os
    import time as _time

    from mypipe_spark.sources.kafka_shim import _line_count

    p = str(tmp_path / "data-000000000000.jsonl")
    with open(p, "w") as f:
        f.write("a\nb\n")
    assert _line_count(p) == 2
    assert _line_count(p) == 2  # cached
    _time.sleep(0.01)
    _os.remove(p)
    with open(p, "w") as f:
        f.write("a\nb\nc\n")
    assert _line_count(p) == 3  # recreated file: fresh count


def test_line_count_cache_keys_on_inode(tmp_path):
    """ADVICE r10: on coarse-mtime filesystems a broker dir deleted and
    recreated with a same-size, different-line-count data file within
    one timestamp tick must not serve a stale cached count (offsets
    would mis-derive). Data files are immutable, so inode identity
    exactly captures recreation — force identical (path, size, mtime)
    and pin that the recreated file's count is re-read."""
    import os

    from mypipe_spark.sources.kafka_shim import _line_count

    path = str(tmp_path / "data-00000000000000000000.jsonl")
    with open(path, "w") as f:
        f.write("a\nb\n")  # 4 bytes, 2 lines
    os.utime(path, ns=(1_700_000_000_000_000_000, 1_700_000_000_000_000_000))
    assert _line_count(path) == 2

    # build the replacement while the original still exists so the
    # filesystem cannot hand the freed inode straight back (which
    # would defeat the pin, not the fix)
    repl = str(tmp_path / "replacement.jsonl")
    with open(repl, "w") as f:
        f.write("abc\n")  # 4 bytes, 1 line — same size, same mtime
    os.replace(repl, path)
    os.utime(path, ns=(1_700_000_000_000_000_000, 1_700_000_000_000_000_000))
    assert _line_count(path) == 1
