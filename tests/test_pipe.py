from __future__ import annotations

import glob

from pyspark.sql import functions as F

from mypipe_spark.changelog import write_changelog
from mypipe_spark.model import CHANGE_EVENT_SCHEMA
from mypipe_spark.operators.decode import mutations_only
from mypipe_spark.operators.filters import include_events, with_topic
from mypipe_spark.sinks.producers import get_producer, register_producer
from mypipe_spark.sources.stream import changelog_batch, changelog_stream
from mypipe_spark.streaming.pipe import Pipe


def test_producer_registry():
    assert get_producer("console") and get_producer("memory")
    try:
        get_producer("nope")
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "unknown producer" in str(e)

    @register_producer("custom_test")
    def custom(df, options):  # pragma: no cover - registration check only
        return df.writeStream.format("memory")

    assert get_producer("custom_test") is custom


def test_pipe_end_to_end_memory(spark, tmp_path):
    path = str(tmp_path / "cl")
    write_changelog(spark, path, num_transactions=15, num_files=3)

    pipe = Pipe(
        pipe_id="p_mem",
        source=lambda s: changelog_stream(s, path, max_files_per_trigger=1),
        transforms=[
            mutations_only,
            lambda df: include_events(df, "database = 'mypipe'"),
            with_topic,
        ],
        producer="memory",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    pipe.run_available(spark)
    out = spark.sql("select * from p_mem")
    expected = mutations_only(changelog_batch(spark, path)).count()
    assert out.count() == expected
    assert out.select("topic").distinct().collect()[0][0] == "mypipe_user_generic"


def test_pipe_checkpoint_resume_no_duplicates(spark, tmp_path):
    """Kill-and-resume: a restarted pipe with the same checkpoint must
    not reprocess committed batches (T4 position semantics) and must
    pick up files that arrived while it was down."""
    src = str(tmp_path / "cl")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_changelog(spark, src, num_transactions=10, seed=1, num_files=2)

    def mk_pipe() -> Pipe:
        return Pipe(
            pipe_id="p_resume",
            source=lambda s: changelog_stream(s, src, max_files_per_trigger=1),
            transforms=[mutations_only],
            producer="parquet",
            producer_options={"path": sink},
            checkpoint_dir=ckpt,
        )

    mk_pipe().run_available(spark)
    first_count = spark.read.parquet(sink).count()
    assert first_count > 0

    # stream is down; new events arrive (a second changelog segment)
    extra = str(tmp_path / "cl_extra")
    write_changelog(spark, extra, num_transactions=5, seed=2, num_files=1, seq_start=100_000)
    for f in glob.glob(extra + "/*.parquet"):
        import shutil

        shutil.copy(f, src + "/extra_" + f.split("/")[-1])

    mk_pipe().run_available(spark)
    final = spark.read.parquet(sink)
    # no duplicates from the first run...
    assert final.groupBy("seq").count().filter(F.col("count") > 1).count() == 0
    # ...and the late-arriving file was processed
    assert final.count() > first_count


def test_pipe_encodes_wire_bytes_streaming(spark, tmp_path):
    """Reference-core-loop parity (binlog → mutation → encoded wire
    bytes → sink, KafkaProducer.scala:29-45): run the generic-envelope
    encoder INSIDE a streaming pipe and require the emitted framed
    bytes to equal the batch encode byte-for-byte — same registry,
    same schema ids, same [magic][mtype][id BE short][payload]
    framing. Encoding is a stateless projection, so stream==batch must
    hold exactly."""
    from mypipe_spark.registry import in_memory_repo
    from mypipe_spark.sinks.wire import encode_generic

    path = str(tmp_path / "cl")
    write_changelog(spark, path, num_transactions=10, num_files=2)
    reg = in_memory_repo()
    pipe = Pipe(
        pipe_id="p_wire",
        source=lambda s: changelog_stream(s, path, max_files_per_trigger=1),
        transforms=[
            mutations_only,
            lambda df: encode_generic(df, reg).select("seq", "value"),
        ],
        producer="memory",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    pipe.run_available(spark)
    got = {
        r["seq"]: bytes(r["value"])
        for r in spark.sql("select * from p_wire").collect()
    }
    batch = encode_generic(mutations_only(changelog_batch(spark, path)), reg)
    expected = {
        r["seq"]: bytes(r["value"]) for r in batch.select("seq", "value").collect()
    }
    assert got == expected and len(got) > 0


def test_run_pipes_stops_started_queries_when_a_later_pipe_fails(spark, tmp_path):
    """All-or-nothing start (round-8 review): a bad pipe mid-list must
    not leave earlier pipes running as unstoppable orphans."""
    import pytest

    from mypipe_spark.streaming.pipe import run_pipes

    src = str(tmp_path / "cl")
    write_changelog(spark, src, num_transactions=3, num_files=1)
    good = Pipe(
        pipe_id="rp_good",
        source=lambda s: changelog_stream(s, src),
        producer="memory",
        checkpoint_dir=str(tmp_path / "ck_good"),
    )
    bad = Pipe(
        pipe_id="rp_bad",
        source=lambda s: changelog_stream(s, src),
        producer="no_such_producer",
        checkpoint_dir=str(tmp_path / "ck_bad"),
    )
    before = {q.id for q in spark.streams.active}
    with pytest.raises(KeyError, match="unknown producer"):
        run_pipes(spark, [good, bad])
    leaked = [q for q in spark.streams.active if q.id not in before]
    assert leaked == []
