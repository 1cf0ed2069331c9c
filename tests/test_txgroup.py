from __future__ import annotations

from pyspark.sql import functions as F

from mypipe_spark.changelog import changelog_df
from mypipe_spark.model import CHANGE_EVENT_SCHEMA
from mypipe_spark.operators.decode import is_mutation
from mypipe_spark.operators.txgroup import committed_mutations, tx_group_stream


def _expected_committed(spark, df):
    """Ground truth via driver-side python: mutations whose txid has a
    commit marker, stamped with the commit ts."""
    rows = df.collect()
    commits = {r["txid"]: r["ts"] for r in rows if r["op"] == "commit"}
    return {
        (r["seq"], commits[r["txid"]])
        for r in rows
        if r["op"] in ("insert", "update", "delete") and r["txid"] in commits
    }


def test_committed_mutations_batch(spark):
    df = changelog_df(spark, num_transactions=40, rollback_prob=0.3)
    out = committed_mutations(df)
    got = {(r["seq"], r["ts"]) for r in out.select("seq", "ts").collect()}
    assert got == _expected_committed(spark, df)
    # rolled-back mutations are gone
    rolled = df.filter(F.col("op") == "rollback").select("txid")
    leaked = out.join(rolled, "txid").count()
    assert leaked == 0
    # event_ts preserves the original time; ts is the (later) commit time
    bad = out.filter(F.col("ts") < F.col("event_ts")).count()
    assert bad == 0


def test_committed_mutations_grouped(spark):
    df = changelog_df(spark, num_transactions=20, rollback_prob=0.2)
    grouped = committed_mutations(df, group_by_tx=True)
    row = grouped.orderBy("ts").limit(1).collect()[0]
    assert row["n_mutations"] == len(row["mutations"])
    seqs = [m["seq"] for m in row["mutations"]]
    assert seqs == sorted(seqs)
    # number of groups == number of committed txs that had mutations
    commits = df.filter(F.col("op") == "commit").select("txid").distinct()
    muts = df.filter(is_mutation()).select("txid").distinct()
    assert grouped.count() == commits.join(muts, "txid").count()


def test_tx_group_stream_matches_batch(spark, tmp_path):
    """The stateful streaming form must agree with the relational form."""
    from mypipe_spark.changelog import write_changelog
    from mypipe_spark.sources.stream import changelog_stream

    path = str(tmp_path / "cl")
    write_changelog(spark, path, num_transactions=25, seed=7, rollback_prob=0.25, num_files=5)

    batch_df = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(path)
    expected = {
        (r["seq"], r["ts"]) for r in committed_mutations(batch_df).select("seq", "ts").collect()
    }

    stream = changelog_stream(spark, path, max_files_per_trigger=2)
    out = tx_group_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("txg")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got_rows = spark.sql("select seq, op, ts, event_json from txg").collect()
    got = {(r["seq"], r["ts"]) for r in got_rows}
    assert got == expected
    # the full event row survives the JSON ride
    if got_rows:
        parsed = (
            spark.sql("select event_json from txg")
            .select(F.from_json("event_json", CHANGE_EVENT_SCHEMA).alias("e"))
            .select("e.database", "e.table", "e.op")
            .limit(1)
            .collect()[0]
        )
        assert parsed["database"] == "mypipe" and parsed["table"] == "user"


def test_tx_group_stream_grouped_matches_batch(spark, tmp_path):
    """Grouped emission (group-mutations-by-tx, reference.conf:14-21;
    AbstractBinaryLogConsumer.scala:152-177): the stateful streaming
    form must agree with committed_mutations(group_by_tx=True)
    column-for-column — one row per committed tx, mutations in binlog
    seq order."""
    from mypipe_spark.changelog import write_changelog
    from mypipe_spark.sources.stream import changelog_stream

    path = str(tmp_path / "clg")
    write_changelog(
        spark, path, num_transactions=25, seed=11, rollback_prob=0.25, num_files=5
    )

    batch_df = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(path)
    expected = {
        (r["txid"], r["ts"], r["n_mutations"], tuple(tuple(m) for m in r["mutations"]))
        for r in committed_mutations(batch_df, group_by_tx=True).collect()
    }

    stream = changelog_stream(spark, path, max_files_per_trigger=2)
    out = tx_group_stream(stream, group_by_tx=True)
    assert out.columns == ["txid", "ts", "n_mutations", "mutations"]
    q = (
        out.writeStream.format("memory")
        .queryName("txgg")
        .option("checkpointLocation", str(tmp_path / "ckptg"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["txid"], r["ts"], r["n_mutations"], tuple(tuple(m) for m in r["mutations"]))
        for r in spark.sql("select * from txgg").collect()
    }
    assert got == expected
    # seq order inside every emitted group
    for _, _, _, muts in got:
        seqs = [m[0] for m in muts]
        assert seqs == sorted(seqs)


def test_tx_group_stream_open_tx_held_back(spark, tmp_path):
    """Mutations of a transaction whose commit hasn't arrived yet must
    NOT be emitted (the reference's position-gating semantics,
    MySQLSpec.scala:91-146)."""
    from datetime import datetime, timedelta

    # hand-build: tx A committed, tx B still open
    rows = []
    for seq, op, tx in [
        (1, "begin", "A"), (2, "insert", "A"), (3, "commit", "A"),
        (4, "begin", "B"), (5, "insert", "B"),  # no commit for B
    ]:
        rows.append(
            {
                "seq": seq, "op": op, "database": "mypipe", "table": "user",
                "table_id": 1, "txid": tx,
                "ts": datetime(2024, 1, 1) + timedelta(seconds=seq),
                "sql": None,
                **{f"{p}_{k}": None for p in ("old", "new") for k in ("bytes", "integers", "strings", "longs")},
            }
        )
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    path = str(tmp_path / "cl2")
    df.coalesce(1).write.parquet(path)

    from mypipe_spark.sources.stream import changelog_stream

    out = tx_group_stream(changelog_stream(spark, path))
    q = (
        out.writeStream.format("memory").queryName("txg2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select seq, txid from txg2").collect()
    assert {r["seq"] for r in got} == {2}
    assert all(r["txid"] == "A" for r in got)
