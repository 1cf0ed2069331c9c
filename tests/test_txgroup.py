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


def test_tx_stream_subsecond_commit_ts_exact(spark, tmp_path):
    """Commit timestamps with sub-second precision must round-trip the
    state machine exactly: the old epoch-seconds double ride truncated
    8.7 s to .699999 (double fraction is below 8.7), silently breaking
    stream==batch parity. Timestamps now cross as integer micros."""
    from datetime import datetime, timedelta

    from mypipe_spark.sources.stream import changelog_stream

    epoch = datetime(2024, 1, 15, 10, 0, 0)

    def ev(seq, op, txid, micros):
        return {
            "seq": seq, "op": op, "database": "mypipe", "table": "user",
            "table_id": 1, "txid": txid,
            "ts": epoch + timedelta(microseconds=micros),
            "sql": None,
            "old_integers": None, "old_longs": None, "old_strings": None,
            "old_bytes": None,
            "new_integers": {"id": seq}, "new_longs": None,
            "new_strings": None, "new_bytes": None,
        }

    rows = [
        ev(1, "begin", "tx1", 8_100_000),
        ev(2, "insert", "tx1", 8_200_000),
        ev(3, "commit", "tx1", 8_700_000),  # .7 s — the truncation case
    ]
    src = str(tmp_path / "subsec")
    spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).coalesce(1).write.parquet(src)

    batch_ts = {
        r["ts"]
        for r in committed_mutations(
            spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(src)
        ).collect()
    }
    assert batch_ts == {epoch + __import__("datetime").timedelta(microseconds=8_700_000)}

    out = tx_group_stream(changelog_stream(spark, src))
    q = (
        out.writeStream.format("memory").queryName("subsec")
        .option("checkpointLocation", str(tmp_path / "ck_subsec"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got_ts = {r["ts"] for r in spark.sql("select ts from subsec").collect()}
    assert got_ts == batch_ts  # exactly .700000, not .699999


def test_tx_stream_midbatch_rollback_sequencing(spark, tmp_path):
    """Controls must apply in seq order WITHIN a microbatch: with
    [m1, m2, rollback, m3, commit] for one txid arriving in a single
    batch, only m3 commits — a last-control-wins fold would flush the
    rolled-back m1/m2, and the result would depend on how the stream
    happened to be chunked."""
    from datetime import datetime, timedelta

    from mypipe_spark.sources.stream import changelog_stream

    epoch = datetime(2024, 1, 15, 10, 0, 0)

    def ev(seq, op):
        return {
            "seq": seq, "op": op, "database": "mypipe", "table": "user",
            "table_id": 1, "txid": "txr",
            "ts": epoch + timedelta(seconds=seq), "sql": None,
            "old_integers": None, "old_longs": None, "old_strings": None,
            "old_bytes": None,
            "new_integers": {"id": seq}, "new_longs": None,
            "new_strings": None, "new_bytes": None,
        }

    rows = [
        ev(1, "insert"), ev(2, "insert"), ev(3, "rollback"),
        ev(4, "insert"), ev(5, "commit"),
    ]
    src = str(tmp_path / "midroll")
    spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).coalesce(1).write.parquet(src)

    # one file + no trigger cap -> the whole sequence lands in ONE batch
    out = tx_group_stream(
        changelog_stream(spark, src, max_files_per_trigger=None)
    )
    q = (
        out.writeStream.format("memory").queryName("midroll")
        .option("checkpointLocation", str(tmp_path / "ck_midroll"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["seq"] for r in spark.sql("select seq from midroll").collect())
    assert got == [4]  # m1/m2 rolled back, only m3 (seq 4) committed


def test_snapshot_preload_flows_through_tx_grouping(spark, sf_dir, tmp_path):
    """sources/snapshot.py's contract: preload rows (txid NULL,
    committed by construction) union with a changelog and flow through
    tx grouping — they must pass through committed_mutations AND
    tx_group_stream instead of vanishing into the commit join."""
    from mypipe_spark.sources.snapshot import to_insert_mutations
    from mypipe_spark.sources.stream import changelog_stream

    snap = to_insert_mutations(
        spark.read.parquet(f"{sf_dir}/customer.parquet").limit(20),
        "mypipe", "customer", table_id=7,
    )
    cl = changelog_df(spark, num_transactions=5, rollback_prob=0.0)
    union = cl.unionByName(snap)

    # batch: per-mutation and grouped forms both carry the preload
    per_mut = committed_mutations(union)
    assert per_mut.filter("txid IS NULL").count() == 20
    grouped = committed_mutations(union, group_by_tx=True)
    singles = grouped.filter("txid IS NULL")
    assert singles.count() == 20
    assert singles.filter("n_mutations = 1").count() == 20

    # streaming: same union through the stateful form — one seq-ordered
    # file (the changelog source contract is commit-order delivery; a
    # commit seen before its mutations would flush nothing)
    src = str(tmp_path / "snapcl")
    union.orderBy("seq", "txid").coalesce(1).write.parquet(src)
    out = tx_group_stream(changelog_stream(spark, src))
    q = (
        out.writeStream.format("memory").queryName("snapcl")
        .option("checkpointLocation", str(tmp_path / "ck_snapcl"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from snapcl")
    assert got.filter("txid IS NULL").count() == 20
    assert got.count() == per_mut.count()


def test_committed_mutations_respects_rollback_commit_order(spark):
    """The batch form is sequence-aware like the stateful twin
    (round-8 review: the old commit-marker inner join emitted
    ROLLED-BACK mutations whenever their txid later committed): with
    [ins 1, ins 2, rollback 3, ins 4, commit 5] only seq 4 survives,
    stamped with commit 5's ts; and a txid with TWO commits flushes
    two groups, each restamped with its own commit."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)

    def ev(seq, op, ts, txid="T"):
        return {
            "seq": seq, "op": op, "database": "d", "table": "t",
            "table_id": 1, "txid": txid, "ts": ts, "sql": None,
            "old_bytes": None, "old_integers": None, "old_strings": None,
            "old_longs": None, "new_bytes": None, "new_integers": None,
            "new_strings": None, "new_longs": None,
        }

    df = spark.createDataFrame(
        [
            ev(1, "insert", t(1)), ev(2, "insert", t(2)),
            ev(3, "rollback", t(3)), ev(4, "insert", t(4)),
            ev(5, "commit", t(5)),
            # second flush in the same txid
            ev(6, "insert", t(6)), ev(7, "commit", t(7)),
        ],
        CHANGE_EVENT_SCHEMA,
    )
    out = committed_mutations(df).select("seq", "ts", "event_ts").collect()
    got = sorted((r["seq"], r["ts"], r["event_ts"]) for r in out)
    assert got == [(4, t(5), t(4)), (6, t(7), t(6))]

    grouped = committed_mutations(df, group_by_tx=True).collect()
    flushes = sorted(
        (r["ts"], [m["seq"] for m in r["mutations"]]) for r in grouped
    )
    assert flushes == [(t(5), [4]), (t(7), [6])]
