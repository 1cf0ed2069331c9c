from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mypipe_spark.sources.snapshot import (
    Split,
    changelog_resume_position,
    compute_splits,
    integer_splits,
    pick_split_column,
    snapshot_table,
    to_insert_mutations,
)


def test_integer_splits_even_and_remainder():
    # exact division
    s = integer_splits(0, 99, 4)
    assert [(x.lo, x.hi) for x in s] == [(0, 25), (25, 50), (50, 75), (75, None)]
    # remainder spread over the first splits (Sqoop/IntegerSplitter rule)
    s = integer_splits(1, 10, 3)  # span 10 -> 4,3,3
    assert [(x.lo, x.hi) for x in s] == [(1, 5), (5, 8), (8, None)]
    # more splits than values collapses
    s = integer_splits(5, 6, 10)
    assert len(s) == 2
    # predicates are closed-open except the last, which also absorbs
    # NULL keys so the union of splits is total over any column
    assert s[0].predicate("id") == "id >= 5 AND id < 6"
    assert s[1].predicate("id") == "(id >= 6 OR id IS NULL)"


def test_integer_splits_cover_all_values():
    for lo, hi, n in [(0, 999, 7), (-50, 50, 4), (3, 3, 5)]:
        splits = integer_splits(lo, hi, n)
        covered = set()
        for s in splits:
            top = hi + 1 if s.hi is None else s.hi
            covered.update(range(s.lo, top))
        assert covered == set(range(lo, hi + 1))


def test_compute_splits_on_table(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    splits = compute_splits(df, "c_custkey", num_splits=5)
    assert len(splits) == 5
    # every row lands in exactly one split
    total = sum(df.filter(s.predicate("c_custkey")).count() for s in splits)
    assert total == df.count()


def test_compute_splits_all_null(spark):
    df = spark.range(3).select(F.lit(None).cast("long").alias("k"))
    assert compute_splits(df, "k") == [Split(0, None)]
    # ...and that unbounded split actually SELECTS the all-NULL rows:
    # with a bare `k >= 0` predicate the re-snapshot came back empty
    assert df.filter(Split(0, None).predicate("k")).count() == 3


def test_splits_absorb_null_keys(spark):
    """Rows whose split key is NULL must land in (exactly) the final
    split — previously they satisfied no split's predicate and
    vanished from the union."""
    df = spark.createDataFrame(
        [(1,), (5,), (None,), (9,), (None,)], "k int"
    )
    splits = compute_splits(df, "k", num_splits=3)
    total = sum(df.filter(s.predicate("k")).count() for s in splits)
    assert total == df.count()


def test_pick_split_column(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert pick_split_column(df, ["c_custkey"]) == "c_custkey"
    with pytest.raises(ValueError, match="composite"):
        pick_split_column(df, ["c_custkey", "c_name"])
    with pytest.raises(ValueError, match="non-integer"):
        pick_split_column(df, ["c_name"])


def test_to_insert_mutations_bucketing(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    snap = to_insert_mutations(
        snapshot_table(cust, "c_custkey", num_splits=4), "tpch", "customer", 7
    )
    assert snap.count() == cust.count()
    row = snap.limit(1).collect()[0]
    assert row["op"] == "insert" and row["database"] == "tpch"
    assert row["ts"].year == 1970  # InsertMutation(ts=0) semantics
    # bigint -> longs map; int -> integers; string -> strings;
    # double (c_acctbal) dropped like unsupported types in the reference
    assert "c_custkey" in row["new_longs"]
    assert "c_nationkey" in row["new_integers"]
    assert "c_name" in row["new_strings"] and "c_mktsegment" in row["new_strings"]
    assert row["new_bytes"] is None


def test_changelog_resume_position(spark, tmp_path):
    from mypipe_spark.changelog import write_changelog

    path = str(tmp_path / "cl")
    write_changelog(spark, path, num_transactions=5, num_files=2)
    pos = changelog_resume_position(spark, path)
    mx = spark.read.parquet(path).agg(F.max("seq")).collect()[0][0]
    assert pos == mx > 0


def test_to_insert_mutations_full_canonical_columns(spark):
    """Snapshot mutations must carry the FULL canonical change-event
    column set (seq and sql included) so they union with a live
    changelog stream and flow through tx grouping unchanged — the
    module's bootstrap contract. Previously seq/sql were missing and
    unionByName / tx grouping raised AnalysisException."""
    from mypipe_spark.changelog import changelog_df
    from mypipe_spark.model import CHANGE_EVENT_SCHEMA
    from mypipe_spark.operators.txgroup import committed_mutations
    from mypipe_spark.sources.snapshot import to_insert_mutations

    src = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, name string"
    )
    snap = to_insert_mutations(
        src, database="mypipe", table="t",
        extra_strings={"source": F.lit("snap")},
    )
    assert set(snap.columns) == set(CHANGE_EVENT_SCHEMA.fieldNames())
    rows = snap.collect()
    assert all(r["seq"] == 0 and r["sql"] is None for r in rows)
    assert all(r["new_strings"]["source"] == "snap" for r in rows)

    # preload + live stream through the same pipe: union then tx-group
    live = changelog_df(spark, num_transactions=2)
    unioned = snap.unionByName(live)
    grouped = committed_mutations(unioned)
    assert grouped.count() > 0


def test_generic_bucket_table_matches_snapshot_bucketing():
    """model.GENERIC_BUCKET_FOR_TYPE documents the envelope bucketing;
    it must agree with what to_insert_mutations actually does (bucket
    by spark_type_for's Spark type) — a divergent table would steer
    future wire code into the wrong typed map. MySQL LONG (the 4-byte
    INT) materializes as LongType and buckets to 'longs': the
    reference wire widens LONG values to java.lang.Long and ships
    them in the longs map (KafkaGenericAvroSerializer.scala:94-104),
    so reference-format consumers look INT columns up there."""
    from mypipe_spark.model import (
        BUCKET_SIMPLE_TYPES,
        GENERIC_BUCKET_FOR_TYPE,
        spark_type_for,
    )

    # to_insert_mutations and the Debezium adapter both bucket by
    # simpleString membership in BUCKET_SIMPLE_TYPES (one shared
    # taxonomy since round 10), so the agreement to pin is between
    # model's two tables, joined through spark_type_for
    def bucket_of(spark_type) -> str | None:
        st = spark_type.simpleString()
        for bucket, simples in BUCKET_SIMPLE_TYPES.items():
            if st in simples:
                return bucket
        return None

    for ct, bucket in GENERIC_BUCKET_FOR_TYPE.items():
        assert bucket_of(spark_type_for(ct)) == bucket, ct


def test_generic_bucket_matches_reference_wire_format():
    """Reference-envelope interop pin: the four binlog types the
    reference serializer actually handles must land in the exact maps
    its consumers read (KafkaGenericAvroSerializer.scala:80-115 —
    INT24 → integers, VARCHAR → strings, LONG → longs via
    Integer→Long widening, VAR_STRING → bytes)."""
    from mypipe_spark.model import GENERIC_BUCKET_FOR_TYPE

    assert GENERIC_BUCKET_FOR_TYPE["INT24"] == "integers"
    assert GENERIC_BUCKET_FOR_TYPE["VARCHAR"] == "strings"
    assert GENERIC_BUCKET_FOR_TYPE["LONG"] == "longs"
    assert GENERIC_BUCKET_FOR_TYPE["VAR_STRING"] == "bytes"


def test_extra_strings_collision_guard_covers_all_buckets(spark):
    """The plan-time collision guard must catch an extra_strings key
    shadowing ANY typed-map column, not just string ones (round-8
    review: an int-column collision sailed past the guard and
    render_sql's map_concat threw DUPLICATED_MAP_KEY mid-job)."""
    import pytest

    from mypipe_spark.sources.snapshot import to_insert_mutations

    df = spark.createDataFrame(
        [(1, 10, "a")], "id int, n bigint, name string"
    )
    for col in ("id", "n", "name"):
        with pytest.raises(ValueError, match="collide"):
            to_insert_mutations(
                df, "db", "t", extra_strings={col: F.lit("x")}
            )


def test_unbucketed_to_strings_matches_debezium_key_set(spark):
    """Cross-source consistency opt-in (round-8 review): with
    unbucketed_to_strings=True a snapshot preload buckets a double
    column into new_strings exactly like the Debezium adapter's
    string-fallback, so keyed state bootstrapped from the snapshot
    and maintained by CDC agrees on every row's key set. Default
    stays the reference's drop rule."""
    df = spark.createDataFrame(
        [(1, 2.5, "x")], "id int, score double, name string"
    )
    from mypipe_spark.sources.snapshot import to_insert_mutations

    dropped = to_insert_mutations(df, "db", "t").collect()[0]
    assert "score" not in (dropped["new_strings"] or {})
    kept = to_insert_mutations(
        df, "db", "t", unbucketed_to_strings=True
    ).collect()[0]
    assert kept["new_strings"]["score"] == "2.5"
    assert kept["new_strings"]["name"] == "x"
    assert kept["new_integers"] == {"id": 1}
