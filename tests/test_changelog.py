from __future__ import annotations

from pyspark.sql import functions as F

from mypipe_spark.changelog import ChangeLogGenerator, changelog_df
from mypipe_spark.model import CHANGE_EVENT_SCHEMA


def test_generator_deterministic():
    a = ChangeLogGenerator(seed=42).generate(10)
    b = ChangeLogGenerator(seed=42).generate(10)
    assert a == b
    c = ChangeLogGenerator(seed=7).generate(10)
    assert a != c


def test_tx_structure():
    events = ChangeLogGenerator(seed=42).generate(20)
    # every tx starts with begin and ends with commit/rollback
    ops = [e["op"] for e in events]
    assert ops[0] == "begin"
    assert ops[-1] in ("commit", "rollback")
    # seq strictly increasing
    seqs = [e["seq"] for e in events]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    # mutations carry the enclosing txid
    txid = events[0]["txid"]
    assert txid is not None
    assert events[1]["txid"] == txid


def test_changelog_df_schema(spark):
    df = changelog_df(spark, num_transactions=5)
    assert df.schema == CHANGE_EVENT_SCHEMA
    n = df.count()
    assert n > 10
    kinds = {r["op"] for r in df.select("op").distinct().collect()}
    assert "insert" in kinds and "begin" in kinds and "commit" in kinds
    # inserts have after-image, deletes have before-image only
    ins = df.filter(F.col("op") == "insert").limit(1).collect()[0]
    assert ins["new_integers"] is not None and ins["old_integers"] is None
