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


def test_stamp_increasing_mtimes_segments_never_interleave(spark, tmp_path):
    """Multi-segment stamping (round-8 review): stamps reach up to
    N-1 s into the future, so a second segment stamped moments later
    previously started BELOW the first's tail and replayed out of
    order. With the monotonic baseline + explicit ``files``, every
    new-segment stamp lands strictly above every untouched file."""
    import glob
    import os

    from mypipe_spark.changelog import stamp_increasing_mtimes, write_changelog

    src = str(tmp_path / "cl")
    write_changelog(spark, src, num_transactions=6, num_files=6)
    stamp_increasing_mtimes(src)
    first = set(glob.glob(src + "/part-*.parquet"))
    max_first = max(os.path.getmtime(f) for f in first)

    write_changelog(
        spark, str(tmp_path / "cl2"), num_transactions=3, num_files=3,
        seed=9, seq_start=10_000,
    )
    import shutil

    new = []
    for f in glob.glob(str(tmp_path / "cl2") + "/part-*.parquet"):
        dst = src + "/part-seg2-" + os.path.basename(f)[5:]
        shutil.copy(f, dst)
        new.append(dst)
    stamp_increasing_mtimes(src, files=new)
    assert min(os.path.getmtime(f) for f in new) > max_first
    # the first segment's stamps were left untouched
    assert max(os.path.getmtime(f) for f in first) == max_first
