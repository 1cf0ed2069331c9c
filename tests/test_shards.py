"""Training-shard writer contract: round-trip fidelity, stratum-pure
directories, bounded per-file rows, per-file key order, and the
files-per-stratum bound."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq


def test_write_training_shards_contract(spark, sf_dir, tmp_path):
    from mypipe_spark.sinks.shards import write_training_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    write_training_shards(
        docs, out, stratum="lang", key="doc_id",
        shards_per_stratum=3, rows_per_file=40,
    )

    # round-trip: same rows, nothing lost or duplicated (partitionBy
    # moves `lang` into the directory key; the reader restores it)
    back = spark.read.parquet(out)
    want = sorted(map(tuple, docs.select(sorted(docs.columns)).collect()))
    got = sorted(map(tuple, back.select(sorted(docs.columns)).collect()))
    assert got == want

    # stratum-pure directories, nothing outside them
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    dirs = {
        os.path.basename(d)
        for d in glob.glob(f"{out}/lang=*")
        if os.path.isdir(d)
    }
    assert dirs == {f"lang={l}" for l in langs}

    for lang in langs:
        files = glob.glob(f"{out}/lang={lang}/*.parquet")
        assert files, f"no shard files for {lang}"
        # files-per-stratum bound: <= shards * splits (40-row cap)
        n_rows = docs.filter(docs.lang == lang).count()
        import math

        assert len(files) <= 3 * math.ceil(n_rows / 40)
        seen = 0
        for f in files:
            tbl = pq.read_table(f, columns=["doc_id"])
            ids = tbl.column("doc_id").to_pylist()
            assert 0 < len(ids) <= 40            # bounded
            assert ids == sorted(ids)            # per-file key order
            seen += len(ids)
        assert seen == n_rows
