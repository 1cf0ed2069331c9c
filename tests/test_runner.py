from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mypipe_spark.changelog import write_changelog
from mypipe_spark.runner import build_pipes, register_consumer, run_from_config


def test_build_pipes_validation():
    with pytest.raises(KeyError, match="unknown consumer 'nope'"):
        build_pipes({"consumers": {}, "pipes": {"p": {"consumer": "nope"}}})
    with pytest.raises(KeyError, match="unknown consumer type"):
        build_pipes(
            {
                "consumers": {"c": {"type": "marsprobe"}},
                "pipes": {"p": {"consumer": "c"}},
            }
        )


def test_run_from_config_end_to_end(spark, tmp_path):
    src = str(tmp_path / "cl")
    write_changelog(spark, src, num_transactions=12, num_files=2)
    config = {
        "consumers": {"cl": {"type": "changelog", "path": src}},
        "pipes": {
            "cfg_pipe": {
                "consumer": "cl",
                "include-event-condition": "database = 'mypipe' AND table = 'user'",
                "topic-template": "${database}_${table}_generic",
                "producer": {"name": "memory"},
                "checkpoint": str(tmp_path / "ckpt"),
            }
        },
    }
    run_from_config(spark, config, block=True)
    out = spark.sql("select * from cfg_pipe")
    expected = (
        spark.read.parquet(src)
        .filter(F.col("op").isin("insert", "update", "delete"))
        .count()
    )
    assert out.count() == expected
    assert out.select("topic").distinct().collect()[0][0] == "mypipe_user_generic"


def test_run_from_config_tx_grouped(spark, tmp_path):
    src = str(tmp_path / "cl")
    write_changelog(spark, src, num_transactions=8, rollback_prob=0.3, num_files=2)
    config = {
        "consumers": {"cl": {"type": "changelog", "path": src}},
        "pipes": {
            "cfg_tx": {
                "consumer": "cl",
                "group-mutations-by-tx": True,
                "producer": {"name": "memory"},
                "checkpoint": str(tmp_path / "ckpt_tx"),
            }
        },
    }
    run_from_config(spark, config, block=True)
    out = spark.sql("select * from cfg_tx")
    from mypipe_spark.operators.txgroup import committed_mutations

    # the flag means ONE row per committed transaction — compare both
    # the row count and the per-tx mutation counts against the batch
    # grouped form
    expected = committed_mutations(
        spark.read.parquet(src), group_by_tx=True
    )
    assert out.count() == expected.count()
    assert sorted(
        (r["txid"], r["n_mutations"]) for r in out.collect()
    ) == sorted((r["txid"], r["n_mutations"]) for r in expected.collect())


def test_custom_consumer_registration(spark):
    @register_consumer("static_test")
    def static(spark_, conf):  # pragma: no cover - exercised below
        return spark_.readStream.format("rate").option("rowsPerSecond", 1).load()

    pipes = build_pipes(
        {
            "consumers": {"r": {"type": "static_test"}},
            "pipes": {"p": {"consumer": "r", "mutations-only": False}},
        }
    )
    assert len(pipes) == 1 and pipes[0].pipe_id == "p"
