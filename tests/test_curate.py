"""Curation runner (curate.py) entry guards."""

from __future__ import annotations


def test_run_curation_rejects_append_mode(spark, tmp_path):
    """mode='append' would blend prior runs' rows into the whole-
    directory n_written audit (round-8 review) — refused at entry,
    same rule as compact_write."""
    import pytest

    from mypipe_spark.curate import run_curation

    with pytest.raises(ValueError, match="append"):
        run_curation(
            spark,
            {"sf_dir": "/root/testdata/sf0.001",
             "out_dir": str(tmp_path / "x"), "mode": "append"},
        )
