"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every operator registered in
``mypipe_spark.plans`` (SURVEY.md §2 inventory re-expressed Spark-first
plus the training-data-pipeline surface); ``oracle_sql()`` the DuckDB
twin of each SQL-expressible one. ``tools/check_oracle.py`` replays the
driver's comparison locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the q5-style star
    join (broadcast dims + single fact shuffle + exact-decimal agg)."""
    from mypipe_spark.plans.catalog import all_queries

    return all_queries()["q5_nation_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mypipe_spark.plans.catalog import all_queries

    # driver=False filters the four engine-specific sketch originals
    # (HLL estimate / GK percentiles / xxhash simhash) whose output the
    # harness structurally cannot oracle — each is still a registered
    # library+bench+pytest surface, and its oracle-bearing `_check`
    # tolerance twin (sketch vs exact ground truth, hash-verified)
    # carries the external correctness contract here.
    return {
        name: qd.fn for name, qd in all_queries().items() if qd.driver
    }


def oracle_sql() -> dict[str, str]:
    from mypipe_spark.plans.catalog import all_queries

    return {
        name: qd.oracle
        for name, qd in all_queries().items()
        if qd.oracle is not None
    }
