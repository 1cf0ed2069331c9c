"""SparkSession factory.

Centralizes the configs that matter for correctness (UTC timestamps so
results hash-match the DuckDB oracle) and for scale (AQE, skew-join
handling, partition sizing). Tests and bench share this factory so
every plan is produced under the same settings we would ship to a
1000-executor cluster — only `master` and the partition count change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "mypipe_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Scale notes (these hold at 100 TB, not just locally):
      - AQE on: runtime coalescing of shuffle partitions + skew-join
        splitting replaces hand-tuned partition counts.
      - ``autoBroadcastJoinThreshold`` left at default so dimension
        tables (region/nation/customer at TPC-H ratios) broadcast and
        fact-side joins skip the shuffle entirely.
      - Arrow enabled: every Pandas UDF crosses the JVM/Python boundary
        in columnar batches, never row-at-a-time.
      - UTC session timezone: parquet timestamps compare bit-identically
        with the (UTC-naive) DuckDB oracle.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's post-shuffle coalescing floors partition size at 1 MB
        # by default; a few-MB (compressed) shuffle then collapses to
        # 2-4 partitions and serializes on a many-core executor. 128 KB
        # keeps small/mid shuffles at full parallelism (measured 1.3-3×
        # on the sub-second queries here) and is inert at scale, where
        # bytes-per-task sits far above any of these floors.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "128k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
