"""Training-shard parquet writer — the export side of the curation
plane.

A training pipeline does not end at a DataFrame: the curated corpus
must land as partitioned, bounded-size, internally-ordered parquet
shards that a data loader can stream deterministically. This module
is that sink, expressed entirely through Spark's native writer (no
custom commit protocol): Catalyst handles the scan/filter upstream,
the shuffle lays rows out by (stratum, shard), and
``maxRecordsPerFile`` bounds every file.

Scale design (the part that must survive 100 TB):
- the pre-write ``repartition(n, stratum, shard)`` keys on BOTH the
  stratum and a hash-derived shard id, so a skewed stratum (English
  is most of a real corpus) spreads over ``shards_per_stratum``
  writer tasks instead of hot-spotting one;
- ``sortWithinPartitions`` gives per-file key order without any
  global sort (a global orderBy would be a full-corpus range
  exchange);
- ``maxRecordsPerFile`` caps file size irrespective of partition
  sizing, so loader-side memory is bounded;
- the writer claims NO exact file count or stable file boundaries:
  row→shard-ID assignment is deterministic (xxhash64 of the key),
  but which task writes which (stratum, shard) groups — and hence
  the file layout — depends on the session's shuffle-partition
  count and AQE coalescing, so two sessions with different configs
  produce different file sets over the same rows. The contract a
  loader may rely on is: bounded per-file rows, stratum-pure
  directories, and per-file key order. Rerunning under the SAME
  session config is file-for-file reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    stratum: str = "lang",
    key: str = "doc_id",
    shards_per_stratum: int = 4,
    rows_per_file: int = 100_000,
    mode: str = "error",
) -> None:
    """Write ``df`` as ``path/<stratum>=<v>/part-*.parquet`` training
    shards: every file holds at most ``rows_per_file`` rows of one
    stratum, sorted by ``key``; rows map to shards by
    ``xxhash64(key) % shards_per_stratum`` (deterministic across
    reruns and cluster sizes)."""
    if shards_per_stratum < 1:
        raise ValueError("shards_per_stratum must be >= 1")
    # internal column name derived to be ABSENT from df: a caller
    # column literally named '__shard' would otherwise be silently
    # overwritten and then dropped from the written shards
    shard_col = "__shard"
    while shard_col in df.columns:
        shard_col += "_"
    shard = F.pmod(F.xxhash64(F.col(key)), F.lit(shards_per_stratum))
    (
        df.withColumn(shard_col, shard)
        # hash-partition on (stratum, shard) at the session's default
        # shuffle parallelism: strata*shards groups spread over the
        # cluster, never a fixed task count that would serialize the
        # export (shards_per_stratum bounds files per stratum, not
        # writer parallelism)
        .repartition(F.col(stratum), F.col(shard_col))
        .sortWithinPartitions(stratum, key)
        .drop(shard_col)
        .write.partitionBy(stratum)
        .option("maxRecordsPerFile", rows_per_file)
        # pin static overwrite regardless of the session's
        # partitionOverwriteMode: under dynamic overwrite a rerun over
        # a corpus missing a stratum would leave the prior run's
        # partition in place, blending runs in the directory (and in
        # run_curation's whole-directory n_written audit) — same pin
        # as compact_write (round-11 review)
        .option("partitionOverwriteMode", "static")
        .mode(mode)
        .parquet(path)
    )
