"""End-to-end curation pipeline runner — the curation-plane analog of
:mod:`mypipe_spark.runner` (which composes the CDC plane from one
config): documents → funnel verdicts → PII scrub → temperature mix →
training shards, with an audit dict of per-stage counts.

One config dict drives the whole run:

    run_curation(spark, {
        "sf_dir": "/root/testdata/sf0.001",
        "out_dir": "/tmp/shards",
        "budget": 200,                 # temperature-mix doc budget
        "shards_per_stratum": 4,
        "rows_per_file": 100_000,
    })

Scale notes: every stage is the SAME composable core its catalog
query uses (funnel_flags, scrub_documents, mix_select,
write_training_shards) — the runner adds only joins on doc_id
(uniform key, no skew) and the final write. The audit counts are
computed in ONE aggregate over the funnel output plus the final
write-side count, not a count() per stage.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.audit import default_doc_checks  # re-export: runner API
from .plans.catalog import load_tables
from .plans.curation import (
    compaction_plan_for,
    funnel_flags,
    gate_documents,
    mix_select,
    scrub_documents,
)
from .sinks.shards import write_training_shards


class AuditError(RuntimeError):
    """Raised by ``run_curation`` under ``audit_enforce`` when the
    corpus fails its declared constraints; carries the per-check
    violation counts so the caller can log/alert without re-running."""

    def __init__(self, failed: dict[str, int]):
        super().__init__(f"corpus failed constraint audit: {failed}")
        self.failed = failed


def audit_corpus(
    docs: DataFrame, checks, enforce: bool = False
) -> dict[str, int] | None:
    """The runner's pre-stage constraint gate: evaluate ``checks``
    (``"default"`` -> :func:`default_doc_checks`) in ONE extra
    scan-aggregate over the corpus (operators/audit.py) and return
    {check_name: n_violations}. ``enforce=True`` raises
    :class:`AuditError` on any violation BEFORE the pipeline spends
    shuffles on an untrustworthy corpus. No checks declared (None or
    an empty list) and no enforcement skips the gate entirely — zero
    extra jobs; with enforcement, no-checks means the defaults."""
    if not checks and not enforce:
        return None
    from .operators.audit import audit

    if not checks or checks == "default":
        checks = default_doc_checks()
    rows = audit(docs, "documents", checks).collect()
    counts = {r["check_name"]: int(r["n_violations"]) for r in rows}
    failed = {k: v for k, v in counts.items() if v > 0}
    if enforce and failed:
        raise AuditError(failed)
    return counts


def curate(
    docs: DataFrame, budget: int, near_dup: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """The lazy pipeline: (final curated+scrubbed+selected docs,
    funnel flags, near-dup losers or None). Pure plan construction —
    nothing runs until the caller writes/collects.

    The mix ranks over ``kept`` (pre-scrub), not the scrubbed side:
    scrubbing never changes doc_id/lang, so the selection is
    identical, and the mix branch becomes a 2-column
    (doc_id, lang) projection the parquet scan can column-prune
    instead of a second full scrub of the corpus.

    ``near_dup=True`` adds MinHash+LSH near-duplicate removal AFTER
    the funnel (whose duplicate stage is exact-content only) and
    BEFORE the mix: verified pairs (the same production machinery as
    dedup_minhash_lsh) drop their larger doc_id — the pairwise
    keep-smallest rule, deterministic and one pass; full transitive
    canonicalization is the batch dedup_components/keep_best job, not
    an inline ingest stage. Losers are returned so the runner can
    audit the count."""
    flags = funnel_flags(docs)
    kept_ids = flags.filter(F.col("final_keep") == 1).select("doc_id")
    kept = docs.join(kept_ids, "doc_id")
    losers = None
    if near_dup:
        from .plans.dedup import _with_shingle_arrays, minhash_pairs_from_arrays

        losers = (
            minhash_pairs_from_arrays(_with_shingle_arrays(kept))
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        kept = kept.join(losers, "doc_id", "left_anti")
    selected = mix_select(kept.select("doc_id", "lang"), budget=budget).select(
        "doc_id"
    )
    return scrub_documents(kept).join(selected, "doc_id"), flags, losers


def run_curation(
    spark: SparkSession,
    config: dict[str, Any],
    docs: DataFrame | None = None,
    against: DataFrame | None = None,
) -> dict[str, Any]:
    """Run the full curation pipeline per ``config`` and return the
    audit counts: input docs, per-reason drops, kept after funnel,
    selected by the mix, rows written.

    ``docs`` overrides the default ``sf_dir`` corpus — pass e.g.
    ``spark.read.parquet(landed_shards)`` to run the corpus-wide
    stages over a streaming export's output. A corpus without
    ``n_chars`` (the streamed shards drop it) gets the column derived
    from the surviving text, which is exactly the richness signal the
    duplicate resolution ranks on.

    ``against`` adds a cross-corpus dedup pre-stage: rows whose text
    already exists in that (doc_id, text, …) corpus are dropped
    BEFORE the funnel (audited as ``n_corpus_dup``; ``n_input`` then
    counts the surviving docs the funnel actually saw) via the
    Bloom-prefiltered fingerprint join — the continuous-ingest shape
    where today's batch dedups against everything already curated.
    At 100 TB ``against`` is the maintained fingerprint/bitmap
    artifact, not a text rescan.

    ``config["audit_checks"]`` (a Check list, or ``"default"`` for
    :func:`default_doc_checks`) runs the declarative constraint gate
    over the INPUT corpus first — one scan-aggregate, reported under
    ``"constraints"`` in the returned audit; with
    ``config["audit_enforce"]`` any violation raises
    :class:`AuditError` before the pipeline spends a single shuffle
    (the fail-fast an unattended 100 TB ingest wants). With NEITHER
    key configured, a minimal ENFORCED precondition still runs:
    doc_id non-NULL and unique — the funnel's keyed join-backs
    structurally require addressable rows, so violating corpora are
    refused rather than silently diverging the audit; opt out with
    ``audit_checks=[]``."""
    from .plans.dedup import bloom_filter_fresh

    sf_dir = config.get("sf_dir")
    out_dir = config["out_dir"]
    if str(config.get("mode", "error")) in ("append", "ignore"):
        # same whole-directory-audit rule as compact_write: n_written
        # counts EVERY row under out_dir, so appending into a
        # non-empty directory would blend prior runs' rows into this
        # run's audit — and 'ignore' is worse: it silently SKIPS the
        # write and audits the pre-existing directory as this run's
        # output (round-8 review; ignore half closed round-11, the
        # same pair compact_write refuses)
        raise ValueError(
            "run_curation: mode='append'/'ignore' would corrupt the "
            "n_written audit (it counts the whole out_dir); write "
            "each run to its own directory, or use overwrite"
        )
    budget = int(config.get("budget", 200))
    if docs is None:
        docs = load_tables(spark, sf_dir)["documents"]
    if "n_chars" not in docs.columns:
        docs = docs.withColumn("n_chars", F.length("text"))
    checks = config.get("audit_checks")
    if checks is None and "audit_enforce" not in config:
        # Key-integrity PRECONDITION, on by default (round-11 review):
        # the funnel's doc_id-keyed join-backs structurally require
        # addressable rows — a NULL doc_id is counted kept by the
        # flags but silently dropped by the join-back, and a
        # duplicated doc_id multiplies written rows; both diverge
        # n_written from the selection with no audit trace. One
        # scan-aggregate, enforced. Opt out with audit_checks=[]
        # (acknowledging the divergence) or configure the gate
        # explicitly via audit_checks/audit_enforce as before.
        from .operators.audit import not_null, unique_key

        constraints = audit_corpus(
            docs, [not_null("doc_id"), unique_key("doc_id")], enforce=True
        )
    else:
        constraints = audit_corpus(
            docs,
            checks,
            enforce=bool(config.get("audit_enforce", False)),
        )
    n_corpus_dup = None
    fresh = None
    try:
        if against is not None:
            # Row-level and keyless (bloom_filter_fresh): NULL or
            # duplicated doc_ids drop/survive per ROW, so the audit
            # identity n_total == n_corpus_dup + n_input holds exactly.
            # Persisted because every funnel consumer rescans docs.
            n_total = docs.count()
            fresh = bloom_filter_fresh(docs, against).persist()
            n_corpus_dup = n_total - fresh.count()
            docs = fresh
        out = _run_curation_stages(
            spark, config, docs, budget, out_dir, n_corpus_dup
        )
        if constraints is not None:
            out["constraints"] = constraints
        return out
    finally:
        if fresh is not None:
            fresh.unpersist()


def _run_curation_stages(
    spark: SparkSession,
    config: dict[str, Any],
    docs: DataFrame,
    budget: int,
    out_dir: str,
    n_corpus_dup: int | None,
) -> dict[str, int]:
    final, flags, losers = curate(
        docs, budget, near_dup=bool(config.get("near_dup", False))
    )
    # losers embeds the full shingle+MinHash pipeline (the dominant
    # cost) and is consumed by BOTH branches of `final` plus the audit
    # count — Spark does not reuse exchanges across actions/branches
    # (the same rationale as flags.persist below), so materialize the
    # small id set once. Unpersisted in the finally below.
    if losers is not None:
        losers = losers.persist()

    # The flags table feeds three consumers (both join sides inside
    # the write job, plus the audit aggregate below) and Spark does
    # not reuse exchanges across actions or branches — persist the
    # small per-doc flag table once instead of re-running the funnel
    # per consumer. Unpersisted before returning.
    flags.persist()
    try:
        write_training_shards(
            final,
            out_dir,
            stratum=str(config.get("stratum", "lang")),
            key="doc_id",
            shards_per_stratum=int(config.get("shards_per_stratum", 4)),
            rows_per_file=int(config.get("rows_per_file", 100_000)),
            mode=str(config.get("mode", "error")),
        )

        # COALESCE: SUM over zero rows is NULL — an empty corpus must
        # audit as zeros, not crash.
        audit_row = flags.agg(
            F.count("*").alias("n_input"),
            *[
                F.coalesce(F.sum(c), F.lit(0)).alias(f"n_{c}")
                for c in (
                    "drop_source",
                    "drop_quality",
                    "drop_repetition",
                    "drop_duplicate",
                )
            ],
            F.coalesce(F.sum("final_keep"), F.lit(0)).alias("n_kept"),
        ).collect()[0]
        audit = {k: int(v) for k, v in audit_row.asDict().items()}
        if n_corpus_dup is not None:
            audit["n_corpus_dup"] = n_corpus_dup
        if losers is not None:
            # losers derive from the kept set, so this IS the number
            # of funnel survivors the near-dup stage removed
            audit["n_near_dup"] = losers.count()
        # Explicit schema: a run where nothing survived writes only
        # _SUCCESS, and schema inference over zero files would raise.
        audit["n_written"] = (
            spark.read.schema(final.schema).parquet(out_dir).count()
        )
        return audit
    finally:
        flags.unpersist()
        if losers is not None:
            losers.unpersist()


def run_streaming_curation(
    spark: SparkSession,
    stream_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    **shard_kwargs: Any,
):
    """Continuous curation: the stateless gates (quality, repetition)
    and the PII scrub run per-row on a live document stream, and each
    microbatch lands as training shards (append). Returns the started
    StreamingQuery.

    Division of labor at scale: per-row gates/scrub belong ON the
    stream (no state, no watermark); the corpus-wide stages — source
    keep-rates, duplicate resolution, temperature mix — are batch
    jobs over the landed output, because their verdicts depend on the
    whole corpus, not the row:
    ``run_curation(spark, cfg, docs=spark.read.parquet(out_dir))``
    (run_curation re-derives the ``n_chars`` the shards drop).
    foreachBatch reuses write_training_shards verbatim, so batch and
    streaming exports share one layout contract.

    Exactly-once: foreachBatch is at-least-once, and a bare parquet
    append would duplicate a replayed microbatch's rows. Each epoch
    therefore lands under its own ``epoch=<id>`` directory with
    mode=overwrite — a replay rewrites the same directory, so the
    landed corpus is idempotent and still one partition-discoverable
    parquet tree."""
    if "mode" in shard_kwargs:
        raise TypeError(
            "run_streaming_curation owns the write mode (epoch-keyed "
            "overwrite for replay idempotency); 'mode' is not accepted"
        )
    gated = (
        gate_documents(stream_docs)
        .filter(F.col("gate_keep") == 1)
        .select("doc_id", "lang", "source", "text")
    )
    scrubbed = scrub_documents(gated)

    def _write(df: DataFrame, epoch: int) -> None:
        write_training_shards(
            df, f"{out_dir}/epoch={epoch}", mode="overwrite", **shard_kwargs
        )

    return (
        scrubbed.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def audit_stream(
    stream_df: DataFrame,
    table_name: str,
    checks,
    log_dir: str,
    checkpoint_dir: str,
):
    """Continuous constraint auditing: every microbatch is audited
    (operators/audit.py) and its per-check counts land as one small
    parquet audit-log slice. Returns the started StreamingQuery; read
    the log with ``spark.read.parquet(log_dir)`` (partition discovery
    adds the ``epoch`` column).

    ROW-LEVEL rules only, and that restriction is the design: a row
    rule's conditional count is a monoid — per-microbatch partials
    SUM to exactly the whole-corpus audit, however the stream is
    chopped (pinned by test). ``unique_key`` needs a global distinct
    over everything ever seen, which a stateless per-batch audit
    cannot decompose; it is refused loudly rather than silently
    reporting per-batch-only uniqueness. Run key checks as a batch
    audit over the landed corpus instead — the same division of
    labor as run_streaming_curation's corpus-wide stages.

    Exactly-once: same epoch-keyed overwrite contract as
    run_streaming_curation — a replayed microbatch rewrites its own
    ``epoch=<id>`` directory, so summing the log never double-counts.
    """
    from .operators.audit import audit

    if not checks:
        # fail HERE, not asynchronously inside the first microbatch's
        # foreachBatch (which would start the query, create the
        # checkpoint, then die as an opaque StreamingQueryException)
        raise ValueError("audit_stream needs at least one check")
    if checks == "default":
        # the documented sibling spelling (audit_corpus accepts it) —
        # minus the key checks the row-level restriction below refuses
        # (round-11 review: the bare string previously iterated as
        # characters and died with an opaque AttributeError)
        from .operators.audit import default_doc_checks

        checks = [c for c in default_doc_checks() if not c.key_cols]
    elif isinstance(checks, str):
        raise ValueError(
            f"audit_stream: unknown checks spec {checks!r} — pass "
            "'default' or a list of row-level Check objects"
        )
    keyed = [c.name for c in checks if c.key_cols]
    if keyed:
        raise ValueError(
            "audit_stream takes row-level rules only; key-uniqueness "
            f"needs a global distinct (run it as a batch audit): {keyed}"
        )

    def _write(df: DataFrame, epoch: int) -> None:
        audit(df, table_name, checks).write.mode("overwrite").parquet(
            f"{log_dir}/epoch={epoch}"
        )

    return (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# Production default for compact_write: the plan query's 8 KB
# constant is fixture-scale REPORTING; an acting writer defaulting to
# it would shred a real corpus into one object per 8 KB (~130M files
# per TB). 128 MB is the parquet-friendly lake default.
_COMPACT_WRITE_TARGET_BYTES = 128 * 1024 * 1024


def compact_write(
    docs: DataFrame,
    out_dir: str,
    target_bytes: int = _COMPACT_WRITE_TARGET_BYTES,
    mode: str = "overwrite",
) -> dict[str, Any]:
    """Execute the small-file compaction plan: write ``docs`` as
    parquet partitioned by (source, lang) with AT MOST the plan's
    ``n_files`` objects per directory — the acting half of the
    layout_compaction_plan query, built on the SAME
    :func:`compaction_plan_for` core so the written layout can never
    drift from the reported plan. Unlike the reporting query, the
    WRITER defaults to a production 128 MB target (tests pass a small
    target explicitly to exercise the multi-file path).

    Mechanism: each row gets a deterministic file slot
    ``pmod(xxhash64(doc_id), n_files)`` from its partition's plan row
    (the plan is collected ONCE — |partitions| rows of metadata, the
    ANN-query-vector EAGER class — both to derive the total file
    budget and to rebuild the broadcast side, so the corpus is never
    re-aggregated just to size the shuffle), the frame is
    repartitioned on (source, lang, slot) with an EXPLICIT partition
    count of that budget, and the writer's partitionBy splits per
    directory. The explicit count is load-bearing twice: AQE
    coalesces a column-only repartition of small data into one task
    (measured — every slot merges and nothing splits), and it is what
    bounds each directory to at most n_files objects (a task-level
    hash collision between two slots can only LOWER a directory's
    count, never fragment it). Deliberately explicit rather than
    ``maxRecordsPerFile``: records-per-file caps fan small partitions
    into MORE files, the opposite of compaction, and AQE rebalance
    does not see directory boundaries.

    Returns {"n_rows", "n_dirs", "max_files_per_dir"} as the write
    audit, computed METADATA-ONLY: file counts from a recursive
    Hadoop-FileSystem listing and row counts from the parquet FOOTERS
    (``ParquetFileReader.getRecordCount`` — a bounded tail read per
    file), so audit cost scales with the number of written files (the
    quantity compaction itself bounds), never with data volume — no
    second full scan of the output at 100 TB. Both go through the
    Hadoop FS/InputFile APIs resolved from the session's
    configuration, so the audit stays correct on any Hadoop
    filesystem (s3a/hdfs/file), not just a local path.

    ``mode`` is restricted to {"overwrite", "error", "errorifexists"}:
    the audit describes the whole output directory, so ``append``
    would blend pre-existing objects into this write's numbers
    (spurious plan violations, or masked real ones), and ``ignore``
    has the same hazard from the other side — an existing directory
    silently skips the write and the audit would report the OLD
    directory's files as this call's result. NULL source/lang rows
    land in the hive default-partition directories
    (__HIVE_DEFAULT_PARTITION__), mirroring the plan's
    NULL-is-its-own-partition contract."""
    if mode not in ("overwrite", "error", "errorifexists"):
        reason = (
            "append would mix prior writes into the audit"
            if mode == "append"
            else "ignore can silently skip the write and audit a "
            "pre-existing directory as this call's result"
            if mode == "ignore"
            else "unknown save mode"
        )
        raise ValueError(
            f"compact_write audits the whole output directory; mode "
            f"{mode!r} is not allowed ({reason}) — use 'overwrite' or "
            "'error'/'errorifexists' on a fresh directory instead"
        )
    spark = docs.sparkSession
    plan_rows = (
        compaction_plan_for(docs, target_bytes)
        .select(
            F.col("source").alias("_p_src"),
            F.col("lang").alias("_p_lang"),
            "n_files",
        )
        .collect()
    )
    total_files = int(sum(r["n_files"] for r in plan_rows)) or 1
    plan = spark.createDataFrame(
        plan_rows, "_p_src string, _p_lang string, n_files long"
    )
    # null-safe equality: a NULL-source/lang partition HAS a plan row
    # and must find it (the funnel equi-join lesson) — a plain
    # name-join would silently drop NULL partitions to the slot-0
    # fallback
    slotted = (
        docs.join(
            F.broadcast(plan),
            F.col("source").eqNullSafe(F.col("_p_src"))
            & F.col("lang").eqNullSafe(F.col("_p_lang")),
            "left",
        )
        .withColumn(
            "_slot",
            F.pmod(F.xxhash64("doc_id"), F.coalesce("n_files", F.lit(1))),
        )
        .drop("n_files", "_p_src", "_p_lang")
    )
    (
        slotted.repartition(total_files, "source", "lang", "_slot")
        .drop("_slot")
        .write.mode(mode)
        # force STATIC overwrite semantics for THIS write regardless of
        # the session's partitionOverwriteMode: under dynamic overwrite
        # only the partitions present in `docs` are replaced, and the
        # whole-directory audit below would blend earlier writes'
        # surviving partitions into this call's numbers — the same
        # hazard the append/ignore mode guard exists to close
        .option("partitionOverwriteMode", "static")
        .partitionBy("source", "lang")
        .parquet(out_dir)
    )
    # Metadata-only audit: recursive FS listing for the file/dir
    # shape, parquet footers for the row counts. The loop is
    # driver-side over WRITTEN FILES — a population this function
    # just bounded to the plan's total_files, so it cannot grow with
    # data volume the way the previous whole-output re-read did.
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    out_path = jvm.org.apache.hadoop.fs.Path(out_dir)
    fs = out_path.getFileSystem(hconf)
    per_dir: dict[str, int] = {}
    n_rows = 0
    it = fs.listFiles(out_path, True)
    while it.hasNext():
        p = it.next().getPath()
        if not p.getName().endswith(".parquet"):
            continue  # _SUCCESS markers, checksums
        d = p.getParent().toString()
        per_dir[d] = per_dir.get(d, 0) + 1
        reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(
            jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf)
        )
        try:
            n_rows += reader.getRecordCount()
        finally:
            reader.close()
    return {
        "n_rows": n_rows,
        "n_dirs": len(per_dir),
        "max_files_per_dir": max(per_dir.values(), default=0),
    }


def main() -> int:
    import json
    import sys

    from .session import get_spark

    cfg = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    cfg.setdefault("sf_dir", "/root/testdata/sf0.001")
    cfg.setdefault("out_dir", "/tmp/curated_shards")
    cfg.setdefault("mode", "overwrite")
    spark = get_spark("curate")
    audit = run_curation(spark, cfg)
    print(json.dumps(audit))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
