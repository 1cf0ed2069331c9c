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


def test_run_curation_end_to_end(spark, sf_dir, tmp_path):
    """The config-driven curation runner: funnel drops what the funnel
    says, the mix respects per-language targets, the written shards
    are exactly the selected scrubbed docs, and the audit adds up."""
    from mypipe_spark.curate import run_curation
    from mypipe_spark.plans.catalog import all_queries

    out = str(tmp_path / "curated")
    audit = run_curation(
        spark,
        {"sf_dir": sf_dir, "out_dir": out, "budget": 120,
         "shards_per_stratum": 2, "rows_per_file": 50},
    )
    funnel = all_queries()["curation_funnel"].fn(spark, sf_dir).collect()
    n_kept = sum(r["final_keep"] for r in funnel)
    assert audit["n_input"] == len(funnel)
    assert audit["n_kept"] == n_kept
    assert 0 < audit["n_written"] <= min(n_kept, 120 + 10)
    back = spark.read.parquet(out)
    # written rows are a subset of kept doc_ids, scrubbed schema
    kept_ids = {r["doc_id"] for r in funnel if r["final_keep"] == 1}
    written_ids = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert written_ids <= kept_ids
    assert audit["n_written"] == len(written_ids)
    assert {"doc_id", "lang", "source", "text", "n_email"} <= set(back.columns)
    # mix determinism: re-running into a second dir writes the same ids
    out2 = str(tmp_path / "curated2")
    audit2 = run_curation(
        spark,
        {"sf_dir": sf_dir, "out_dir": out2, "budget": 120,
         "shards_per_stratum": 2, "rows_per_file": 50},
    )
    ids2 = {r["doc_id"] for r in spark.read.parquet(out2).select("doc_id").collect()}
    assert ids2 == written_ids and audit2 == audit


def test_run_curation_zero_survivors(spark, tmp_path):
    """A corpus where nothing passes the funnel must audit as zeros —
    not crash on schema inference over a data-file-less write or on
    NULL aggregate sums (review regression)."""
    import mypipe_spark.curate as cur

    docs = spark.createDataFrame(
        [(i, "en", "src0", "too short", 9) for i in range(5)],
        "doc_id int, lang string, source string, text string, n_chars int",
    )
    real = cur.load_tables
    try:
        cur.load_tables = lambda spark, sf_dir: {"documents": docs}
        audit = cur.run_curation(
            spark, {"sf_dir": "x", "out_dir": str(tmp_path / "empty_out")}
        )
    finally:
        cur.load_tables = real
    assert audit["n_kept"] == 0 and audit["n_written"] == 0
    assert audit["n_input"] == 5 and audit["n_drop_quality"] == 5


def test_streaming_curation_matches_batch_gates(spark, sf_dir, tmp_path):
    """run_streaming_curation lands exactly the rows the batch
    gate+scrub pipeline produces, in the same shard layout contract."""
    import os

    from pyspark.sql import functions as F

    from mypipe_spark.curate import run_streaming_curation
    from mypipe_spark.plans.curation import gate_documents, scrub_documents

    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    os.symlink(f"{sf_dir}/documents.parquet", src_dir / "documents.parquet")
    stream_docs = spark.readStream.schema(batch_docs.schema).parquet(str(src_dir))
    out = str(tmp_path / "stream_shards")
    from conftest import drain_stream

    q = run_streaming_curation(
        spark, stream_docs, out, str(tmp_path / "ckpt"),
        shards_per_stratum=2, rows_per_file=50,
    )
    drain_stream(q)
    want = sorted(
        map(
            tuple,
            scrub_documents(
                gate_documents(batch_docs)
                .filter(F.col("gate_keep") == 1)
                .select("doc_id", "lang", "source", "text")
            ).collect(),
        )
    )
    back = spark.read.parquet(out)
    cols = scrub_documents(batch_docs).columns
    got = sorted(map(tuple, back.select(cols).collect()))
    assert got == want and len(got) > 0


def test_batch_curation_over_landed_stream_shards(spark, sf_dir, tmp_path):
    """The documented division of labor actually composes: run the
    corpus-wide stages (run_curation) over a streaming export's
    landed shards — n_chars is re-derived, nothing crashes, and the
    audit is over exactly the landed rows."""
    import os

    from conftest import drain_stream
    from mypipe_spark.curate import run_curation, run_streaming_curation

    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    os.symlink(f"{sf_dir}/documents.parquet", src_dir / "documents.parquet")
    stream_docs = spark.readStream.schema(batch_docs.schema).parquet(str(src_dir))
    landed = str(tmp_path / "landed")
    drain_stream(
        run_streaming_curation(
            spark, stream_docs, landed, str(tmp_path / "ckpt"),
            shards_per_stratum=2, rows_per_file=100,
        )
    )
    shards = spark.read.parquet(landed)
    audit = run_curation(
        spark,
        {"out_dir": str(tmp_path / "final"), "budget": 50},
        docs=shards.select("doc_id", "lang", "source", "text"),
    )
    assert audit["n_input"] == shards.count()
    # the stream already applied the quality/repetition gates
    assert audit["n_drop_quality"] == 0 and audit["n_drop_repetition"] == 0
    assert 0 < audit["n_written"] <= audit["n_kept"]


def test_run_curation_against_corpus_dedup(spark, sf_dir, tmp_path):
    """The cross-corpus dedup pre-stage: against the corpus ITSELF
    every non-NULL text is already known (all dropped before the
    funnel, audited), while against a disjoint corpus nothing drops
    and the rest of the audit is bit-identical to the baseline run."""
    from pyspark.sql import functions as F

    from mypipe_spark.curate import run_curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = {"sf_dir": sf_dir, "budget": 120, "shards_per_stratum": 2,
           "rows_per_file": 50}
    base = run_curation(spark, {**cfg, "out_dir": str(tmp_path / "o1")})

    audit_self = run_curation(
        spark, {**cfg, "out_dir": str(tmp_path / "o2")}, against=docs
    )
    n_nonnull = docs.filter(F.col("text").isNotNull()).count()
    assert audit_self["n_corpus_dup"] == n_nonnull
    assert audit_self["n_input"] == docs.count() - n_nonnull
    assert audit_self["n_written"] == 0

    other = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("~never-matches")).alias("text"),
    )
    audit_disjoint = run_curation(
        spark, {**cfg, "out_dir": str(tmp_path / "o3")}, against=other
    )
    assert audit_disjoint.pop("n_corpus_dup") == 0
    assert audit_disjoint == base


def test_against_corpus_dedup_is_row_level_and_keyless(spark, tmp_path):
    """Audit-integrity edges from the review: a NULL-doc_id fresh row
    must SURVIVE to the funnel, a NULL-doc_id dup row must drop and
    be audited, and a doc_id appearing twice (one text a corpus dup,
    one fresh) drops exactly the dup ROW — so
    n_total == n_corpus_dup + n_input holds exactly."""
    from mypipe_spark.curate import run_curation

    good = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away to the quiet river bank before dusk %s")
    corpus = spark.createDataFrame(
        [(1, "en", "s0", good % "one", 100)],
        "doc_id long, lang string, source string, text string, n_chars long",
    )
    docs = spark.createDataFrame(
        [
            (None, "en", "s0", good % "two", 100),   # NULL id, fresh
            (None, "en", "s0", good % "one", 100),   # NULL id, corpus dup
            (7, "en", "s0", good % "one", 100),      # dup text
            (7, "en", "s0", good % "three", 100),    # same id, fresh text
            (8, "en", "s0", good % "four", 100),     # plain fresh
        ],
        "doc_id long, lang string, source string, text string, n_chars long",
    )
    audit = run_curation(
        spark,
        # audit_checks=[]: this corpus DELIBERATELY carries NULL and
        # duplicate doc_ids to pin the against-dedup's row-level
        # keyless behavior — opt out of the round-11 default
        # key-integrity gate that (correctly) refuses such a corpus
        {
            "out_dir": str(tmp_path / "o"), "budget": 10,
            "mode": "overwrite", "audit_checks": [],
        },
        docs=docs,
        against=corpus.select("doc_id", "text"),
    )
    assert audit["n_corpus_dup"] == 2
    assert audit["n_input"] == 3


def test_run_curation_audit_gate_records_and_enforces(spark, sf_dir, tmp_path):
    """The constraint gate: a clean corpus records all-zero
    violation counts; a corpus with NULL/duplicate doc_ids and a
    lying n_chars is refused under audit_enforce BEFORE any shard is
    written, with the per-check counts on the exception."""
    import os

    import pytest

    from mypipe_spark.curate import AuditError, run_curation

    cfg = {"sf_dir": sf_dir, "budget": 50, "audit_checks": "default"}
    audit = run_curation(spark, {**cfg, "out_dir": str(tmp_path / "clean")})
    assert set(audit["constraints"]) == {
        "not_null(doc_id)", "unique_key(doc_id)", "not_null(text)",
        "n_chars_matches_text",
    }
    assert all(v == 0 for v in audit["constraints"].values())

    dirty = spark.createDataFrame(
        [
            (1, "the of to and in a solid document body here", "en", "s", 43),
            (1, "the of to and in a solid document body here", "en", "s", 43),
            (None, "the of to and in another document body goes", "en", "s", 43),
            (4, None, "en", "s", 10),
            (5, "the of to and in text with lying char count", "en", "s", 999),
        ],
        "doc_id int, text string, lang string, source string, n_chars int",
    )
    out = tmp_path / "refused"
    with pytest.raises(AuditError) as ei:
        run_curation(
            spark,
            {**cfg, "out_dir": str(out), "audit_enforce": True},
            docs=dirty,
        )
    assert ei.value.failed == {
        "not_null(doc_id)": 1,
        "unique_key(doc_id)": 1,
        "not_null(text)": 1,
        "n_chars_matches_text": 1,
    }
    assert not os.path.exists(out)  # refused before any write

    # record-only mode still runs the pipeline and reports the counts
    audit2 = run_curation(
        spark, {**cfg, "out_dir": str(tmp_path / "recorded")}, docs=dirty
    )
    assert audit2["constraints"] == ei.value.failed
    assert audit2["n_written"] >= 0


def test_run_curation_near_dup_stage(spark, tmp_path):
    """near_dup=True removes MinHash-verified near-duplicates the
    exact-content funnel stage cannot see: two long docs differing in
    one word collapse to the smaller doc_id, audited as n_near_dup;
    the same corpus without the flag keeps both."""
    from mypipe_spark.curate import run_curation

    base = (
        "the a of to and in quick brown fox jumps over the lazy dog and "
        "then runs far away across the of to in wide open field tonight "
    ) * 2
    rows = [
        (1, base + "ending one", "en", "s0"),
        (2, base + "ending two", "en", "s0"),       # near-dup of 1
        (3, "the a of to and in a completely different and much "
            "shorter but still acceptable quality document body here "
            "with plenty of the to and of in words", "en", "s0"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id int, text string, lang string, source string"
    )
    cfg = {"budget": 50, "shards_per_stratum": 1, "mode": "overwrite"}
    plain = run_curation(
        spark, {**cfg, "out_dir": str(tmp_path / "plain")}, docs=docs
    )
    assert "n_near_dup" not in plain
    assert plain["n_kept"] == 3

    nd = run_curation(
        spark,
        {**cfg, "out_dir": str(tmp_path / "nd"), "near_dup": True},
        docs=docs,
    )
    assert nd["n_near_dup"] == 1
    out = spark.read.parquet(str(tmp_path / "nd"))
    kept_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 2 not in kept_ids and 1 in kept_ids and 3 in kept_ids


def test_streaming_audit_and_curation_compose_on_one_stream(
    spark, sf_dir, tmp_path
):
    """Composition pin: the SAME live document stream feeds BOTH the
    constraint audit log (audit_stream) and the curation export
    (run_streaming_curation) as two independent sinks, and the books
    reconcile — the audit log's summed n_rows equals the corpus size
    (every row was audited, however the microbatches chopped), its
    violation counts equal the one-shot batch audit, and the landed
    shard count equals the batch gate's keep count. The operational
    shape: trust-monitoring rides beside the export, never inside
    it."""
    import os

    from pyspark.sql import functions as F

    from conftest import drain_stream
    from mypipe_spark.curate import audit_stream, run_streaming_curation
    from mypipe_spark.operators.audit import audit, default_doc_checks
    from mypipe_spark.plans.curation import gate_documents

    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    os.symlink(f"{sf_dir}/documents.parquet", src_dir / "documents.parquet")

    def stream():
        return spark.readStream.schema(batch_docs.schema).parquet(str(src_dir))

    row_checks = [c for c in default_doc_checks() if not c.key_cols]
    q1 = audit_stream(
        stream(), "documents", row_checks,
        str(tmp_path / "auditlog"), str(tmp_path / "ckpt_audit"),
    )
    q2 = run_streaming_curation(
        spark, stream(), str(tmp_path / "shards"),
        str(tmp_path / "ckpt_cur"), shards_per_stratum=2,
    )
    # a raising q1 drain must still stop q2 — two live queries, one
    # shared session fixture (drain_stream's own leak contract)
    try:
        drain_stream(q1)
    finally:
        drain_stream(q2)

    log = spark.read.parquet(str(tmp_path / "auditlog"))
    audited_rows = log.groupBy("check_name").agg(
        F.sum("n_rows").alias("rows"), F.sum("n_violations").alias("viol")
    )
    got = {r["check_name"]: (r["rows"], r["viol"]) for r in audited_rows.collect()}
    n_total = batch_docs.count()
    want = {
        r["check_name"]: (n_total, r["n_violations"])
        for r in audit(batch_docs, "documents", row_checks).collect()
    }
    assert got == want
    n_landed = spark.read.parquet(str(tmp_path / "shards")).count()
    n_keep = (
        gate_documents(batch_docs).filter(F.col("gate_keep") == 1).count()
    )
    assert n_landed == n_keep > 0


def test_compact_write_obeys_the_plan(spark, sf_dir, tmp_path):
    """compact_write must land at most the plan's n_files parquet
    objects in every (source, lang) directory and round-trip every
    row. Run at a target small enough that several partitions plan
    multiple files (the fixture's directories fit one file at the
    default target, which would leave the multi-file slotting path
    untested), and assert the multi-file case actually materializes."""
    from mypipe_spark.curate import compact_write
    from mypipe_spark.plans.catalog import load_tables
    from mypipe_spark.plans.curation import compaction_plan_for

    target = 512  # force multi-file partitions on the small fixture
    docs = load_tables(spark, sf_dir)["documents"]
    out = str(tmp_path / "compacted")
    audit = compact_write(docs, out, target_bytes=target)
    assert audit["n_rows"] == docs.count()
    plan = {
        (r["source"], r["lang"]): r["n_files"]
        for r in compaction_plan_for(docs, target_bytes=target).collect()
    }
    assert audit["n_dirs"] == len(plan)
    assert max(plan.values()) > 1, "target must force the multi-file path"
    import os

    multi = 0
    for root, _dirs, files in os.walk(out):
        n = sum(1 for f in files if f.endswith(".parquet"))
        if not n:
            continue
        # .../source=<s>/lang=<l>
        parts = dict(
            kv.split("=", 1) for kv in root.split(os.sep) if "=" in kv
        )
        key = (parts["source"], parts["lang"])
        assert key in plan, root
        assert 1 <= n <= plan[key], (root, n, plan[key])
        multi += n > 1
    assert multi > 0, "at least one directory must actually split"
    assert audit["max_files_per_dir"] > 1


def test_compact_write_rejects_append_and_ignore_modes(spark, sf_dir, tmp_path):
    """append and ignore are rejected up front: the audit describes
    the whole output directory, so appending would blend prior writes
    into this write's numbers, and ignore could silently skip the
    write and audit a PRE-EXISTING directory as this call's result."""
    import pytest

    from mypipe_spark.curate import compact_write
    from mypipe_spark.plans.catalog import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    with pytest.raises(ValueError, match="append"):
        compact_write(docs, str(tmp_path / "x"), mode="append")
    with pytest.raises(ValueError, match="ignore"):
        compact_write(docs, str(tmp_path / "x"), mode="ignore")


def test_caller_shard_column_survives(spark, tmp_path):
    """A user column literally named '__shard' must not be overwritten
    by the writer's internal hash column and dropped from the shards
    (round-8 review) — the internal name is derived to be absent."""
    from mypipe_spark.sinks.shards import write_training_shards

    df = spark.createDataFrame(
        [(1, "en", 7), (2, "en", 8)], "doc_id long, lang string, __shard int"
    )
    out = str(tmp_path / "shards")
    write_training_shards(df, out, shards_per_stratum=2)
    back = spark.read.parquet(out)
    assert "__shard" in back.columns
    assert sorted((r["doc_id"], r["__shard"]) for r in back.collect()) == [
        (1, 7), (2, 8)
    ]


def _stage_waves(spark, batch_docs, src: str, n_waves: int) -> None:
    """Split the corpus into n_waves mtime-ordered parquet files so a
    maxFilesPerTrigger=1 file stream replays them as one epoch per
    wave. Mtimes are stamped PER WAVE as the files appear (part names
    carry random UUIDs — name order is not write order)."""
    import time

    from pyspark.sql import functions as F

    seen: set[str] = set()
    base = time.time()
    for i in range(n_waves):
        wave = batch_docs.filter(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_waves)) == i
        )
        wave.coalesce(1).write.mode("append").parquet(src)
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in seen:
                os.utime(os.path.join(src, f), (base + i, base + i))
                seen.add(f)


def test_streaming_curation_replayed_epoch_is_idempotent(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The at-least-once retry path of the epoch-keyed overwrite
    contract, exercised for real (round-8 verdict ask #5): an epoch's
    foreachBatch WRITES its shards fully and then dies (injected
    post-write failure — the worst case for a bare append sink, which
    would double every row of the epoch on replay); the restarted
    query replays the SAME epoch into the same epoch=<id> directory
    with mode=overwrite, so the landed corpus equals the batch
    gate+scrub output exactly — no duplicates, no gaps."""
    import mypipe_spark.curate as cur
    from conftest import drain_stream
    from mypipe_spark.plans.curation import gate_documents, scrub_documents
    from pyspark.sql import functions as F

    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "src")
    os.makedirs(src)
    _stage_waves(spark, batch_docs, src, n_waves=2)

    def stream():
        return (
            spark.readStream.schema(batch_docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    real = cur.write_training_shards
    armed = {"on": True}

    def failing(df, path, **kw):
        real(df, path, **kw)  # the epoch's shards ARE on disk...
        if armed["on"]:
            armed["on"] = False  # ...when the "task" dies exactly once
            raise RuntimeError("injected post-write epoch failure")

    monkeypatch.setattr(cur, "write_training_shards", failing)
    q = cur.run_streaming_curation(
        spark, stream(), out, ckpt, shards_per_stratum=2, rows_per_file=50
    )
    failed = None
    try:
        drain_stream(q)
    except Exception as exc:  # noqa: BLE001 — the injected failure
        failed = exc
    assert failed is not None and "injected post-write" in str(failed)
    # the poisoned epoch's output is REAL on-disk state the replay
    # must overwrite, not an empty directory
    assert glob.glob(f"{out}/epoch=*"), "injected failure landed no epoch"

    monkeypatch.setattr(cur, "write_training_shards", real)
    q2 = cur.run_streaming_curation(
        spark, stream(), out, ckpt, shards_per_stratum=2, rows_per_file=50
    )
    drain_stream(q2)

    want = sorted(
        map(
            tuple,
            scrub_documents(
                gate_documents(batch_docs)
                .filter(F.col("gate_keep") == 1)
                .select("doc_id", "lang", "source", "text")
            ).collect(),
        )
    )
    back = spark.read.parquet(out)
    cols = scrub_documents(batch_docs).columns
    got = sorted(map(tuple, back.select(cols).collect()))
    assert got == want and len(got) > 0
    assert back.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_run_curation_refuses_ignore_mode(spark, sf_dir, tmp_path):
    """round-11 review: mode='ignore' silently SKIPS the write when
    out_dir exists and audits the pre-existing directory as this
    run's output — refused like 'append' (the pair compact_write
    already rejects)."""
    import pytest

    from mypipe_spark.curate import run_curation

    with pytest.raises(ValueError, match="ignore"):
        run_curation(
            spark,
            {"sf_dir": sf_dir, "out_dir": str(tmp_path / "o"), "mode": "ignore"},
        )


def test_write_training_shards_static_overwrite_under_dynamic_session(
    spark, tmp_path
):
    """round-11 review: under a session with dynamic
    partitionOverwriteMode, an overwrite rerun over a corpus missing
    a stratum would leave the prior run's partition in place —
    write_training_shards must pin static overwrite like
    compact_write does."""
    from mypipe_spark.sinks.shards import write_training_shards

    out = str(tmp_path / "shards")
    run1 = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "fr")], "doc_id int, text string, lang string"
    )
    run2 = run1.filter("lang = 'en'")
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        write_training_shards(run1, out, mode="overwrite")
        write_training_shards(run2, out, mode="overwrite")
        got = spark.read.parquet(out)
        assert [r["lang"] for r in got.select("lang").distinct().collect()] == ["en"]
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)


def test_run_curation_default_key_integrity_gate(spark, tmp_path):
    """round-11 review: with no audit config at all, the doc_id
    key-integrity precondition (non-NULL + unique) is enforced by
    default — a NULL doc_id is counted kept by the flags but dropped
    by the keyed join-back, and a duplicate multiplies written rows,
    silently diverging the audit. audit_checks=[] is the explicit
    opt-out."""
    import pytest

    from mypipe_spark.curate import AuditError, run_curation

    dirty = spark.createDataFrame(
        [
            (1, "the of to and in a solid document body here", "en", "s", 43),
            (1, "the of to and in a solid document body here", "en", "s", 43),
            (None, "the of to and in another document body goes", "en", "s", 43),
        ],
        "doc_id int, text string, lang string, source string, n_chars int",
    )
    with pytest.raises(AuditError) as ei:
        run_curation(
            spark, {"out_dir": str(tmp_path / "refused")}, docs=dirty
        )
    assert ei.value.failed == {"not_null(doc_id)": 1, "unique_key(doc_id)": 1}
    # explicit opt-out still runs (acknowledged divergence)
    audit = run_curation(
        spark,
        {"out_dir": str(tmp_path / "opted_out"), "audit_checks": []},
        docs=dirty,
    )
    assert audit["n_written"] >= 0
