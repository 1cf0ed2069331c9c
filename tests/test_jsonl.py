"""JSONL corpus source/sink contracts: dirty-line classification,
parquet round-trip fidelity, and stream==batch parity."""

from __future__ import annotations

from conftest import drain_stream


def test_jsonl_dirty_lines_classify(spark, tmp_path):
    """Every line lands in exactly one of {documents, dlq, blank-skip}
    with the documented reason; n_chars derives when absent and is
    kept when present; unknown fields and unicode pass through."""
    from mypipe_spark.sources.jsonl import read_documents_jsonl

    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0"}',
        '{"doc_id": 2, "text": "päläläis 中文", "lang": "fi", "source": "s1",'
        ' "n_chars": 999, "extra_field": true}',
        "",                                            # blank: skipped
        "   ",                                         # whitespace: skipped
        "\t \t",                                       # tabs: skipped too
        "this is not json at all",                     # malformed
        '{"doc_id": "not-a-number", "text": "x"}',     # mistyped key
        '{"text": "keyless document", "lang": "en"}',  # missing doc_id
        '{"doc_id": 3, "text": null, "lang": "de"}',   # null text is legal
    ]
    src = tmp_path / "corpus.jsonl"
    src.write_text("\n".join(lines) + "\n")
    docs, dlq = read_documents_jsonl(spark, str(src))
    d = {r["doc_id"]: r for r in docs.collect()}
    assert set(d) == {1, 2, 3}
    assert d[1]["n_chars"] == len("hello world")       # derived
    assert d[2]["n_chars"] == 999                      # kept as shipped
    assert d[2]["text"] == "päläläis 中文"
    assert d[3]["text"] is None and d[3]["n_chars"] is None
    q = sorted((r["reason"], r["raw"]) for r in dlq.collect())
    assert [reason for reason, _ in q] == [
        "malformed_json",
        "malformed_json",
        "missing_doc_id",
    ]
    # the DLQ preserves the offending line verbatim
    assert any(raw == "this is not json at all" for _, raw in q)


def test_jsonl_round_trips_documents_table(spark, sf_dir, tmp_path):
    """documents parquet → JSONL export → JSONL ingest must reproduce
    the table row-for-row (the interchange-fidelity pin; the driver
    corpus has no NULL n_chars, so the documented densification never
    fires here — test_jsonl_null_nchars_densifies pins that edge),
    with an empty DLQ."""
    from mypipe_spark.sources.jsonl import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    orig = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "export")
    write_documents_jsonl(orig, out)
    back, dlq = read_documents_jsonl(spark, out)
    assert dlq.count() == 0
    a = sorted(tuple(r) for r in orig.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b and len(a) > 0


def test_jsonl_stream_equals_batch(spark, tmp_path):
    """The same landing-zone directory through stream_documents_jsonl
    (foreachBatch accumulation) and read_documents_jsonl must yield
    identical documents AND identical dead letters."""
    from mypipe_spark.sources.jsonl import (
        read_documents_jsonl,
        stream_documents_jsonl,
    )

    zone = tmp_path / "zone"
    zone.mkdir()
    (zone / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s"}\n'
        "garbage line\n"
    )
    (zone / "b.jsonl").write_text(
        '{"doc_id": 2, "text": "beta", "lang": "de", "source": "s"}\n'
        '{"text": "keyless"}\n'
    )
    docs_s, dlq_s = stream_documents_jsonl(spark, str(zone))
    got_docs, got_dlq = [], []
    q1 = (
        docs_s.writeStream.foreachBatch(
            lambda b, e: got_docs.extend(tuple(r) for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "c1"))
        .start()
    )
    drain_stream(q1)
    q2 = (
        dlq_s.writeStream.foreachBatch(
            lambda b, e: got_dlq.extend(tuple(r) for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "c2"))
        .start()
    )
    drain_stream(q2)
    docs_b, dlq_b = read_documents_jsonl(spark, str(zone))
    assert sorted(got_docs) == sorted(tuple(r) for r in docs_b.collect())
    assert sorted(got_dlq) == sorted(tuple(r) for r in dlq_b.collect())
    assert len(got_docs) == 2 and len(got_dlq) == 2


def test_jsonl_null_nchars_densifies(spark, tmp_path):
    """The ONE documented round-trip normalization: a NULL n_chars
    beside non-NULL text comes back as the derived length (JSON
    cannot distinguish shipped-null from absent after parsing);
    NULL text keeps n_chars NULL, and every other column is exact."""
    from mypipe_spark.sources.jsonl import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    orig = spark.createDataFrame(
        [(1, "abc", "en", "s", None), (2, None, "de", "s", None),
         (3, "xyzw", "en", "s", 77)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "exp")
    write_documents_jsonl(orig, out)
    back, dlq = read_documents_jsonl(spark, out)
    assert dlq.count() == 0
    got = {r["doc_id"]: r for r in back.collect()}
    assert got[1]["n_chars"] == 3          # densified from text
    assert got[2]["n_chars"] is None       # NULL text -> stays NULL
    assert got[3]["n_chars"] == 77         # shipped value kept
    assert got[2]["text"] is None and got[3]["text"] == "xyzw"


def test_jsonl_feeds_curation_runner(spark, sf_dir, tmp_path):
    """Composition: a JSONL landing zone (with planted garbage lines)
    drives the batch curation runner via the docs override, and the
    audit equals running the same corpus from parquet directly — the
    dirty lines stop at the source DLQ, never reaching curation."""
    from mypipe_spark.curate import run_curation
    from mypipe_spark.sources.jsonl import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    orig = spark.read.parquet(f"{sf_dir}/documents.parquet")
    zone = str(tmp_path / "zone")
    write_documents_jsonl(orig, zone)
    with open(f"{zone}/zz_garbage.txt", "w") as fh:
        fh.write("not json\n{\"text\": \"keyless\"}\n")
    docs, dlq = read_documents_jsonl(spark, zone)
    assert dlq.count() == 2
    cfg = {"sf_dir": sf_dir, "out_dir": str(tmp_path / "out_a"),
           "mode": "overwrite"}
    audit_jsonl = run_curation(spark, cfg | {"out_dir": str(tmp_path / "out_a")},
                               docs=docs)
    audit_parquet = run_curation(spark, cfg | {"out_dir": str(tmp_path / "out_b")})
    assert audit_jsonl == audit_parquet
    assert audit_jsonl["n_input"] == orig.count()


def test_jsonl_streams_into_curation(spark, sf_dir, tmp_path):
    """Composition: the streaming JSONL reader feeds
    run_streaming_curation; the landed shard rows equal the batch
    gate+scrub survivors over the same corpus."""
    from conftest import drain_stream

    from mypipe_spark.curate import run_streaming_curation
    from mypipe_spark.plans.curation import gate_documents, scrub_documents
    from mypipe_spark.sources.jsonl import (
        stream_documents_jsonl,
        write_documents_jsonl,
    )

    orig = spark.read.parquet(f"{sf_dir}/documents.parquet")
    zone = str(tmp_path / "zone")
    write_documents_jsonl(orig, zone)
    docs_s, _dlq_s = stream_documents_jsonl(spark, zone)
    q = run_streaming_curation(
        spark,
        docs_s,
        out_dir=str(tmp_path / "shards"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    drain_stream(q)
    landed = spark.read.parquet(str(tmp_path / "shards"))
    batch_kept = scrub_documents(
        gate_documents(orig).filter("gate_keep = 1")
    )
    assert landed.count() == batch_kept.count() > 0
    assert sorted(
        r["doc_id"] for r in landed.select("doc_id").collect()
    ) == sorted(r["doc_id"] for r in batch_kept.select("doc_id").collect())
