"""CSV documents source/sink (sources/csvdoc.py) — dirty-line DLQ
classes, exact round-trip through RFC-4180 quoting, stream==batch
projection parity, and the writer's multi-line refusal."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import drain_stream
from mypipe_spark.sources.csvdoc import (
    read_documents_csv,
    stream_documents_csv,
    write_documents_csv,
)


def test_csv_dirty_lines_classify(spark, tmp_path):
    """Every unusable line dead-letters with a reason; headers and
    blanks are structural skips; quoted commas/quotes parse."""
    lines = [
        "doc_id,text,lang,source,n_chars",          # header -> skipped
        '1,"hello, world",en,web,12',               # quoted comma
        '2,"she said ""hi""",en,web,13',            # escaped quote
        "",                                          # blank -> skipped
        "   ",                                       # whitespace -> skipped
        ",orphan text,en,web,11",                    # no doc_id -> DLQ
        'not_a_number,text,en,web,4',                # bad doc_id type -> DLQ
        "3,plain text,de,book,10",
        "doc_id,text,lang,source,n_chars",          # mid-stream header -> skipped
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame([(l,) for l in lines], "value string").coalesce(
        1
    ).write.text(src)
    docs, dlq = read_documents_csv(spark, src)
    got = {r["doc_id"]: r for r in docs.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["text"] == "hello, world"
    assert got[2]["text"] == 'she said "hi"'
    assert got[3]["lang"] == "de" and got[3]["source"] == "book"
    reasons = sorted((r["reason"], r["raw"][:12]) for r in dlq.collect())
    assert reasons == [
        ("malformed_csv", "not_a_number"),
        ("missing_doc_id", ",orphan text"),
    ]


def test_csv_round_trips_documents_table(spark, sf_dir, tmp_path):
    """Writer -> reader round-trip over the real fixture corpus is
    exact (fixture text is single-line word salad), with an empty
    DLQ."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "csv")
    write_documents_csv(docs, out)
    back, dlq = read_documents_csv(spark, out)
    assert dlq.count() == 0
    want = sorted(tuple(r) for r in docs.collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == want


def test_csv_stream_equals_batch(spark, tmp_path):
    """The identical projection runs on readStream.text: streaming
    ingest of the same files yields the same documents and DLQ."""
    lines = [
        "1,alpha beta,en,web,10",
        "bad,line,en,web,x",
        "2,gamma delta,fr,web,11",
        ",keyless,en,web,7",
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame([(l,) for l in lines], "value string").coalesce(
        1
    ).write.text(src)
    docs_b, dlq_b = read_documents_csv(spark, src)
    docs_s, dlq_s = stream_documents_csv(spark, src)
    for name, sdf in (("csv_docs", docs_s), ("csv_dlq", dlq_s)):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .outputMode("append")
            .start()
        )
        drain_stream(q)
    assert sorted(map(tuple, spark.sql("select * from csv_docs").collect())) == sorted(
        map(tuple, docs_b.collect())
    )
    assert sorted(map(tuple, spark.sql("select * from csv_dlq").collect())) == sorted(
        map(tuple, dlq_b.collect())
    )


def test_csv_writer_refuses_multiline_text(spark, tmp_path):
    """Newline-bearing text would become an unreadable multi-line CSV
    record under the line-wise contract — the writer fails fast."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "line one\nline two", "en", "web", 17)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(ValueError, match="newline"):
        write_documents_csv(docs, str(tmp_path / "x"))


def test_csv_null_nchars_densifies(spark, tmp_path):
    """An empty n_chars field densifies from the text, mirroring the
    JSONL contract; other NULLs survive."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("7,some text,,web,",)], "value string"
    ).coalesce(1).write.text(src)
    docs, dlq = read_documents_csv(spark, src)
    r = docs.collect()[0]
    assert (r["doc_id"], r["n_chars"], r["lang"]) == (7, 9, None)
    assert dlq.count() == 0


def test_csv_round_trips_padded_whitespace(spark, tmp_path):
    """Spark's csv WRITER defaults ignore*WhiteSpace to true; the sink
    must override both so padded text survives the round-trip exactly
    (the silent-mutation class the round-7 review caught: export
    trimmed the padding while the original n_chars rode along)."""
    docs = spark.createDataFrame(
        [(1, "  padded sentence  ", "en", "web", 19)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "csv")
    write_documents_csv(docs, out)
    back, dlq = read_documents_csv(spark, out)
    r = back.collect()[0]
    assert r["text"] == "  padded sentence  " and r["n_chars"] == 19
    assert dlq.count() == 0


def test_csv_writer_refuses_newline_in_any_string_field(spark, tmp_path):
    """lang/source are free-form strings on the same physical line —
    a newline there breaks the contract exactly like one in text."""
    import pytest

    for col_rows in (
        [(1, "clean", "en\nus", "web", 5)],
        [(1, "clean", "en", "web\nscrape", 5)],
    ):
        docs = spark.createDataFrame(
            col_rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        with pytest.raises(ValueError, match="newline"):
            write_documents_csv(docs, str(tmp_path / "y"))


def test_csv_round_trips_empty_string_vs_null(spark, tmp_path):
    """Empty string and NULL are different values and must round-trip
    as themselves: the writer emits '' as a quoted "" and NULL as a
    bare empty field; the reader's NUL nullValue sentinel keeps the
    two apart (Spark's default reader collapses both to NULL — the
    silent identity change the sixth review pass caught)."""
    docs = spark.createDataFrame(
        [(1, "", "en", "web", 0), (2, None, "", None, 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "csv")
    write_documents_csv(docs, out)
    back, dlq = read_documents_csv(spark, out)
    got = {r["doc_id"]: (r["text"], r["lang"], r["source"]) for r in back.collect()}
    assert got[1] == ("", "en", "web")
    assert got[2] == (None, "", None)
    assert dlq.count() == 0
