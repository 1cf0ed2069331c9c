"""CSV documents source/sink (sources/csvdoc.py) — dirty-line DLQ
classes, exact round-trip through RFC-4180 quoting, stream==batch
projection parity, and the writer's multi-line refusal."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import drain_stream
from mypipe_spark.sources.csvdoc import (
    read_documents_csv,
    read_documents_csv_multiline,
    stream_documents_csv,
    write_documents_csv,
    write_documents_csv_multiline,
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


def test_csv_writer_refuses_nul_sentinel(spark, tmp_path):
    """The reader's nullValue sentinel is NUL because it "can never
    appear in a physical line" — the writer must enforce that, not
    assume it: a field whose value IS \\x00 would silently round-trip
    to NULL."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "has a \x00 byte", "en", "web", 12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(ValueError, match="NUL"):
        write_documents_csv(docs, str(tmp_path / "x"))


def test_csv_multiline_round_trips_embedded_newlines(spark, tmp_path):
    """The batch multiLine twin round-trips exactly the records the
    line-wise contract refuses: embedded \\n, embedded \\r, and the
    full quote/comma/newline mix — plus the ''-vs-NULL distinction and
    padded whitespace, same as the line-wise dialect."""
    rows = [
        (1, "line one\nline two", "en", "web", 17),
        (2, "carriage\rreturn", "en", "web", 15),
        (3, 'quote "q", comma\nand newline', "en\nus", "web", 28),
        (4, "", None, "web", 0),
        (5, None, "en", None, None),
        (6, "  padded  ", "en", "web", 10),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "csv")
    write_documents_csv_multiline(docs, out)
    back, dlq = read_documents_csv_multiline(spark, out)
    assert dlq.count() == 0
    got = {r["doc_id"]: tuple(r) for r in back.collect()}
    # n_chars densifies for doc 5 (NULL text -> stays NULL n_chars)
    assert got[1] == (1, "line one\nline two", "en", "web", 17)
    assert got[2] == (2, "carriage\rreturn", "en", "web", 15)
    assert got[3] == (3, 'quote "q", comma\nand newline', "en\nus", "web", 28)
    assert got[4] == (4, "", None, "web", 0)
    assert got[5] == (5, None, "en", None, None)
    assert got[6] == (6, "  padded  ", "en", "web", 10)


def test_csv_multiline_dirty_records_classify(spark, tmp_path):
    """Same DLQ taxonomy as the line-wise reader over a hand-built
    multiLine file: headers (leading AND mid-file, as concatenation
    leaves them) skip structurally, type-malformed records dead-letter
    with the physical record as raw, parsed-but-keyless records
    dead-letter as missing_doc_id with a canonically re-serialized
    raw."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "part1.csv").write_text(
        "doc_id,text,lang,source,n_chars\n"
        '1,"multi\nline text",en,web,15\n'
        "not_a_number,bad,en,web,3\n"
        'doc_id,text,lang,source,n_chars\n'
        ',"orphan\ntext",en,web,11\n'
        "2,plain,de,book,5\n"
    )
    docs, dlq = read_documents_csv_multiline(spark, str(src))
    got = {r["doc_id"]: r for r in docs.collect()}
    assert set(got) == {1, 2}
    assert got[1]["text"] == "multi\nline text"
    assert got[2]["lang"] == "de"
    reasons = sorted((r["reason"], r["raw"]) for r in dlq.collect())
    assert reasons == [
        ("malformed_csv", "not_a_number,bad,en,web,3"),
        ("missing_doc_id", ',"orphan\ntext",en,web,11'),
    ]


def test_csv_multiline_headerless_file_keeps_first_record(spark, tmp_path):
    """header=false + structural exact-match skip, never Spark's blind
    header skip: a headerless file must not lose its first record."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "noheader.csv").write_text('9,"first\nrecord",en,web,12\n8,second,en,web,6\n')
    docs, dlq = read_documents_csv_multiline(spark, str(src))
    assert dlq.count() == 0
    got = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == {9: "first\nrecord", 8: "second"}


def test_csv_multiline_writer_refuses_nul(spark, tmp_path):
    """The multiLine writer lifts the newline refusal but keeps the
    one reserved byte: NUL, the reader's null sentinel."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "ok", "e\x00n", "web", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(ValueError, match="NUL"):
        write_documents_csv_multiline(docs, str(tmp_path / "x"))


def test_csv_multiline_round_trips_fixture_corpus(spark, sf_dir, tmp_path):
    """The multiLine twin is a strict superset on clean data: the real
    fixture corpus round-trips exactly through it too."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "csv")
    write_documents_csv_multiline(docs, out)
    back, dlq = read_documents_csv_multiline(spark, out)
    assert dlq.count() == 0
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.collect())
    )


def test_csv_multiline_round_trips_hostile_strings(spark, tmp_path):
    """Adversarial round-trip corpus for the multiLine dialect (found
    clean by a round-8 fuzz sweep, pinned here): unicode line
    separators, a BOM, quote-edge cases, CRLF mixes, tabs/padding,
    emoji+CJK, formula-injection shapes, trailing backslashes, a 5k
    field, an all-NULL row and an all-empty row — every value must
    come back byte-identical with an empty DLQ."""
    nasty = [
        " line sep   paragraph ",
        "﻿BOM start",
        'ends with quote"',
        '"starts with quote',
        '""',
        ",,,,",
        "\ttabs\tand  spaces ",
        "a\r\nb\rc\nd",
        "emoji \U0001F389 zhongwen 中文",
        '=cmd("inject")',
        " \n ",
        "trailing backslash \\",
        "\\n literal backslash n",
        'quote" then, comma\nthen newline',
        "x" * 5000,
    ]
    rows = [(i, t, "en", "web", len(t)) for i, t in enumerate(nasty)]
    rows.append((900, None, None, None, None))
    rows.append((901, "", "", "", 0))
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "csv")
    write_documents_csv_multiline(docs, out)
    back, dlq = read_documents_csv_multiline(spark, out)
    assert dlq.count() == 0
    a = sorted(map(tuple, docs.collect()), key=str)
    b = sorted(map(tuple, back.collect()), key=str)
    assert a == b


def test_csv_linewise_round_trips_hostile_strings(spark, tmp_path):
    """Line-wise twin of the hostile-corpus pin (single-line values
    only — the line-wise writer refuses \\n/\\r/NUL by contract):
    quote edges, injection shapes, unicode, a text value equal to the
    HEADER line (the writer's comma-quoting keeps the physical line
    distinct from a structural header), 5k fields, all-NULL and
    all-empty rows."""
    nasty = [
        'ends with quote"',
        '"starts with quote',
        '""',
        ",,,,",
        "\ttabs\tand  spaces ",
        "emoji \U0001F389 zhongwen 中文",
        '=cmd("inject")',
        "trailing backslash \\",
        "\\n literal backslash n",
        'quote" then, comma then more',
        "x" * 5000,
        "﻿BOM start",
        "doc_id,text,lang,source,n_chars",
    ]
    rows = [(i, t, "en", "web", len(t)) for i, t in enumerate(nasty)]
    rows.append((900, None, None, None, None))
    rows.append((901, "", "", "", 0))
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "csv")
    write_documents_csv(docs, out)
    back, dlq = read_documents_csv(spark, out)
    assert dlq.count() == 0
    a = sorted(map(tuple, docs.collect()), key=str)
    b = sorted(map(tuple, back.collect()), key=str)
    assert a == b
