"""Data-quality audit operator (operators/audit.py): planted
violations on both engines, NULL-key duplicate semantics, empty-table
totality, and the one-scan plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mypipe_spark.operators.audit import (
    Check,
    audit,
    audit_oracle_sql,
    in_range,
    in_set,
    not_null,
    ordered,
    unique_key,
)

ROWS = [
    # (id, sub, status, qty, lo, hi)
    (1, 1, "A", 10, 1, 2),
    (1, 1, "B", 5, 2, 2),      # duplicate (id, sub); status outside {A,N}
    (2, None, "N", 60, 3, 1),  # qty over range; lo > hi ordering breach
    (2, None, "A", None, None, 5),  # duplicate NULL-bearing key; NULL qty; NULL lo
    (3, 2, None, 1, 0, 0),     # NULL status
]
COLS = ["id", "sub", "status", "qty", "lo", "hi"]

CHECKS = [
    unique_key("id", "sub"),
    not_null("status"),
    in_set("status", ("A", "N")),
    in_range("qty", 1, 50),
    ordered("lo", "hi"),
]

# hand-computed: 5 rows; key tuples {(1,1)x2, (2,NULL)x2, (3,2)} -> 2
# surplus; one NULL status; NULL + 'B' fail the set (2); qty 60 and
# NULL fail the range (2); lo>hi once + NULL lo once (2)
EXPECTED = {
    "unique_key(id,sub)": 2,
    "not_null(status)": 1,
    "in_set(status)": 2,
    "in_range(qty)": 2,
    "ordered(lo,hi)": 2,
}


def test_audit_planted_violations_cross_engine(spark):
    """The SAME Check list drives the Spark plan and the DuckDB
    oracle; both must report the hand-computed violation counts —
    including the two (2, NULL) rows counting as ONE duplicate (the
    struct tuple, not COUNT(DISTINCT a, b) which skips NULL rows)."""
    df = spark.createDataFrame(
        ROWS, "id int, sub int, status string, qty int, lo int, hi int"
    )
    got = {
        r["check_name"]: (r["n_violations"], r["n_rows"], r["passed"])
        for r in audit(df, "t", CHECKS).collect()
    }
    assert {k: v[0] for k, v in got.items()} == EXPECTED
    assert all(v[1] == 5 for v in got.values())
    assert all(v[2] == 0 for v in got.values())  # every rule fails here

    con = duckdb.connect()
    con.register("t", pd.DataFrame(ROWS, columns=COLS))
    want = {
        r[1]: (r[3], r[2], r[4])
        for r in con.execute(audit_oracle_sql("t", CHECKS)).fetchall()
    }
    assert got == want


def test_audit_clean_table_passes(spark):
    df = spark.createDataFrame(
        [(1, 1, "A", 10, 1, 2), (2, 1, "N", 50, 2, 2)],
        "id int, sub int, status string, qty int, lo int, hi int",
    )
    rows = audit(df, "t", CHECKS).collect()
    assert all(r["n_violations"] == 0 and r["passed"] == 1 for r in rows)


def test_audit_empty_table_is_total(spark):
    """Zero rows -> zero violations and passed=1 on BOTH engines (the
    SUM-over-nothing NULL is coalesced on each side)."""
    df = spark.createDataFrame(
        [], "id int, sub int, status string, qty int, lo int, hi int"
    )
    rows = audit(df, "t", CHECKS).collect()
    assert len(rows) == len(CHECKS)
    assert all(
        r["n_rows"] == 0 and r["n_violations"] == 0 and r["passed"] == 1
        for r in rows
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame([], columns=COLS))
    want = con.execute(audit_oracle_sql("t", CHECKS)).fetchall()
    assert all(r[2] == 0 and r[3] == 0 and r[4] == 1 for r in want)


def test_audit_is_one_scan(spark):
    """Thirteen rules, one pass: the physical plan reads the relation
    once — rules fold into one aggregate, the per-rule rows come from
    stack over its single output row, never a per-rule UNION of
    re-scans."""
    df = spark.createDataFrame(
        ROWS, "id int, sub int, status string, qty int, lo int, hi int"
    )
    plan = audit(df, "t", CHECKS)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") == 1


def test_check_spec_validation():
    with pytest.raises(ValueError):
        Check("both", violation_sql="(x IS NULL)", key_cols=("x",))
    with pytest.raises(ValueError):
        Check("neither")
    with pytest.raises(ValueError):
        audit_oracle_sql("t", [])


def test_in_set_escapes_apostrophes(spark):
    """Domain values are interpolated into SQL string literals on
    both engines; apostrophes must survive (review pass: o'reilly
    broke the parser on both sides)."""
    import duckdb
    import pandas as pd

    checks = [in_set("src", ("o'reilly", "web"))]
    df = spark.createDataFrame(
        [("o'reilly",), ("web",), ("spam",), (None,)], "src string"
    )
    got = audit(df, "t", checks).collect()
    assert got[0]["n_violations"] == 2  # spam + NULL
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"src": ["o'reilly", "web", "spam", None]}))
    want = con.execute(audit_oracle_sql("t", checks)).fetchall()
    assert want[0][3] == 2


def test_check_name_rejects_quotes():
    with pytest.raises(ValueError):
        Check("bad'name", violation_sql="(x IS NULL)")


def test_curation_empty_check_list_skips_or_defaults(spark, sf_dir):
    """audit_checks: [] means 'no checks declared' — gate off when
    not enforcing (no crash deep inside the operator), the default
    set when enforcing."""
    from mypipe_spark.curate import audit_corpus

    docs = spark.createDataFrame(
        [(1, "some text", "en", "s", 9)],
        "doc_id int, text string, lang string, source string, n_chars int",
    )
    assert audit_corpus(docs, []) is None
    counts = audit_corpus(docs, [], enforce=True)
    assert counts is not None and all(v == 0 for v in counts.values())


def test_audit_stream_partials_sum_to_batch(spark, tmp_path):
    """The streaming audit contract: row-rule counts are a monoid, so
    per-microbatch partials sum to EXACTLY the one-shot batch audit
    regardless of how the stream is chopped (maxFilesPerTrigger=1
    forces several microbatches); key checks are refused loudly."""
    from mypipe_spark.curate import audit_stream, default_doc_checks
    from tests.conftest import drain_stream

    rows = [
        (1, "good text", "en", "s", 9),
        (2, None, "en", "s", 4),          # not_null(text)
        (None, "orphan row", "en", "s", 10),  # not_null(doc_id)
        (4, "lying count", "en", "s", 99),    # n_chars_matches_text
        (5, "fine", "en", "s", 4),
    ]
    schema = "doc_id int, text string, lang string, source string, n_chars int"
    src = tmp_path / "src"
    docs = spark.createDataFrame(rows, schema)
    # several files -> several microbatches
    docs.repartition(3).write.parquet(str(src))

    row_checks = [c for c in default_doc_checks() if not c.key_cols]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = audit_stream(
        stream, "documents", row_checks,
        str(tmp_path / "log"), str(tmp_path / "ckpt"),
    )
    drain_stream(q)

    log = spark.read.parquet(str(tmp_path / "log"))
    assert log.select("epoch").distinct().count() >= 2
    got = {
        r["check_name"]: (r["viol"], r["rows"])
        for r in log.groupBy("check_name")
        .agg(
            F.sum("n_violations").alias("viol"),
            F.sum("n_rows").alias("rows"),
        )
        .collect()
    }
    from mypipe_spark.operators.audit import audit

    want = {
        r["check_name"]: (r["n_violations"], r["n_rows"])
        for r in audit(docs, "documents", row_checks).collect()
    }
    assert got == want
    assert want["not_null(text)"][0] == 1
    assert want["not_null(doc_id)"][0] == 1
    assert want["n_chars_matches_text"][0] == 1

    with pytest.raises(ValueError):
        audit_stream(
            stream, "documents", default_doc_checks(),
            str(tmp_path / "log2"), str(tmp_path / "ckpt2"),
        )


def test_audit_stream_accepts_default_spelling(spark, tmp_path):
    """round-11 review: audit_corpus accepts checks='default' but
    audit_stream iterated the string's characters and died with an
    opaque AttributeError — it must normalize 'default' to the
    row-level subset of default_doc_checks and reject other strings
    clearly."""
    import pytest

    from mypipe_spark.curate import audit_stream

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "hello world text", "en", 16)],
        "doc_id int, text string, lang string, n_chars int",
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id int, text string, lang string, n_chars int"
    ).parquet(src)
    q = audit_stream(
        stream, "documents", "default",
        str(tmp_path / "log"), str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    log = spark.read.parquet(str(tmp_path / "log"))
    names = {r["check_name"] for r in log.select("check_name").collect()}
    assert "not_null(text)" in names
    assert "unique_key(doc_id)" not in names  # key checks excluded
    with pytest.raises(ValueError, match="default"):
        audit_stream(
            stream, "documents", "weird",
            str(tmp_path / "log2"), str(tmp_path / "ckpt2"),
        )
