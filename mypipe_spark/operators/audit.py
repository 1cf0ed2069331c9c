"""Declarative data-quality constraint audit (the Deequ-style check
plane a training-data pipeline runs before trusting an ingest).

A caller declares constraints over one table — completeness,
key-uniqueness, value ranges, set membership, cross-column ordering —
and ``audit`` evaluates ALL of them in ONE aggregate over ONE scan:
every row-level rule folds into a conditional count inside the same
``agg`` (map-side combinable), key-uniqueness rides the same pass as
``count(*) - count(distinct struct(keys))``, and the per-constraint
result rows come from ``stack`` over that single aggregate row —
never a UNION of per-constraint subqueries (which would re-scan the
table once per rule; the ordered-funnel query hit exactly that
re-execution trap).

Row-level predicates are written once as dialect-portable SQL (the
``IS NULL`` / ``NOT IN`` / comparison subset Spark SQL and DuckDB
read identically — no regex, so no backslash-escaping hazard), so the
Spark plan and the DuckDB oracle share the *same* violation
expressions verbatim: ``audit_oracle_sql`` derives the oracle from
the same ``Check`` list that builds the plan, and the two can never
drift apart.

At 100 TB: one scan per audited table, one single-row exchange for
the final aggregate (the distinct-count path adds the standard
two-phase distinct expand on the key columns only). Adding a rule
adds a conditional count, not a pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint. ``violation_sql`` is a boolean SQL expression
    (TRUE = this row violates) in the dialect-portable subset; key
    checks set ``key_cols`` instead and count duplicate key tuples."""

    name: str
    violation_sql: str | None = None
    key_cols: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        if (self.violation_sql is None) == (not self.key_cols):
            raise ValueError(
                f"check {self.name!r}: exactly one of violation_sql / "
                "key_cols must be set"
            )
        # the name is interpolated into SQL string literals (stack
        # labels, oracle SELECTs) — refuse quotes instead of escaping
        # them so the emitted SQL stays readable in both dialects
        if "'" in self.name:
            raise ValueError(
                f"check name {self.name!r} must not contain single quotes"
            )


def not_null(col: str) -> Check:
    """Completeness: every row has ``col``."""
    return Check(f"not_null({col})", f"({col} IS NULL)")


def in_set(col: str, values: tuple[str, ...]) -> Check:
    """Domain membership; NULL counts as a violation (use a separate
    ``not_null`` if you want the two failure modes reported apart —
    NOT IN alone would let NULLs vanish into three-valued logic).
    Values are escaped, so apostrophes in the domain are safe."""
    lits = ", ".join("'" + v.replace("'", "''") + "'" for v in values)
    return Check(
        f"in_set({col})", f"({col} IS NULL OR {col} NOT IN ({lits}))"
    )


def in_range(col: str, lo, hi) -> Check:
    """Closed-interval bound; NULL is a violation (same rationale as
    ``in_set``)."""
    return Check(
        f"in_range({col})",
        f"({col} IS NULL OR {col} < {lo} OR {col} > {hi})",
    )


def ordered(lo_col: str, hi_col: str) -> Check:
    """Cross-column ordering ``lo_col <= hi_col``; a NULL on either
    side is a violation (an unverifiable ordering is not a pass)."""
    return Check(
        f"ordered({lo_col},{hi_col})",
        f"({lo_col} IS NULL OR {hi_col} IS NULL OR {lo_col} > {hi_col})",
    )


def unique_key(*cols: str) -> Check:
    """Key uniqueness over the tuple ``cols``. Violations = number of
    surplus rows (``count(*) - count(distinct tuple)``). The tuple is
    a STRUCT on both engines, so NULL-bearing keys still form
    countable tuples — two (1, NULL) rows are duplicates, unlike
    ``COUNT(DISTINCT a, b)`` which would silently skip them."""
    return Check(f"unique_key({','.join(cols)})", key_cols=tuple(cols))


def default_doc_checks() -> list[Check]:
    """The ingest-trust constraints a documents corpus must satisfy
    before curation spends a full pipeline on it: addressable rows
    (non-NULL unique doc_id) and the text/n_chars consistency the
    duplicate-resolution ranking relies on. Lives here (not in
    curate.py) so catalog oracles can import it without touching the
    runner's module graph."""
    return [
        not_null("doc_id"),
        unique_key("doc_id"),
        not_null("text"),
        Check(
            "n_chars_matches_text",
            "(text IS NOT NULL AND (n_chars IS NULL OR"
            " n_chars <> length(text)))",
        ),
    ]


def _violation_aggs(checks: list[Check]) -> list:
    aggs = []
    for c in checks:
        if c.key_cols:
            tup = F.struct(*[F.col(k) for k in c.key_cols])
            agg = F.count(F.lit(1)) - F.count_distinct(tup)
        else:
            # coalesce: SUM over zero rows is NULL in both engines, but
            # the audit contract is "0 violations" on an empty table
            agg = F.coalesce(
                F.sum(F.expr(c.violation_sql).cast("int")), F.lit(0)
            )
        aggs.append(agg.cast("long").alias(f"_v{len(aggs)}"))
    return aggs


def audit(df: DataFrame, table_name: str, checks: list[Check]) -> DataFrame:
    """Evaluate every check in one aggregate over one scan of ``df``.

    Returns one row per check:
    ``(table_name, check_name, n_rows, n_violations, passed)`` with
    ``passed`` as an INT gate (1 = zero violations) — the shape a
    curation runner branches on and a warehouse audit log stores.
    """
    if not checks:
        raise ValueError("audit needs at least one check")
    one = df.agg(
        F.count(F.lit(1)).cast("long").alias("_n"), *_violation_aggs(checks)
    )
    stack_args = ", ".join(
        f"'{c.name}', _v{i}" for i, c in enumerate(checks)
    )
    return one.select(
        F.lit(table_name).alias("table_name"),
        F.expr(
            f"stack({len(checks)}, {stack_args}) AS (check_name, n_violations)"
        ),
        F.col("_n").alias("n_rows"),
    ).select(
        "table_name",
        "check_name",
        "n_rows",
        "n_violations",
        F.when(F.col("n_violations") == 0, 1).otherwise(0).alias("passed"),
    )


def audit_oracle_sql(table_name: str, checks: list[Check]) -> str:
    """The DuckDB twin: same one-aggregate-then-widen shape, built
    from the SAME Check list (shared violation SQL verbatim). The
    per-check rows come from UNION ALL over the one-row aggregate
    CTE — constant work, the table itself is scanned once."""
    if not checks:
        raise ValueError("audit needs at least one check")
    cols = []
    for i, c in enumerate(checks):
        if c.key_cols:
            tup = ", ".join(f"k{j} := {k}" for j, k in enumerate(c.key_cols))
            cols.append(
                f"COUNT(*) - COUNT(DISTINCT struct_pack({tup})) AS _v{i}"
            )
        else:
            cols.append(
                f"CAST(SUM(CASE WHEN {c.violation_sql} THEN 1 ELSE 0 END)"
                f" AS BIGINT) AS _v{i}"
            )
    agg = f"SELECT COUNT(*) AS _n, {', '.join(cols)} FROM {table_name}"
    rows = "\n      UNION ALL ".join(
        f"SELECT '{c.name}' AS check_name, COALESCE(_v{i}, 0) AS n_violations"
        " FROM one"
        for i, c in enumerate(checks)
    )
    return f"""
    WITH one AS ({agg}),
    widened AS ({rows})
    SELECT '{table_name}' AS table_name, check_name,
           (SELECT _n FROM one) AS n_rows, n_violations,
           CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS passed
    FROM widened
    """
