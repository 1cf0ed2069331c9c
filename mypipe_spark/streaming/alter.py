"""Live ALTER handling / schema evolution (SURVEY.md §2.9 T10, §7 Stage 6).

Reference behavior (AbstractBinaryLogConsumer.scala:106-122;
TableCache.refreshTable:41-49): an ALTER event triggers a blocking
metadata refresh; subsequent mutations use the new table structure. The
generic envelope needs nothing (its typed maps absorb new columns —
README.md:162-168); the *specific* envelope requires the schema
repository to hold the new version
(KafkaMutationSpecificAvroProducer.scala:9-11).

Spark twist: a running StreamingQuery's schema is fixed, so specific-
envelope evolution = register schema v2 + **restart the query** — the
checkpoint makes the restart seamless (resume exactly after the last
committed batch). :class:`AlterOrchestrator` packages that loop:

    run pipe → microbatch contains ALTER → register evolved schema →
    stop query → restart with refreshed schema → repeat

Restart granularity is the microbatch: rows after the ALTER inside the
same batch were already handled with the old schema (harmless for the
generic envelope; for specific sinks the new column starts flowing at
the next batch — the same eventual-consistency the reference's
schema-repo polling gives, KafkaAvroSerializer.scala:41-67).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..model import spark_type_for, specific_subject
from ..registry import SchemaRegistry

# `ALTER TABLE [db.]tbl ADD COLUMN name type...` / `DROP COLUMN name`
# — the same token-level parse the reference hand-rolls
# (AbstractMySQLBinaryLogConsumer.scala:92-111), as regexes.
# one identifier: backticked or unquoted-with-$ (see _TARGET_RE)
_IDENT = r"(?:`[^`]+`|[\w$]+)"
_ADD_RE = re.compile(
    rf"alter\s+table\s+{_IDENT}(?:\s*\.\s*{_IDENT})?"
    r"\s+add\s+(?:column\s+)?`?([\w$]+)`?\s+(\w+)",
    re.IGNORECASE,
)
_DROP_RE = re.compile(
    rf"alter\s+table\s+{_IDENT}(?:\s*\.\s*{_IDENT})?"
    r"\s+drop\s+(?:column\s+)?`?([\w$]+)`?",
    re.IGNORECASE,
)

# Identifiers: backticked (any non-backtick chars) or unquoted (which
# in MySQL may contain `$` — \w+ alone would truncate `user$archive`).
_TARGET_RE = re.compile(
    r"alter\s+table\s+(?:`([^`]+)`|([\w$]+))"
    r"(?:\s*\.\s*(?:`([^`]+)`|([\w$]+)))?",
    re.IGNORECASE,
)

_MYSQL_TYPE_ALIASES = {
    "INT": "INT24", "INTEGER": "INT24", "BIGINT": "LONGLONG",
    "TEXT": "BLOB", "CHAR": "STRING", "MEDIUMINT": "INT24",
    "SMALLINT": "SHORT", "TINYINT": "TINY",
}


def alter_target(alter_sql: str) -> tuple[str | None, str | None]:
    """Extract (database, table) from an ALTER statement — the
    reference's decodeDatabaseFromAlter/decodeTableFromAlter token
    parse (AbstractMySQLBinaryLogConsumer.scala:92-111, S5). Database
    is None when unqualified (caller falls back to the event's)."""
    m = _TARGET_RE.search(alter_sql)
    if not m:
        return None, None
    first = m.group(1) or m.group(2)
    second = m.group(3) or m.group(4)
    return (first, second) if second else (None, first)


def evolve_schema(schema: StructType, alter_sql: str) -> StructType:
    """Apply one ALTER statement to a StructType: ADD COLUMN appends a
    nullable field (type via the MySQL→Spark map), DROP COLUMN removes
    it. Unrecognized ALTER forms return the schema unchanged (the
    reference routes those to UnknownTable / ignores)."""
    m = _ADD_RE.search(alter_sql)
    if m:
        col, mysql_type = m.groups()
        ct = _MYSQL_TYPE_ALIASES.get(mysql_type.upper(), mysql_type.upper())
        try:
            dt = spark_type_for(ct)
        except ValueError:
            return schema
        if col in schema.fieldNames():
            return schema
        return StructType(list(schema.fields) + [StructField(col, dt, True)])
    m = _DROP_RE.search(alter_sql)
    if m:
        col = m.group(1)
        return StructType([f for f in schema.fields if f.name != col])
    return schema


@dataclass
class AlterOrchestrator:
    """Restart-on-DDL driver loop around one pipe.

    ``source``/``sink`` build the streaming DataFrame and its writer
    (sink receives the DataFrame and the checkpoint dir). ``registry``
    holds per-(db, table) specific schemas; every observed ALTER
    registers the evolved schema under the table's insert/update/delete
    subjects before the restart, so the next run's specific projection
    sees the new version — mirroring KafkaAlterSpec.scala:54-94.
    """

    source: Callable[[SparkSession], DataFrame]
    sink: Callable[[DataFrame, str], object]  # returns DataStreamWriter
    checkpoint_dir: str
    registry: SchemaRegistry
    table_schemas: dict[tuple[str, str], StructType] = field(default_factory=dict)
    max_restarts: int = 10

    def _register(self, database: str, table: str, schema: StructType) -> None:
        for mtype in ("insert", "update", "delete"):
            self.registry.register(specific_subject(database, table, mtype), schema)

    def run_available(self, spark: SparkSession) -> int:
        """Drain everything currently available, restarting after each
        microbatch that carried ALTER events. Returns restart count."""
        restarts = 0
        while True:
            alters: list[tuple[str, str, str]] = []

            def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
                ddl = (
                    batch_df.filter(F.col("op") == "alter")
                    .select("database", "table", "sql")
                    .collect()
                )
                for r in ddl:
                    alters.append((r["database"], r["table"], r["sql"]))

            # the DDL watcher runs beside the sink as a foreachBatch on
            # the same source; both share the one checkpointed query
            df = self.source(spark)
            writer = self.sink(df, self.checkpoint_dir)
            query = writer.start()
            watcher = (
                df.filter(F.col("op") == "alter")
                .writeStream.foreachBatch(handle_batch)
                .option("checkpointLocation", self.checkpoint_dir + "_ddl")
                .start()
            )
            try:
                query.processAllAvailable()
                watcher.processAllAvailable()
            finally:
                query.stop()
                watcher.stop()

            if not alters:
                return restarts

            # Register BEFORE consulting the restart budget: the DDL
            # watcher's checkpoint has already committed the batches
            # that carried these ALTERs, so a bail-out here would drop
            # their schema versions permanently (no later run ever sees
            # those events again).
            for database, table, sql in alters:
                # ALTER events may carry no table (the tap could not
                # resolve it) — recover both from the SQL text (S5).
                # ``sql`` itself is nullable in the canonical schema;
                # an unresolvable ALTER evolves nothing but still
                # registers the current schema version.
                sql_db, sql_table = alter_target(sql or "")
                database = database or sql_db
                table = table or sql_table
                key = (database or "", table or "")
                base = self.table_schemas.get(key, StructType([]))
                evolved = evolve_schema(base, sql or "")
                self.table_schemas[key] = evolved
                self._register(database or "", table or "", evolved)
            if restarts >= self.max_restarts:
                return restarts
            restarts += 1
