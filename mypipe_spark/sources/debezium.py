"""Debezium-envelope JSON → canonical change events.

The reference taps MySQL binlogs directly; the most common PUBLIC
wire format for the same change stream today is Debezium's JSON
envelope (one record per mutation: ``payload.before`` / ``payload.
after`` row images, ``payload.op`` c/u/d/r, ``payload.source`` binlog
coordinates). This adapter maps that envelope onto the engine's
CHANGE_EVENT_SCHEMA so a user with existing Debezium topics or dumps
can drive every downstream operator (tx grouping, envelopes, keyed-
state materializations, DLQ cascade) without the binlog tap:

- ``op``:     c → insert, u → update, d → delete, r → insert (the
  snapshot-read class — same semantics as this engine's snapshot
  preload rows); a schema-change-topic record (``ddl`` present) runs
  through the canonical prefix classifier — ALTER statements →
  ``alter`` with the statement in ``sql`` (the AlterOrchestrator's
  watcher consumes it directly, closing the Debezium × live-schema-
  evolution composition); CREATE/DROP/TRUNCATE → ``unknown``, never a
  spurious schema registration
- ``seq``:    ``source.pos`` when present (the binlog (file,pos)
  analog WITHIN one file) else ``ts_ms``. Caveat stated plainly: pos
  resets on binlog-file rotation, so seq-keyed redelivery dedup over
  a stream spanning a rotation should dedup on (a hash of)
  ``source.file`` + seq, or fall back to ts_ms ordering — the
  watermark horizon bounds how long a collision window could matter
- ``txid``:   ``transaction.id`` when present else ``source.txId``
- images:     ``before``/``after`` parse as ``map<string,string>``
  (Debezium JSON renders scalars; from_json string-coerces), then
  bucket into the typed maps by a caller-provided StructType — the
  same Spark-type bucketing rule as the snapshot path (int →
  integers, bigint → longs, string → strings, binary → bytes via
  base64, Debezium's binary.handling.mode=base64). Without a schema
  everything lands in the strings maps (lossless for JSON scalars;
  the generic envelope absorbs it).

Pure column expressions end to end — the adapter is a projection on
the scan, streaming- and batch-compatible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..model import BUCKET_SIMPLE_TYPES

# the envelope subset the adapter reads; unknown fields are ignored by
# from_json (PERMISSIVE), so schema-ful and schema-less (SMT-flattened
# "payload-only") producers both parse
_DBZ_SCHEMA = (
    "payload struct<"
    "before: map<string,string>, after: map<string,string>, "
    "op: string, ts_ms: bigint, "
    "source: struct<db: string, table: string, ts_ms: bigint, "
    "  file: string, pos: bigint, txId: string>, "
    "transaction: struct<id: string>, "
    # schema-change-topic records (DDL events): no c/u/d/r op; the
    # statement rides in `ddl`, the database in `databaseName`
    "ddl: string, databaseName: string"
    ">, "
    # payload-only form (ExtractNewRecordState-unwrapped producers
    # keep op/source at the top level)
    "before map<string,string>, after map<string,string>, "
    "op string, ts_ms bigint, "
    "source struct<db: string, table: string, ts_ms: bigint, "
    "  file: string, pos: bigint, txId: string>, "
    "transaction struct<id: string>, "
    "ddl string, databaseName string"
)

_OP_MAP = {"c": "insert", "u": "update", "d": "delete", "r": "insert"}


# ONE taxonomy shared with the snapshot adapter (model.py, round-10
# review — private copies in each module could drift and silently
# re-create the snapshot-vs-CDC key-set divergence)
_BUCKET_TYPES = BUCKET_SIMPLE_TYPES
_BUCKET_CASTS = {
    "integers": "int", "longs": "bigint", "strings": "string", "bytes": "binary",
}


def _typed_map(img: Column, table_schema: StructType | None, kind: str) -> Column:
    """Bucket a string-map row image into one typed map by the
    schema's Spark types (absent schema → everything in strings).

    Totality rules (the adapter must never poison the stream and must
    never silently lose data):
    - values cast with ``try_cast`` / ``try_to_binary`` — the session
      runs ANSI mode, where a plain CAST of a drifted value ('true',
      '1.5') would throw on the executor and kill the query; a
      per-value parse failure becomes a NULL entry instead;
    - columns whose declared type has no bucket here (double, boolean,
      date, …) fall back to the STRINGS map, matching the schema-less
      behavior — providing a schema must never lose values the
      schema-less path keeps;
    - image keys ABSENT from the declared schema (the DB gained a
      column after the caller captured table_schema — a stale
      registry snapshot) also land in the STRINGS map: the rule above
      is about undeclared TYPES, this one about undeclared COLUMNS,
      and both exist so a schema can only ever ADD typing, never
      silently lose data the schema-less path keeps (round-10
      review);
    - a bucket with no matching columns is NULL, same as the snapshot
      path's empty typed_map — snapshot and CDC rows of one table must
      not disagree on NULL-vs-empty images."""
    if table_schema is None or not table_schema.fields:
        # no schema, or a zero-field one (degenerate but legal): every
        # image key is undeclared, so the strings map carries the whole
        # image — the zero-field leg also avoids building the empty
        # F.array() (array<void>) the drift filter below would need,
        # which fails analysis (ADVICE r10)
        if kind == "strings":
            return img
        return F.lit(None).cast(f"map<string,{_BUCKET_CASTS[kind]}>")
    names = [
        f.name
        for f in table_schema.fields
        if f.dataType.simpleString() in _BUCKET_TYPES[kind]
    ]
    if kind == "strings":
        bucketed = {
            f.name
            for f in table_schema.fields
            for k in _BUCKET_TYPES.values()
            if f.dataType.simpleString() in k
        }
        names += [f.name for f in table_schema.fields if f.name not in bucketed]
    extra = None
    if kind == "strings":
        # undeclared-COLUMN fallthrough: image keys the schema does
        # not know about (schema drift) ride the strings map
        declared = F.array(
            *[F.lit(f.name) for f in table_schema.fields]
        )
        extra = F.map_filter(
            img, lambda k, _: ~F.array_contains(declared, k)
        )
    if not names:
        if extra is None:
            return F.lit(None).cast(f"map<string,{_BUCKET_CASTS[kind]}>")
        # empty-vs-NULL contract preserved: with no drifted keys this
        # is NULL exactly like before; drifted keys surface
        return F.when(
            img.isNotNull() & (F.size(extra) > 0), extra
        ).cast("map<string,string>")
    pairs: list[Column] = []
    for n in names:
        pairs.append(F.lit(n))
        v = img.getItem(n)
        if kind == "integers":
            pairs.append(v.try_cast("int"))
        elif kind == "longs":
            pairs.append(v.try_cast("bigint"))
        elif kind == "bytes":
            # binary.handling.mode=base64; try_to_binary: a malformed
            # body becomes a NULL entry, never an executor throw
            pairs.append(F.try_to_binary(v, F.lit("base64")))
        else:
            pairs.append(v)
    # keep only keys the image actually carried (Debezium omits none,
    # but map_filter keeps partial images honest)
    built = F.map_filter(
        F.create_map(*pairs), lambda k, _: F.array_contains(F.map_keys(img), k)
    )
    if extra is not None:
        built = F.map_concat(built, extra)
    return F.when(img.isNotNull(), built)


def debezium_change_events(
    df: DataFrame,
    value_col: str = "value",
    table_schema: StructType | None = None,
    keep_raw: bool = False,
) -> DataFrame:
    """Raw Debezium JSON strings/bytes → CHANGE_EVENT_SCHEMA columns.

    ``df`` carries one envelope per row in ``value_col`` (a Kafka
    value, a JSON-lines file line, …). Rows that do not parse — or
    whose ``op`` is not c/u/d/r — surface with op NULL, letting the
    caller route them through the errors-module DLQ convention instead
    of poisoning the stream; ``keep_raw=True`` appends the original
    envelope COLUMN as ``raw_value`` — un-cast, so a binary source's
    exact failing bytes survive into the DLQ (a string cast would
    mangle invalid UTF-8 into replacement characters)."""
    raw = F.col(value_col).cast("string")
    p = F.from_json(raw, _DBZ_SCHEMA)
    # envelope-or-flattened: prefer payload.*, fall back to top level
    def pick(name: str) -> Column:
        return F.coalesce(p.getField("payload").getField(name), p.getField(name))

    src = pick("source")
    op_raw = pick("op")
    # schema-change-topic records (Debezium's DDL events) carry the
    # statement in `ddl` and no c/u/d/r op — classify them with the
    # SAME prefix classifier the binlog QueryEvent path uses (S4,
    # operators/decode.classify_query): ALTER statements surface as
    # op='alter' + sql, exactly what the AlterOrchestrator's DDL
    # watcher filters on (tests/test_debezium.py pins the composition
    # end to end), while non-ALTER DDL (the CREATE/DROP/TRUNCATE
    # bursts a Debezium snapshot emits per captured table) classifies
    # 'unknown' — routable, but never a spurious schema registration
    # or pipe restart.
    from ..operators.decode import classify_query

    ddl = pick("ddl")
    op = F.when(ddl.isNotNull(), classify_query(ddl)).otherwise(
        F.create_map(
            *[x for kv in _OP_MAP.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        )[op_raw]
    )
    before = pick("before")
    after = pick("after")
    ts_ms = F.coalesce(src.getField("ts_ms"), pick("ts_ms"))
    txid = F.coalesce(
        pick("transaction").getField("id"), src.getField("txId")
    )
    out = df.select(
        F.coalesce(src.getField("pos"), ts_ms).alias("seq"),
        op.alias("op"),
        F.coalesce(src.getField("db"), pick("databaseName")).alias("database"),
        src.getField("table").alias("table"),
        F.lit(None).cast("long").alias("table_id"),
        txid.alias("txid"),
        F.timestamp_millis(ts_ms).alias("ts"),
        ddl.alias("sql"),
        *[
            _typed_map(before, table_schema, k).alias(f"old_{k}")
            for k in ("integers", "longs", "strings", "bytes")
        ],
        *[
            _typed_map(after, table_schema, k).alias(f"new_{k}")
            for k in ("integers", "longs", "strings", "bytes")
        ],
        # the ORIGINAL column, never the string cast: a binary Kafka
        # value with invalid UTF-8 (a misrouted Avro record — exactly
        # what dead-letters) would come back with U+FFFD replacement
        # characters, unreplayable after the routing fix (round-8
        # review). String sources pass through unchanged.
        *([F.col(value_col).alias("raw_value")] if keep_raw else []),
    )
    return out
