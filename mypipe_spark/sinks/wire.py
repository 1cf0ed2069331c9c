"""Kafka wire-format framing — pure binary column expressions.

Every encoded message is ``[MAGIC 0x0 (1B)][MTYPE (1B)][SCHEMA_ID
big-endian short (2B)][payload]`` (reference: kafka/package.scala:5-24,
framing KafkaAvroSerializer.scala:189-201, parsing
KafkaAvroDecoder.scala:20-23,33-66).

The payload codec is pluggable: the reference writes Avro; this engine
writes JSON by default (the spark-avro jar is not on the classpath in
this environment) and upgrades to ``to_avro``/``from_avro``
transparently when available — framing, header semantics, and registry
interplay are identical either way. Everything here is expression-level
(`concat`/`substring`/`unhex` on BinaryType), so encode/decode runs
inside whole-stage codegen with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..model import MUTATION_MAGIC, WIRE_MAGIC, generic_subject
from ..registry import SchemaRegistry

try:  # optional fast path when the avro data source jar is present
    from pyspark.sql.avro.functions import from_avro, to_avro  # noqa: F401

    _AVRO_IMPORTABLE = True
except Exception:  # pragma: no cover
    _AVRO_IMPORTABLE = False

_AVRO_PROBE: dict[str, bool] = {}


def avro_available(spark) -> bool:
    """Functional probe for the spark-avro data source. The Python
    module ``pyspark.sql.avro.functions`` always imports (it is shipped
    with pyspark), but calling ``to_avro`` raises
    AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE unless the external
    spark-avro jar is on the JVM classpath — so availability must be
    probed by executing, not importing. Cached per session, keyed on
    applicationId (not ``id(spark)``: a recycled session address would
    serve a stale probe result — the same hazard the table and shingle
    caches guard against); stale sessions' entries are evicted."""
    key = spark.sparkContext.applicationId
    if key not in _AVRO_PROBE:
        _AVRO_PROBE.clear()  # at most one live session per process
        ok = False
        if _AVRO_IMPORTABLE:
            try:
                spark.range(1).select(
                    to_avro(F.struct(F.lit(1).alias("x")))
                ).collect()
                ok = True
            except Exception:
                ok = False
        _AVRO_PROBE[key] = ok
    return _AVRO_PROBE[key]


# Import-level hint only — see avro_available() for the real check.
HAVE_AVRO = _AVRO_IMPORTABLE

# ---------------------------------------------------------------------------
# byte-level helpers
# ---------------------------------------------------------------------------


def _byte(value: int) -> Column:
    """One literal byte as BinaryType."""
    return F.lit(bytes([value]))


def _short_be(value_col: Column) -> Column:
    """Int column → 2-byte big-endian binary (the schema-id Short,
    reference: KafkaGenericAvroSerializer.scala:32-33).

    Ids outside [0, 0xFFFF] raise at execution time instead of being
    silently truncated to the leftmost hex chars — a corrupted wire
    header must never be produced. A NULL id propagates NULL (the
    whole frame concats to NULL): a control row or an op whose subject
    was never registered is "nothing to encode", not a reason to kill
    the query — previously the NULL fell through the range check into
    raise_error and one begin/commit row failed the entire stream.
    Route such rows with :func:`encode_dead_letter_split` (or filter
    ``value IS NOT NULL``)."""
    v = value_col.cast("int")
    checked = F.when(v.isNull(), F.lit(None).cast("int")).when(
        (v >= 0) & (v <= 0xFFFF), v
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("schema id out of 2-byte range: "), v.cast("string")
            )
        )
    )
    return F.unhex(F.lpad(F.hex(checked), 4, "0"))


def _short_be_decode(bin_col: Column) -> Column:
    """2 bytes → int (reference decoder: KafkaAvroDecoder.scala:20-22)."""
    return F.conv(F.hex(bin_col), 16, 10).cast("int")


def mtype_byte(op: Column | str = "op") -> Column:
    """Mutation magic byte: insert=0x1 update=0x2 delete=0x3
    (reference: event/package.scala:149-152)."""
    c = F.col(op) if isinstance(op, str) else op
    expr = F.when(c == "insert", _byte(MUTATION_MAGIC["insert"]))
    expr = expr.when(c == "update", _byte(MUTATION_MAGIC["update"]))
    return expr.when(c == "delete", _byte(MUTATION_MAGIC["delete"]))


# ---------------------------------------------------------------------------
# envelope construction (generic flavor — the any-table typed maps)
# ---------------------------------------------------------------------------

# The generic envelope's payload body (mutations.avsc:10-148): header +
# typed maps. Insert carries the after image in plain maps, delete the
# before image, update both as old_*/new_* — this union struct covers
# all three so one column type serves the whole stream.
def _payload_json_schema() -> str:
    """Derived from the canonical field declaration in model so the
    DDL twin, the Avro writer schema, and the JVM null-strip struct
    can never drift apart field-by-field — including the kind→DDL
    translation itself (model.ENVELOPE_KIND_DDL, shared with the
    pure-Python codec; round-11 review)."""
    from ..model import ENVELOPE_FIELDS, ENVELOPE_KIND_DDL

    return ", ".join(
        f"{name} {ENVELOPE_KIND_DDL[kind]}" for name, kind in ENVELOPE_FIELDS
    )


_PAYLOAD_JSON_SCHEMA = _payload_json_schema()


# Avro twin of _PAYLOAD_JSON_SCHEMA — the reference's generic envelope
# record (mypipe-avro/src/main/avro/mutations.avsc:10-148) as one union
# record covering insert/update/delete. Used by the codec="avro" path.
def _payload_avro_schema() -> str:
    import json

    def nullable(t):
        return ["null", t]

    def m(values):
        return {"type": "map", "values": values}

    from ..model import ENVELOPE_FIELDS

    fields = [
        {
            "name": name,
            "type": nullable(
                m(kind.removeprefix("map_")) if kind.startswith("map_") else kind
            ),
            "default": None,
        }
        for name, kind in ENVELOPE_FIELDS
    ]
    return json.dumps(
        {
            "type": "record",
            "name": "GenericMutation",
            "namespace": "mypipe_spark.wire",
            "fields": fields,
        }
    )


PAYLOAD_AVRO_SCHEMA = _payload_avro_schema()


def generic_envelope(df: DataFrame) -> DataFrame:
    """Project change events into the generic envelope struct column
    ``payload`` (header enrichment F6 + typed-map projection F4).

    Insert → plain maps from the after image; delete → plain maps from
    the before image; update → old_*/new_* pairs
    (reference: KafkaGenericAvroSerializer.scala:54-60,
    KafkaAvroSerializer.scala:149-160)."""
    is_ins = F.col("op") == "insert"
    is_del = F.col("op") == "delete"
    is_upd = F.col("op") == "update"

    def plain(kind: str) -> Column:
        return (
            F.when(is_ins, F.col(f"new_{kind}"))
            .when(is_del, F.col(f"old_{kind}"))
            .otherwise(F.lit(None))
        )

    def upd(prefix: str, kind: str) -> Column:
        return F.when(is_upd, F.col(f"{prefix}_{kind}")).otherwise(F.lit(None))

    payload = F.struct(
        F.col("database"),
        F.col("table"),
        F.col("table_id").alias("tableId"),
        F.col("txid"),
        plain("bytes").alias("bytes"),
        plain("integers").alias("integers"),
        plain("strings").alias("strings"),
        plain("longs").alias("longs"),
        *[upd("old", k).alias(f"old_{k}") for k in ("bytes", "integers", "strings", "longs")],
        *[upd("new", k).alias(f"new_{k}") for k in ("bytes", "integers", "strings", "longs")],
    )
    return df.withColumn("payload", payload)


def with_schema_id(df: DataFrame, registry: SchemaRegistry) -> DataFrame:
    """Resolve the generic-envelope schema id per row from the registry
    (subject ``generic_<op>``) as a constant-folded literal map — the
    registry is driver-side and tiny, so it ships inside the plan, no
    join, no shuffle."""
    pairs: list[Column] = []
    for op in ("insert", "update", "delete"):
        latest = registry.get_latest(generic_subject(op))
        if latest:
            pairs += [F.lit(op), F.lit(latest[0])]
    # empty registry (no generic subject registered at all): every row
    # gets a NULL id and the dead-letter split diverts it — the empty
    # F.create_map()[op] expression would instead fail ANALYSIS
    # (map<void,void> lookup) and kill the pipe (round-11 review;
    # mirrors encode_specific's pinned-subject guard)
    ids = (
        F.create_map(*pairs)[F.col("op")]
        if pairs
        else F.lit(None).cast("int")
    )
    return df.withColumn("schema_id", ids)


# ---------------------------------------------------------------------------
# frame / unframe
# ---------------------------------------------------------------------------


def frame(payload: Column, mtype: Column, schema_id: Column) -> Column:
    """``[0x0][mtype][schema_id BE short][payload]`` → BinaryType."""
    return F.concat(_byte(WIRE_MAGIC), mtype, _short_be(schema_id), payload)


def encode_generic(
    df: DataFrame, registry: SchemaRegistry, codec: str = "json",
    strict_txid: bool = False,
) -> DataFrame:
    """Mutations → framed wire bytes in column ``value`` (K5+K7).

    ``codec="json"`` (default): UTF-8 JSON payload; binary map values
    are base64 inside the JSON, which `decode_generic` round-trips.
    ``codec="avro"``: Avro binary against PAYLOAD_AVRO_SCHEMA — the
    JVM ``to_avro`` when the spark-avro jar is on the classpath, else
    the pure-Python Arrow-batched codec (sinks/avro_codec.py), which
    writes the same bytes for the same writer schema.
    ``codec="avro_ref"``: the REFERENCE's actual wire records
    (mutations.avsc Insert/Update/DeleteMutation with the fixed-16
    Guid txid; KafkaAvroSerializer.scala:189-201) — the true
    reference-topic interop format, always pure-Python. Non-UUID
    txids (Debezium GTIDs, numeric txIds) map deterministically onto
    the Guid via uuid5 (avro_codec.txid_to_guid) so a Debezium-fed
    stream is never wholesale diverted; ``strict_txid=True`` restores
    the divert-to-dead-letter behavior for exact-parity pipelines."""
    enveloped = with_schema_id(generic_envelope(df), registry)
    if codec == "avro":
        if avro_available(df.sparkSession):
            # PAYLOAD_AVRO_SCHEMA's map values are non-nullable (like
            # the reference's, which drops null columns via v.isDefined
            # guards) — strip NULL map values BEFORE to_avro so the
            # JVM path neither fails on them nor diverges from the
            # pure-Python fallback's skip behavior.
            from ..model import (
                ENVELOPE_HEADER_FIELDS,
                ENVELOPE_MAP_FIELDS,
            )

            stripped = F.struct(
                *[
                    F.col(f"payload.{n}").alias(n)
                    for n in ENVELOPE_HEADER_FIELDS
                ],
                *[
                    F.map_filter(
                        F.col(f"payload.{n}"), lambda _, v: v.isNotNull()
                    ).alias(n)
                    for n in ENVELOPE_MAP_FIELDS
                ],
            )
            payload_bytes = to_avro(stripped, PAYLOAD_AVRO_SCHEMA)
        else:
            from .avro_codec import avro_encode_expr

            payload_bytes = avro_encode_expr(F.col("payload"), F.col("op"))
    elif codec == "avro_ref":
        from .avro_codec import avro_encode_expr

        payload_bytes = avro_encode_expr(
            F.col("payload"), F.col("op"), ref=True, strict_txid=strict_txid
        )
    elif codec == "json":
        payload_bytes = F.encode(F.to_json(F.col("payload")), "UTF-8")
    else:
        raise ValueError(f"unknown payload codec: {codec!r}")
    return enveloped.withColumn(
        "value", frame(payload_bytes, mtype_byte("op"), F.col("schema_id"))
    )


def encode_dead_letter_split(
    df: DataFrame, registry: SchemaRegistry, codec: str = "json",
    strict_txid: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Encode-side twin of :func:`frame_dead_letter_split`: rows the
    serializer cannot frame divert to a dead-letter branch instead of
    poisoning the producer query (the reference's serializer returns
    None on a failed serialize and the producer skips,
    KafkaAvroSerializer.scala:189-201).

    - ``not_a_mutation``       — op NULL or outside insert/update/
      delete (begin/commit/rollback/alter control rows piped in
      unfiltered; a NULL op must not slip through as "valid" just
      because ``isin`` evaluates NULL on it — it would encode to a
      silent NULL frame)
    - ``unregistered_subject`` — mutation op whose generic subject has
      no registered schema (the id lookup would be NULL)
    - ``serialize_failure``    — a row the codec itself could not
      serialize (POST-encode check: the pure-Python avro codecs emit a
      NULL body when per-row encoding throws — e.g. a non-UUID txid
      under ``codec='avro_ref', strict_txid=True``, whose Guid field
      is fixed(16); the default maps such txids via uuid5 instead of
      diverting, avro_codec.txid_to_guid). Without this class those
      rows would leave as silent NULL frames (Kafka tombstones) —
      data loss with zero diagnostics.

    Returns ``(encoded_valid, dead)``; valid rows carry the framed
    ``value`` from :func:`encode_generic`, and every valid row's frame
    is non-NULL."""
    known_ops = [
        op
        for op in ("insert", "update", "delete")
        if registry.get_latest(generic_subject(op))
    ]
    reason = F.when(
        F.col("op").isNull() | ~F.col("op").isin("insert", "update", "delete"),
        "not_a_mutation",
    ).when(
        ~F.col("op").isin(known_ops) if known_ops else F.lit(True),
        "unregistered_subject",
    )
    classified = df.withColumn("dlq_reason", reason)
    valid = classified.filter(F.col("dlq_reason").isNull()).drop("dlq_reason")
    dead = classified.filter(F.col("dlq_reason").isNotNull())
    encoded = encode_generic(valid, registry, codec, strict_txid=strict_txid)
    failed = (
        encoded.filter(F.col("value").isNull())
        .drop("value", "payload", "schema_id")
        .withColumn("dlq_reason", F.lit("serialize_failure"))
    )
    return (
        encoded.filter(F.col("value").isNotNull()),
        dead.unionByName(failed, allowMissingColumns=True),
    )


def unframe(value: Column) -> dict[str, Column]:
    """Split a framed message into header fields + payload bytes
    (reference decoder: KafkaAvroDecoder.scala:33-66). Callers check
    ``magic_ok`` the way the reference checks its magic byte."""
    return {
        "magic_ok": F.substring(value, 1, 1) == _byte(WIRE_MAGIC),
        "mtype": _short_be_decode(F.substring(value, 2, 1)),
        "schema_id": _short_be_decode(F.substring(value, 3, 2)),
        "payload": value.substr(F.lit(5), F.length(value)),
    }


def decode_generic(
    df: DataFrame, value_col: str = "value", codec: str = "json"
) -> DataFrame:
    """Framed wire bytes → header columns + decoded envelope struct.

    Validates the magic byte, extracts mtype/schema_id, and decodes the
    payload into the generic envelope struct (K9/K10) with the same
    codec that framed it (see :func:`encode_generic`)."""
    v = F.col(value_col)
    parts = unframe(v)
    if codec == "avro":
        if avro_available(df.sparkSession):
            # PERMISSIVE, matching frame_dead_letter_split and the
            # pure-Python fallback (all-null struct on a malformed
            # body) — the JVM default is FAILFAST, where one corrupt
            # frame kills the whole query while the jar-less path on
            # the same pipeline keeps running (round-8 review)
            payload = from_avro(
                parts["payload"], PAYLOAD_AVRO_SCHEMA, {"mode": "PERMISSIVE"}
            )
        else:
            from .avro_codec import avro_decode_expr

            payload = avro_decode_expr(
                parts["payload"], _op_from_mtype(parts["mtype"])
            )
    elif codec == "avro_ref":
        from .avro_codec import avro_decode_expr

        payload = avro_decode_expr(
            parts["payload"], _op_from_mtype(parts["mtype"]), ref=True
        )
    elif codec == "json":
        payload = F.from_json(
            F.decode(parts["payload"], "UTF-8"), _PAYLOAD_JSON_SCHEMA
        )
    else:
        raise ValueError(f"unknown payload codec: {codec!r}")
    df = (
        df.withColumn("magic_ok", parts["magic_ok"])
        .withColumn("mtype", parts["mtype"])
        .withColumn("schema_id", parts["schema_id"])
        .withColumn("payload", payload)
    )
    return df.withColumn("op", _op_from_mtype(F.col("mtype")))


def _op_from_mtype(mtype: Column) -> Column:
    return (
        F.when(mtype == MUTATION_MAGIC["insert"], "insert")
        .when(mtype == MUTATION_MAGIC["update"], "update")
        .when(mtype == MUTATION_MAGIC["delete"], "delete")
    )


def decoded_change_events(df: DataFrame) -> DataFrame:
    """Decoded wire rows (``op`` + ``payload`` struct, from
    :func:`decode_generic` / :func:`frame_dead_letter_split`) → the
    canonical CHANGE_EVENT_SCHEMA column set — the inverse of
    :func:`generic_envelope`'s typed-map projection, so a downstream
    Kafka consumer re-enters the same transform library the binlog
    path uses (the reference's consumer decodes back to Mutation
    objects the same way, KafkaMutationAvroDecoder.scala).

    The wire envelope carries no seq/ts/sql; when the source is Kafka
    its record coordinates stand in (``offset`` → seq — the
    (file, pos) analog within a partition — and the broker
    ``timestamp`` → ts), else they are NULL."""
    p = F.col("payload")
    is_ins = F.col("op") == "insert"
    is_del = F.col("op") == "delete"
    is_upd = F.col("op") == "update"

    def old(kind: str) -> Column:
        return (
            F.when(is_upd, p[f"old_{kind}"])
            .when(is_del, p[kind])
            .alias(f"old_{kind}")
        )

    def new(kind: str) -> Column:
        return (
            F.when(is_upd, p[f"new_{kind}"])
            .when(is_ins, p[kind])
            .alias(f"new_{kind}")
        )

    seq = (
        F.col("offset") if "offset" in df.columns else F.lit(None).cast("long")
    )
    ts = (
        F.col("timestamp").cast("timestamp")
        if "timestamp" in df.columns
        else F.lit(None).cast("timestamp")
    )
    return df.select(
        seq.alias("seq"),
        F.col("op"),
        p["database"].alias("database"),
        p["table"].alias("table"),
        p["tableId"].alias("table_id"),
        p["txid"].alias("txid"),
        ts.alias("ts"),
        F.lit(None).cast("string").alias("sql"),
        old("bytes"), old("integers"), old("strings"), old("longs"),
        new("bytes"), new("integers"), new("strings"), new("longs"),
    )


def frame_dead_letter_split(
    df: DataFrame,
    registry: SchemaRegistry | None,
    value_col: str = "value",
    codec: str = "json",
) -> tuple[DataFrame, DataFrame]:
    """Classify framed messages BEFORE decoding and divert malformed
    ones to a dead-letter branch — the decode layer of the reference's
    3-layer error cascade (binaryLogConsumerTraits.scala:89-137), where
    a frame the decoder cannot parse must skip-and-divert, never kill
    the consumer. Running :func:`decode_generic` blind would do exactly
    that: under ANSI mode ``decode`` throws on invalid UTF-8 and takes
    the whole executor task (and query) with it.

    Checks run in cascade order, first failure wins as ``dlq_reason``
    (CaseWhen evaluates lazily per row, so the UTF-8 probe only runs on
    frames with intact headers, and the JSON parse only on valid
    UTF-8):

    - ``null_frame``     — NULL value (a Kafka compacted-topic
      tombstone reaching a non-compacted consumer; without this check
      every cascade predicate evaluates NULL and the tombstone would
      sail through as "valid" and decode to all-null columns)
    - ``short_frame``    — fewer than the 4 header bytes + 1
    - ``bad_magic``      — first byte is not the wire magic 0x0
    - ``unknown_mtype``  — mutation byte outside insert/update/delete
    - ``unknown_schema`` — schema id not registered for any generic
      subject (the reference's decoder fails a lookup miss the same
      way, KafkaAvroDecoder.scala:43-55)
    - ``bad_payload``    — payload is not valid UTF-8, or JSON that
      does not parse into an envelope (the envelope always carries
      ``database``; a parse yielding none is garbage)

    ``codec`` must match the one that framed the stream (see
    :func:`encode_generic`): with ``codec="avro"`` the UTF-8 probe is
    meaningless (Avro bodies are arbitrary bytes), so the payload
    check becomes a PERMISSIVE ``from_avro`` parse — a frame whose
    body does not deserialize into the envelope classifies
    ``bad_payload`` the same way. Mismatching the codec diverts the
    entire stream as ``bad_payload`` rather than erroring.

    Returns ``(decoded_valid, dead)``: valid frames carry the
    :func:`decode_generic` column shape (the payload struct comes from
    the ONE guarded parse that classification already did — the hot
    path never parses twice); dead ones keep the raw frame plus
    ``dlq_reason`` (the :mod:`..streaming.errors` DLQ convention). All
    expression-level — each branch plans as a single codegen'd scan
    over the source (two consumers mean two scans, as with any pair of
    derived DataFrames; under streaming each branch is its own query
    anyway)."""
    v = F.col(value_col)
    # registry=None skips the unknown_schema check (a registry-less
    # consumer — e.g. the runner's generic Kafka pipe — still gets the
    # structural header/payload cascade)
    known_ids = (
        sorted(
            {
                i
                for op in ("insert", "update", "delete")
                for i in registry.versions(generic_subject(op))
            }
        )
        if registry is not None
        else None
    )
    mtypes = sorted(MUTATION_MAGIC.values())
    parts = unframe(v)
    # ONE parse, guarded so ANSI decode() only ever sees valid UTF-8
    # (CaseWhen evaluates lazily per row); both the classification and
    # the valid branch's payload column read this projection.
    if codec == "json":
        utf8_ok = F.is_valid_utf8(parts["payload"])
        parsed = F.when(
            (F.length(v) >= 5) & utf8_ok,
            F.from_json(
                F.decode(parts["payload"], "UTF-8"), _PAYLOAD_JSON_SCHEMA
            ),
        )
        payload_ok = utf8_ok
    elif codec in ("avro", "avro_ref"):
        if codec == "avro" and avro_available(df.sparkSession):
            parsed = F.when(
                F.length(v) >= 5,
                from_avro(
                    parts["payload"], PAYLOAD_AVRO_SCHEMA, {"mode": "PERMISSIVE"}
                ),
            )
        else:
            # pure-Python codec: the decoder itself is permissive (a
            # malformed body yields an all-null struct, never a throw —
            # required, since a Python UDF inside CaseWhen is hoisted
            # into its own projection and runs for EVERY row)
            from .avro_codec import avro_decode_expr

            parsed = F.when(
                F.length(v) >= 5,
                avro_decode_expr(
                    parts["payload"],
                    _op_from_mtype(parts["mtype"]),
                    ref=(codec == "avro_ref"),
                ),
            )
        payload_ok = F.lit(True)  # the PERMISSIVE parse itself classifies
    else:
        raise ValueError(f"unknown payload codec: {codec!r}")
    classified = df.withColumn("__parsed", parsed)
    p = F.col("__parsed")
    if known_ids is None:  # registry-less consumer: skip the check
        schema_cond = F.lit(False)
    elif known_ids:
        schema_cond = ~parts["schema_id"].isin(known_ids)
    else:  # a registry with nothing registered knows no id
        schema_cond = F.lit(True)
    reason = (
        F.when(v.isNull(), "null_frame")
        .when(F.length(v) < 5, "short_frame")
        .when(~parts["magic_ok"], "bad_magic")
        .when(~parts["mtype"].isin(mtypes), "unknown_mtype")
        .when(schema_cond, "unknown_schema")
        .when(~payload_ok, "bad_payload")
        .when(p.isNull() | p["database"].isNull(), "bad_payload")
    )
    classified = classified.withColumn("dlq_reason", reason)
    valid = (
        classified.filter(F.col("dlq_reason").isNull())
        .withColumn("magic_ok", parts["magic_ok"])
        .withColumn("mtype", parts["mtype"])
        .withColumn("schema_id", parts["schema_id"])
        .withColumn("payload", p)
        .withColumn("op", _op_from_mtype(F.col("mtype")))
        .drop("dlq_reason", "__parsed")
    )
    dead = classified.filter(F.col("dlq_reason").isNotNull()).drop("__parsed")
    return valid, dead


def specific_projection(df: DataFrame, table_schema: StructType, image: str = "new") -> DataFrame:
    """F5 — *specific* envelope: project the typed maps back into real
    per-table columns according to a registered StructType (the
    specific Avro serializer's field copy,
    KafkaSpecificAvroSerializer.scala:40-53). A missing map COLUMN
    (e.g. a frame without ``new_integers``) fails at analysis time; a
    schema field NAME absent from a row's maps projects to NULL —
    map lookups are data-level, so per-row absence cannot be a plan
    error. That matches the reference's field copy, which writes only
    the keys present in the mutation and leaves the rest at their
    Avro-record defaults (null)."""
    cols: list[Column] = [F.col("database"), F.col("table"), F.col("table_id"), F.col("txid"), F.col("ts")]
    for field in table_schema.fields:
        name = field.name
        # bigint fields consult BOTH integer maps: a MySQL LONG column
        # rides the wire in 'longs' (reference rule), but a snapshot of
        # the same table buckets its Spark IntegerType read into
        # 'integers' — the projection must find the value either way
        # (int → bigint is a lossless widening).
        # try_cast, not cast: under ANSI mode (this repo's default) a
        # value that does not fit the declared type — a pre-ALTER
        # string frame projected under a post-ALTER INT schema, a
        # bigint narrowed into smallint — must project NULL for that
        # cell (and let coalesce consult the next map), never kill the
        # whole query at runtime (round-11 review; same permissive
        # posture as the docstring's per-row absence rule)
        src = (
            F.coalesce(
                F.col(f"{image}_integers").getItem(name).try_cast(field.dataType)
                if field.dataType.simpleString()
                in ("int", "smallint", "tinyint", "bigint")
                else F.lit(None).cast(field.dataType),
                F.col(f"{image}_longs").getItem(name).try_cast(field.dataType),
                F.col(f"{image}_strings").getItem(name).try_cast(field.dataType),
            )
            if field.dataType.simpleString() != "binary"
            else F.col(f"{image}_bytes").getItem(name)
        )
        cols.append(src.alias(name))
    return df.select(*cols)


# ---------------------------------------------------------------------------
# SPECIFIC wire path — framed per-table Avro records
# (KafkaMutationSpecificAvroProducer.scala:9-11 + KafkaSpecificAvroSerializer)
# ---------------------------------------------------------------------------


def encode_specific(
    df: DataFrame,
    table_schema: StructType,
    registry: SchemaRegistry,
    database: str | None = None,
    table: str | None = None,
) -> DataFrame:
    """Mutations → framed SPECIFIC-record wire bytes: the per-table
    Avro record (database, table, then the table's columns — update
    rows carry old_/new_ pairs) behind the same
    ``[magic][mtype][schema id]`` frame as the generic path. The
    schema id resolves per row from the registry's specific subject
    ``<db>_<table>_<op>`` via a plan-literal map (driver-side registry,
    no join); a mutation whose subject is unregistered gets a NULL
    schema_id and therefore a NULL frame — route through
    :func:`frame_dead_letter_split`'s null_frame class or register the
    table first (registry.register_table).

    INTEROP NOTE (stated plainly, like the generic path's): these
    specific bytes are NOT reference-topic compatible. The reference's
    per-table records (User-1-insert.avsc via
    KafkaSpecificAvroSerializer.scala:40-61) use NON-nullable column
    fields and dotted ``old.``/``new.`` field names; this path writes
    every column as a ``["null", T]`` union with ``old_``/``new_``
    underscore prefixes (nullable unions because a Spark row can carry
    NULL in any column — the reference relies on Avro record defaults
    instead, which the byte format here cannot assume). For true
    reference-topic bytes use ``codec='avro_ref'`` (the mutations.avsc
    union records), which IS wire-compatible. This path's decoder is
    :func:`decode_specific` / ``decode_specific_versioned`` — a
    matched pair, round-trip-tested against itself.

    SINGLE-TABLE CONTRACT: the body of every frame is laid out by THE
    ONE ``table_schema`` — pass ``database``/``table`` to pin the
    per-row schema-id lookup to that table's three subjects, so a row
    from any OTHER registered table gets a NULL id (→ NULL frame →
    dead-letter) instead of shipping another table's valid id over a
    body serialized with this table's layout (round-8 review: such
    frames passed the split as "valid" and misparsed at the
    consumer). Omitting db/table keeps the all-subjects lookup for
    single-table feeds that tag rows themselves."""
    from .avro_codec import specific_encode_expr

    enveloped = generic_envelope(df)
    from ..model import specific_subject

    wanted = (
        {specific_subject(database, table, op_)
         for op_ in ("insert", "update", "delete")}
        if database is not None and table is not None
        else None
    )
    pairs: list[Column] = []
    for s in registry.subjects():
        if wanted is not None and s not in wanted:
            continue
        latest = registry.get_latest(s)
        if latest:
            pairs += [F.lit(s), F.lit(latest[0])]
    # the per-row key must serialize EXACTLY like specific_subject's
    # f-string AND yield NULL when any coordinate is NULL: concat_ws
    # silently SKIPS nulls, so (NULL, 't', 'insert') would collapse to
    # 't_insert' and could match an unrelated registered subject —
    # shipping a "valid" frame with the wrong schema id instead of
    # dead-lettering (round-11 review; the round-8 mislabeled-frame
    # class through a different door)
    subject = F.when(
        F.col("database").isNotNull()
        & F.col("table").isNotNull()
        & F.col("op").isNotNull(),
        F.concat_ws("_", F.col("database"), F.col("table"), F.col("op")),
    )
    schema_id = F.create_map(*pairs)[subject] if pairs else F.lit(None).cast("int")
    payload_bytes = specific_encode_expr(
        F.col("payload"), F.col("op"), table_schema
    )
    return enveloped.withColumn("schema_id", schema_id).withColumn(
        "value", frame(payload_bytes, mtype_byte("op"), F.col("schema_id"))
    )


def decode_specific(
    df: DataFrame,
    table_schema: StructType,
    value_col: str = "value",
    which: str = "single",
) -> DataFrame:
    """Framed specific-record bytes → typed per-table columns.

    ``which="single"`` decodes insert/delete frames (one image),
    ``which="update"`` the update frames (old_/new_ column pairs) —
    two calls cover a mixed stream, mirroring the reference consumer's
    record-class choice by mutation byte. Malformed bodies decode to
    all-null structs (permissive), same as the generic codecs.
    Decodes THIS repo's specific bytes (nullable-union fields,
    underscore old_/new_ names) — not the reference's non-nullable
    dotted-name records; see the interop note on
    :func:`encode_specific`."""
    from .avro_codec import specific_decode_expr

    v = F.col(value_col)
    parts = unframe(v)
    if which == "update":
        mtypes = [MUTATION_MAGIC["update"]]
    elif which == "single":
        mtypes = [MUTATION_MAGIC["insert"], MUTATION_MAGIC["delete"]]
    else:
        raise ValueError(f"which must be 'single' or 'update', got {which!r}")
    filtered = df.filter(parts["mtype"].isin(mtypes))
    payload = specific_decode_expr(
        parts["payload"], _op_from_mtype(parts["mtype"]), table_schema, which
    )
    return (
        filtered.withColumn("magic_ok", parts["magic_ok"])
        .withColumn("mtype", parts["mtype"])
        .withColumn("schema_id", parts["schema_id"])
        .withColumn("op", _op_from_mtype(parts["mtype"]))
        .withColumn("record", payload)
    )


def decode_specific_versioned(
    df: DataFrame,
    registry: SchemaRegistry,
    database: str,
    table: str,
    value_col: str = "value",
    which: str = "single",
) -> dict[tuple[str, int], DataFrame]:
    """Versioned specific-record decode — the consumer side of schema
    evolution (K11; the reference decoder fetches the writer schema BY
    ID from the repo, KafkaAvroDecoder.scala:43-66). After an ALTER a
    topic carries frames written under several schema versions; each
    must decode with the schema its header id names, not the latest.

    Returns ``{(op, version_id): DataFrame}`` — one typed branch per
    (mutation type, registered version) whose StructType parses from
    the registry. Branch schemas legitimately differ (that is the
    point), so they cannot union; a consumer processes per-version,
    exactly as the reference's per-class decoding does.

    Cross-table guard (round-8 review): ids are PER-SUBJECT (every
    subject's versions start at 1), so on a topic carrying several
    tables' frames the (mtype, id) header pair alone would route a
    colliding other-table frame into this table's branch and decode
    its body under the wrong schema. The record body's first two
    fields are (database, table) at identical byte positions in EVERY
    specific schema, so they decode correctly even under a wrong
    table's schema — each branch therefore post-filters on the
    decoded coordinates, keeping only this table's frames (NULL
    coordinates — an undecodable body — stay in the branch, as
    before: that is the bad-payload surface, not a foreign table)."""
    import json as _json

    from pyspark.sql.types import StructType as _St

    from ..model import specific_subject

    v = F.col(value_col)
    parts = unframe(v)
    ops = ("update",) if which == "update" else ("insert", "delete")
    out: dict[tuple[str, int], DataFrame] = {}
    for op in ops:
        subject = specific_subject(database, table, op)
        for version in registry.versions(subject):
            text = registry.get_schema(subject, version)
            if text is None:
                continue
            from ..registry import struct_from_schema_text

            schema = struct_from_schema_text(text)
            if schema is None:
                continue  # non-StructType schema text: not decodable here
            branch = df.filter(
                (parts["mtype"] == MUTATION_MAGIC[op])
                & (parts["schema_id"] == version)
            )
            decoded = decode_specific(
                branch, schema, value_col=value_col, which=which
            )
            rec_db = F.col("record.database")
            rec_tbl = F.col("record.table")
            out[(op, version)] = decoded.filter(
                ~(
                    (rec_db.isNotNull() & (rec_db != database))
                    | (rec_tbl.isNotNull() & (rec_tbl != table))
                )
            )
    return out


def encode_specific_dead_letter_split(
    df: DataFrame,
    table_schema: StructType,
    registry: SchemaRegistry,
    database: str | None = None,
    table: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Specific-flavor twin of :func:`encode_dead_letter_split`:

    - ``not_a_mutation``       — control rows piped in unfiltered
    - ``unregistered_subject`` — no registered <db>_<table>_<op>
      subject (the per-row schema-id lookup is NULL), or — with
      ``database``/``table`` pinned (encode_specific's single-table
      contract) — a row belonging to a DIFFERENT table than the one
      this encoder's body layout serves
    - ``serialize_failure``    — the record codec threw for the row

    Returns ``(encoded_valid, dead)``; every valid frame is non-NULL."""
    classified = df.withColumn(
        "dlq_reason",
        F.when(
            F.col("op").isNull()
            | ~F.col("op").isin("insert", "update", "delete"),
            "not_a_mutation",
        ),
    )
    valid = classified.filter(F.col("dlq_reason").isNull()).drop("dlq_reason")
    dead = classified.filter(F.col("dlq_reason").isNotNull())
    encoded = encode_specific(
        valid, table_schema, registry, database=database, table=table
    )
    failed = (
        encoded.filter(F.col("value").isNull())
        .withColumn(
            "dlq_reason",
            F.when(F.col("schema_id").isNull(), "unregistered_subject").otherwise(
                "serialize_failure"
            ),
        )
        .drop("value", "payload", "schema_id")
    )
    return (
        encoded.filter(F.col("value").isNotNull()),
        dead.unionByName(failed, allowMissingColumns=True),
    )
