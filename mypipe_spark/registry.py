"""Versioned schema registry (SURVEY §2.11, R1-R7).

Rebuilds the reference's Avro schema-repository client semantics —
bi-directional id↔schema caches per subject, a latest-schema cache
with explicit flush, register-returns-id — as a plain Python
component (reference: mypipe-avro/.../GenericSchemaRepository.scala:10-260,
InMemorySchemaRepo.scala:6-12).

"Schemas" here are strings: a Spark StructType's ``.json()``, an Avro
schema JSON, or any serialized descriptor. Ids are per-subject Shorts
starting at 1, exactly the 2-byte ids the wire format frames
(KafkaGenericAvroSerializer.scala:32-33).

On a cluster the registry contents are a driver-side dict that gets
**broadcast** with the query plan (it is a few KB — never a shuffle).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql.types import StructType

from .model import generic_subject, specific_subject


@dataclass
class _Subject:
    by_id: dict[int, str] = field(default_factory=dict)
    by_schema: dict[str, int] = field(default_factory=dict)
    latest_id: int = 0


class SchemaRegistry:
    """In-memory versioned schema store + caching-client semantics.

    Mirrors the trait at GenericSchemaRepository.scala:10-35:

      - ``register(subject, schema) -> id`` (idempotent per schema text)
      - ``get_schema(subject, id) -> schema``
      - ``get_schema_id(subject, schema) -> id``
      - ``get_latest(subject, flush_cache=False) -> (id, schema)``

    The *latest* cache is the one that can go stale in the reference
    (a new schema version registered elsewhere); ``flush_cache=True``
    re-reads the authoritative store — that is the flush-and-retry the
    Kafka serializer performs on a build failure
    (KafkaAvroSerializer.scala:41-67).
    """

    MAX_ID = 0x7FFF  # wire format carries a 2-byte big-endian Short

    def __init__(self) -> None:
        self._store: dict[str, _Subject] = {}
        self._latest_cache: dict[str, tuple[int, str]] = {}
        self._lock = threading.RLock()

    # -- writes -------------------------------------------------------------

    def register(self, subject: str, schema: str | StructType) -> int:
        text = schema.json() if isinstance(schema, StructType) else schema
        with self._lock:
            sub = self._store.setdefault(subject, _Subject())
            if text in sub.by_schema:
                return sub.by_schema[text]
            new_id = sub.latest_id + 1
            if new_id > self.MAX_ID:
                raise OverflowError(f"subject {subject} exceeded 2-byte schema-id space")
            sub.by_id[new_id] = text
            sub.by_schema[text] = new_id
            sub.latest_id = new_id
            # registering through this client keeps its own latest fresh
            self._latest_cache[subject] = (new_id, text)
            return new_id

    # -- reads --------------------------------------------------------------

    def get_schema(self, subject: str, schema_id: int) -> str | None:
        sub = self._store.get(subject)
        return sub.by_id.get(schema_id) if sub else None

    def get_schema_id(self, subject: str, schema: str | StructType) -> int | None:
        text = schema.json() if isinstance(schema, StructType) else schema
        sub = self._store.get(subject)
        return sub.by_schema.get(text) if sub else None

    def get_latest(self, subject: str, flush_cache: bool = False) -> tuple[int, str] | None:
        with self._lock:
            if flush_cache:
                self._latest_cache.pop(subject, None)
            if subject in self._latest_cache:
                return self._latest_cache[subject]
            sub = self._store.get(subject)
            if not sub or not sub.latest_id:
                return None
            entry = (sub.latest_id, sub.by_id[sub.latest_id])
            self._latest_cache[subject] = entry
            return entry

    def subjects(self) -> list[str]:
        return sorted(self._store)

    def versions(self, subject: str) -> list[int]:
        sub = self._store.get(subject)
        return sorted(sub.by_id) if sub else []


GENERIC_ENVELOPE_DESCRIPTOR = "mypipe_spark.generic_envelope.v1"


def in_memory_repo() -> SchemaRegistry:
    """The pre-seeded in-memory repo (R3): registers the three generic
    envelope subjects the way GenericInMemorySchemaRepo.scala:13-17
    pre-registers insert/update/delete envelope schemas."""
    reg = SchemaRegistry()
    for mtype in ("insert", "update", "delete"):
        reg.register(generic_subject(mtype), GENERIC_ENVELOPE_DESCRIPTOR)
    return reg


def register_table(
    reg: SchemaRegistry, database: str, table: str, schema: StructType
) -> dict[str, int]:
    """R6 — register one table's StructType under all three mutation
    subjects (the RegisterSchemaApp CLI analog); returns subject→id."""
    return {
        (s := specific_subject(database, table, mtype)): reg.register(s, schema)
        for mtype in ("insert", "update", "delete")
    }


# ---------------------------------------------------------------------------
# persistence (file-backed store for the CLI / cross-process sharing)
# ---------------------------------------------------------------------------


def save_registry(reg: SchemaRegistry, path: str) -> None:
    """Serialize the full versioned store to JSON — the durable
    backing the reference gets from its AVRO-1124 REST repository
    (GenericSchemaRepository.scala:42-260); here a plain file works
    because the registry is tiny and read-mostly."""
    import json

    data = {
        subject: {str(i): reg.get_schema(subject, i) for i in reg.versions(subject)}
        for subject in reg.subjects()
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=2, sort_keys=True)


def load_registry(path: str) -> SchemaRegistry:
    """Rebuild a SchemaRegistry from :func:`save_registry` output,
    preserving version ids (registration replays in id order)."""
    import json

    with open(path) as f:
        data = json.load(f)
    reg = SchemaRegistry()
    for subject, versions in data.items():
        for i in sorted(versions, key=int):
            assigned = reg.register(subject, versions[i])
            if assigned != int(i):
                raise ValueError(
                    f"non-contiguous version ids for {subject}: {sorted(versions)}"
                )
    return reg
