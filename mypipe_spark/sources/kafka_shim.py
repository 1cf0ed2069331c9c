"""File-backed ``format("kafka")`` stand-in — the wire twin that lets
the registered Kafka configuration (S14 consume / K4 produce) be
exercised END-TO-END in an environment with no broker binary and no
spark-sql-kafka connector jar (this sandbox has neither, so a socket
fake speaking the Kafka protocol would be unreachable anyway: Spark
cannot even load the ``kafka`` DataSource).

A Python DataSource (PySpark 4 ``pyspark.sql.datasource``) named
``kafkafile`` that speaks the EXACT surface of the real connector on
both sides, so production code switches between them by format name
alone (``sources.stream.kafka_stream(..., format=...)``,
producer option ``format``):

- **sink contract**: rows with ``topic`` (string), ``value`` (binary)
  and optional ``key`` (binary) — what ``operators.filters.with_topic``
  + ``sinks.wire.encode_generic`` + ``primary_key_string`` produce and
  ``sinks.producers.kafka_producer`` selects;
- **source contract**: the connector's record schema verbatim —
  ``key binary, value binary, topic string, partition int,
  offset bigint, timestamp timestamp, timestampType int`` — and its
  option names (``kafka.bootstrap.servers`` = the broker directory,
  ``subscribe``, ``startingOffsets``);
- **broker semantics**: one log per topic, strictly increasing
  offsets assigned at append, at-least-once produces (a retried task
  re-stages; only COMMITTED stagings reach the log — mirroring the
  connector's own semantics), resumable reads by offset.

Topics default to a single partition — the reference's default
deployment (KafkaProducer.scala:29-45 keys but does not partition).
Opt-in N-partition mode (sink option ``kafkafile.partitions=N`` at
topic CREATION; like the real broker, the partition count is topic
config — producing to an existing topic never changes it) models the
real contract exactly: keyed records route by Kafka's default
partitioner (murmur2(key) mod N — the twin reimplements murmur2 so
the key→partition mapping matches a real broker byte-for-byte),
NULL-key records round-robin, offsets are PER PARTITION, and the
consumer interleaves partitions with no cross-partition order — so
the per-(db,table) ordering guarantee the reference relies on
(README.md:119-124) holds exactly when produces are keyed, which
tests/test_kafka_shim.py pins positively (keyed order survives
partitioned produce + resume) and negatively (unkeyed round-robin
demonstrably breaks it). The per-row ``timestampType`` is 1
(LogAppendTime) — offsets and stamps are assigned by the "broker" at
commit, like a log-append-time topic.

This is a TEST DOUBLE for wire-contract verification, not a
production sink: single-process broker directory, JSON-lines storage
(binary as base64), no replication/compaction. The production path
stays ``format("kafka")`` with real brokers + connector jar.
"""

from __future__ import annotations

import base64
import datetime as dt
import json
import os
import re
import time
import uuid
from dataclasses import dataclass
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

# Kafka's own topic-name rule (kafka.common.Topic): the legal charset
# AND the two reserved names "." / ".." Kafka explicitly refuses —
# enforced at the sink so a bad topic fails per-row like the real
# broker, and so a topic name can never traverse out of the broker
# dir ("." would land log files in the broker root, ".." in its
# PARENT). The reader validates `subscribe` with the same rule.
_LEGAL_TOPIC = re.compile(r"(?!\.\.?$)[a-zA-Z0-9._-]{1,249}")
# broker-internal directories living beside the topic dirs: a topic
# named after one would interleave its log with in-flight claim/meta
# temps (and the documented recovery "delete _staging/" would delete
# a real topic's data), so both names are refused wherever topic
# legality is checked — a twin-only reservation the real broker does
# not need (its internals aren't files in the topic namespace)
_RESERVED_TOPICS = frozenset({"_staging", "_commits"})

# the spark-sql-kafka source schema, verbatim
KAFKA_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int,"
    " offset bigint, timestamp timestamp, timestampType int"
)

_UTC = dt.timezone.utc


def _b64(b) -> str | None:
    if b is None:
        return None
    if isinstance(b, str):
        # the real connector accepts string key/value columns and
        # casts them to binary (UTF-8); the twin must too, or the
        # format-name-only switch breaks exactly where it claims
        # drop-in parity
        b = b.encode("utf-8")
    return base64.b64encode(bytes(b)).decode("ascii")


def _unb64(s: str | None) -> bytes | None:
    return None if s is None else base64.b64decode(s)


def _topic_dir(broker: str, topic: str) -> str:
    return os.path.join(broker, topic)


_META_FILE = ".partitions"


def _murmur2(data: bytes) -> int:
    """Kafka's 32-bit murmur2 (seed 0x9747b28c) — reimplemented from
    the published algorithm (org.apache.kafka.common.utils.Utils
    .murmur2) so the twin's keyed-record partition routing,
    ``toPositive(murmur2(key)) % N``, matches the real default
    partitioner byte-for-byte: a consumer moving between the twin and
    a real broker sees the same key→partition mapping."""
    mask = 0xFFFFFFFF
    m = 0x5BD1E995
    length = len(data)
    h = (0x9747B28C ^ length) & mask
    n4 = length & ~3
    for i in range(0, n4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * m) & mask
        k ^= k >> 24
        k = (k * m) & mask
        h = (h * m) & mask
        h ^= k
    rem = length & 3
    if rem >= 3:
        h ^= (data[n4 + 2] & 0xFF) << 16
    if rem >= 2:
        h ^= (data[n4 + 1] & 0xFF) << 8
    if rem >= 1:
        h ^= data[n4] & 0xFF
        h = (h * m) & mask
    h ^= h >> 13
    h = (h * m) & mask
    h ^= h >> 15
    return h


def _partition_for_key(key: bytes, n: int) -> int:
    return (_murmur2(key) & 0x7FFFFFFF) % n


def _topic_partitions(tdir: str) -> int:
    """Partition count of an existing topic: the .partitions metadata
    file if present, else 1 (the flat single-partition layout every
    pre-round-9 broker dir uses)."""
    meta = os.path.join(tdir, _META_FILE)
    if os.path.exists(meta):
        with open(meta, "r", encoding="ascii") as f:
            return int(f.read().strip())
    return 1


def _partition_dir(tdir: str, n: int, p: int) -> str:
    """Partition p's log directory: the topic dir itself for
    single-partition topics (backward-compatible flat layout), a
    p-NNNNN subdir otherwise."""
    return tdir if n == 1 else os.path.join(tdir, f"p-{p:05d}")


def _ensure_topic(broker: str, tdir: str, n_opt: int) -> int:
    """Create the topic if absent (with ``n_opt`` partitions); an
    EXISTING topic keeps its own count — like the real broker, the
    partition count is topic configuration, and a producer option can
    never repartition a topic that already has a log. The metadata
    file is published with the same staged-content + create-only
    ``os.link`` pattern as ``_append_log_file``: the file only ever
    appears WITH its count already written, so a racing loser (or a
    concurrent ``_topic_partitions`` reader) can never observe an
    empty meta file — O_CREAT|O_EXCL alone would make the name
    visible before its content.

    Racing the first-ever produce of one topic with CONFLICTING
    partition counts (one flat, one partitioned) is undefined — the
    flat leg can append root log files in the window before the meta
    claim lands, and those records are invisible to partitioned
    readers. The real broker has no such race only because topics are
    created administratively; create consistently (or pre-create by
    producing once) before fanning out."""
    os.makedirs(tdir, exist_ok=True)
    meta = os.path.join(tdir, _META_FILE)
    if n_opt > 1 and not os.path.exists(meta) and not _data_files(tdir):
        # a lost creation race is fine: use the winner's count
        _link_staged(broker, str(n_opt), meta)
    n = _topic_partitions(tdir)
    for p in range(n):
        os.makedirs(_partition_dir(tdir, n, p), exist_ok=True)
    return n


def _data_files(tdir: str) -> list[str]:
    """Topic log files in offset order (named data-<start offset>)."""
    if not os.path.isdir(tdir):
        return []
    return sorted(
        os.path.join(tdir, f)
        for f in os.listdir(tdir)
        if f.startswith("data-") and f.endswith(".jsonl")
    )


# data-N.jsonl files are IMMUTABLE once linked (created complete via
# the staged-content claim), so a file's record count never changes —
# without this cache every trigger re-reads the whole last log file
# just to derive the next offset, O(tail-file size) of redundant I/O
# per trigger even when idle (round-10 review), undercutting _scan's
# own never-open-unneeded-files optimization. Keyed (path, size,
# mtime_ns, ino, dev) so a recreated same-name file can't serve a
# stale count even within one coarse-mtime tick; bounded so a long
# session over many ephemeral test brokers can't grow it without
# limit.
_COUNT_CACHE: dict[tuple[str, int, int, int, int], int] = {}
_COUNT_CACHE_MAX = 8192


def _line_count(path: str) -> int:
    st = os.stat(path)
    # (inode, device) in the key (ADVICE r10): data files are
    # immutable once linked, so inode identity exactly captures a
    # broker dir deleted and recreated with a same-size file inside
    # one coarse-mtime tick — size+mtime alone could serve that
    # recreation a stale count and mis-derive offsets
    key = (path, st.st_size, st.st_mtime_ns, st.st_ino, st.st_dev)
    n = _COUNT_CACHE.get(key)
    if n is None:
        with open(path, "r", encoding="ascii") as f:
            n = sum(1 for _ in f)
        if len(_COUNT_CACHE) >= _COUNT_CACHE_MAX:
            _COUNT_CACHE.clear()
        _COUNT_CACHE[key] = n
    return n


def _next_offset(tdir: str) -> int:
    """Derived from the log itself (file start offset + record count
    of the LAST file) — no separate meta file to desynchronize."""
    files = _data_files(tdir)
    if not files:
        return 0
    last = files[-1]
    start = int(os.path.basename(last)[5:-6])
    return start + _line_count(last)


def _atomic_write_lines(path: str, lines: list[str]) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="ascii") as f:
        f.write("".join(lines))
    os.replace(tmp, path)


def _link_staged(broker: str, content: str, dest: str) -> bool:
    """ONE definition of the publish protocol shared by the log-slot
    claim and the topic-metadata claim (round-10 review: two copies
    had to be kept in lockstep): stage the content in the broker's
    ``_staging/`` (same filesystem, so link works; a crashed orphan
    lands where the documented recovery "delete _staging/" reclaims
    it, never loose in a topic dir), then ``os.link`` create-only at
    ``dest`` — the target can never be observed incomplete. Returns
    False when dest already existed (lost a creation race)."""
    staging = os.path.join(broker, "_staging")
    os.makedirs(staging, exist_ok=True)
    tmp = os.path.join(staging, f"claim.{uuid.uuid4().hex}")
    with open(tmp, "w", encoding="ascii") as f:
        f.write(content)
    try:
        os.link(tmp, dest)
        return True
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)


def _append_log_file(broker: str, tdir: str, lines: list[str]) -> int:
    """Claim the next log slot WITHOUT clobbering a concurrent
    committer: publish via _link_staged at the offset-derived name,
    recomputing the offset and retrying while another producer query
    races this one to the same topic (a lost race re-stages — rare,
    and strictly simpler than sharing one temp across retries).
    Returns the claimed start offset."""
    content = "".join(lines)
    while True:
        start = _next_offset(tdir)
        dest = os.path.join(tdir, f"data-{start:012d}.jsonl")
        if _link_staged(broker, content, dest):
            return start
        # lost the race: offset advanced, re-derive


@dataclass
class _Staged(WriterCommitMessage):
    path: str
    n: int


class _KafkaFileStreamWriter(DataSourceStreamWriter):
    """Producer half: tasks stage their records; the driver commit
    appends them to the per-topic logs with broker-assigned offsets
    (create-only link claims the offset slot, so two producer queries
    racing the same topic interleave batches instead of clobbering).
    A retried COMMIT is idempotent via the per-(run, batch) marker. A
    retried TASK (or a crash between marker and cleanup) leaves an
    orphan staging file behind — INERT (nothing ever reads an
    uncommitted staging; deliberately not swept, since a sweeper
    cannot tell an orphan from another query's in-flight staging;
    delete _staging/ to reclaim the test dir)."""

    def __init__(self, options, schema: StructType):
        self._broker = options.get("kafka.bootstrap.servers")
        if not self._broker:
            raise ValueError(
                "kafkafile sink requires option kafka.bootstrap.servers "
                "(the broker directory)"
            )
        names = set(schema.fieldNames())
        missing = {"topic", "value"} - names
        if missing:
            raise ValueError(
                f"kafkafile sink needs columns topic+value (key "
                f"optional); missing: {sorted(missing)}"
            )
        self._has_key = "key" in names
        # the real connector's other input columns: an explicit
        # 'partition' is HONORED (routes the record, like the real
        # producer; out-of-range fails at commit when the topic's
        # count is known); 'headers' is REFUSED loudly — the twin's
        # record format and read schema carry no headers, and
        # silently dropping them is the exact silent-drop class
        # sinks/producers.py exists to prevent
        self._has_partition = "partition" in names
        if "headers" in names:
            raise ValueError(
                "kafkafile sink does not support the 'headers' "
                "column (the twin's record format has no headers); "
                "drop the column or use the real kafka connector"
            )
        self._run_id = uuid.uuid4().hex
        # opt-in N-partition mode: applies to topics THIS writer
        # creates; existing topics keep their own count (_ensure_topic)
        try:
            self._n_partitions = int(options.get("kafkafile.partitions", "1"))
        except ValueError:
            raise ValueError(
                "kafkafile.partitions must be a positive int, got "
                f"{options.get('kafkafile.partitions')!r}"
            ) from None
        if self._n_partitions < 1:
            raise ValueError(
                f"kafkafile.partitions must be >= 1, got {self._n_partitions}"
            )

    def write(self, iterator: Iterator[Row]) -> _Staged:
        staging = os.path.join(self._broker, "_staging")
        os.makedirs(staging, exist_ok=True)
        path = os.path.join(staging, f"{uuid.uuid4().hex}.jsonl")
        lines = []
        for row in iterator:
            topic = row["topic"]
            if (
                topic is None
                or topic in _RESERVED_TOPICS
                or not _LEGAL_TOPIC.fullmatch(topic)
            ):
                # mirror the real broker's clear per-row refusal:
                # Kafka enforces [a-zA-Z0-9._-]{1,249} topic names, so
                # a NULL (null-propagating topic template), empty, or
                # separator-bearing topic fails HERE with the row in
                # hand — not as an opaque path error (or a log file
                # linked into the broker root) at commit
                raise ValueError(
                    f"kafkafile sink: illegal topic {topic!r} for a "
                    "row (NULL-propagating or non-Kafka-legal topic "
                    "template?); Kafka topics are [a-zA-Z0-9._-]{1,249}"
                    " and not the twin-internal _staging/_commits"
                )
            rec = {
                "t": topic,
                "k": _b64(row["key"]) if self._has_key else None,
                "v": _b64(row["value"]),
            }
            if self._has_partition and row["partition"] is not None:
                rec["p"] = int(row["partition"])
            lines.append(json.dumps(rec) + "\n")
        _atomic_write_lines(path, lines)
        return _Staged(path=path, n=len(lines))

    def commit(self, messages, batchId: int) -> None:
        marker_dir = os.path.join(self._broker, "_commits")
        os.makedirs(marker_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"{self._run_id}-{batchId}.done")
        if os.path.exists(marker):
            return  # retried commit: the batch is already in the log
        now_us = int(time.time() * 1_000_000)
        by_topic: dict[str, list[dict]] = {}
        for m in messages:
            if m is None or m.n == 0:
                continue
            with open(m.path, "r", encoding="ascii") as f:
                for line in f:
                    rec = json.loads(line)
                    by_topic.setdefault(rec["t"], []).append(rec)
        for topic, recs in by_topic.items():
            tdir = _topic_dir(self._broker, topic)
            n = _ensure_topic(self._broker, tdir, self._n_partitions)
            # Kafka's default partitioner: keyed records route by
            # murmur2(key) % n — per-key order within a batch is
            # preserved because each key maps to ONE partition and the
            # per-partition append keeps arrival order; NULL-key
            # records round-robin (order across partitions is
            # deliberately NOT preserved — exactly the real broker's
            # contract, pinned negatively in tests)
            by_part: dict[int, list[str]] = {}
            rr = 0
            for r in recs:
                explicit = r.get("p")
                if explicit is not None:
                    # an explicit partition column routes the record,
                    # exactly like the real producer; out of range is
                    # the broker's loud refusal, not a silent remap
                    if not 0 <= explicit < n:
                        raise ValueError(
                            f"kafkafile sink: explicit partition "
                            f"{explicit} out of range for topic "
                            f"{topic!r} with {n} partition(s)"
                        )
                    p = explicit
                elif n == 1:
                    p = 0
                elif r["k"] is not None:
                    p = _partition_for_key(base64.b64decode(r["k"]), n)
                else:
                    p = rr % n
                    rr += 1
                by_part.setdefault(p, []).append(
                    json.dumps({"k": r["k"], "v": r["v"], "ts": now_us})
                    + "\n"
                )
            for p, lines in by_part.items():
                _append_log_file(
                    self._broker, _partition_dir(tdir, n, p), lines
                )
        _atomic_write_lines(marker, [])
        for m in messages:  # committed stagings are spent
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class _KafkaFileStreamReader(SimpleDataSourceStreamReader):
    """Consumer half: offset-tracked replay of one topic log with the
    connector's record schema. Runs driver-side (SimpleReader) — the
    right tradeoff for a wire twin; the real connector is the scale
    path."""

    def __init__(self, options):
        self._broker = options.get("kafka.bootstrap.servers")
        self._topic = options.get("subscribe")
        if not self._broker or not self._topic:
            raise ValueError(
                "kafkafile source requires options "
                "kafka.bootstrap.servers (broker directory) and "
                "subscribe (one topic)"
            )
        if "," in self._topic:
            raise ValueError(
                "kafkafile subscribes to a single topic (the stand-in "
                f"models one log); got {self._topic!r}"
            )
        if (
            self._topic in _RESERVED_TOPICS
            or not _LEGAL_TOPIC.fullmatch(self._topic)
        ):
            # same legality rule as the sink — a subscribe of "../x"
            # must never read files outside the broker dir, and the
            # twin's internal dirs are not topics
            raise ValueError(
                f"kafkafile: illegal subscribe topic {self._topic!r}; "
                "Kafka topics are [a-zA-Z0-9._-]{1,249}, not ./.., and "
                "not the twin-internal _staging/_commits"
            )
        self._starting = options.get("startingOffsets", "earliest").lower()
        if self._starting not in ("earliest", "latest"):
            raise ValueError(
                "kafkafile startingOffsets must be earliest|latest, "
                f"got {self._starting!r}"
            )

    def _tdir(self) -> str:
        return _topic_dir(self._broker, self._topic)

    def _starts(self, start: dict, n: int) -> dict[int, int]:
        """Normalize a checkpointed offset to per-partition form.

        Flat (single-partition) checkpoints carry ``{"offset": int}``;
        partitioned topics carry ``{"offset": {"0": int, ...}}``. An
        int start against a now-partitioned topic is only legitimate
        when the stream began BEFORE the topic existed (initialOffset
        saw no log → 0), so ONLY a zero seeds every partition; a
        nonzero flat offset means the checkpoint was taken against a
        DIFFERENT (flat) log — seeding it per-partition would silently
        skip that many records in every partition, so it raises, the
        mirror of read()'s dict-checkpoint-vs-flat-topic guard."""
        raw = start["offset"]
        if isinstance(raw, dict):
            if len(raw) != n:
                # same data-loss class as the flat/partitioned
                # mismatches: these offsets were taken against a log
                # with a DIFFERENT partition count — seeding by key
                # overlap would silently skip records
                raise ValueError(
                    f"kafkafile: checkpoint carries offsets for "
                    f"{len(raw)} partitions but topic {self._topic!r} "
                    f"has {n} — was the broker directory recreated "
                    "with a different partition count under a "
                    "checkpoint?"
                )
            return {p: int(raw.get(str(p), 0)) for p in range(n)}
        if int(raw) != 0:
            raise ValueError(
                "kafkafile: checkpoint carries a flat offset "
                f"{raw!r} but topic {self._topic!r} has {n} "
                "partitions — was the broker directory recreated "
                "with a different partition count under a "
                "checkpoint? Only offset 0 (stream started before "
                "the topic existed) is valid here."
            )
        return {p: 0 for p in range(n)}

    def initialOffset(self) -> dict:
        tdir = self._tdir()
        n = _topic_partitions(tdir)
        if n == 1:
            if self._starting == "latest":
                return {"offset": _next_offset(tdir)}
            return {"offset": 0}
        if self._starting == "latest":
            return {
                "offset": {
                    str(p): _next_offset(_partition_dir(tdir, n, p))
                    for p in range(n)
                }
            }
        return {"offset": {str(p): 0 for p in range(n)}}

    def _scan(
        self, pdir: str, pid: int, lo: int, hi: int
    ) -> Iterator[Tuple]:
        if lo >= hi:
            # idle trigger: nothing new — never open the (possibly
            # large) last log file just to skip every line of it
            return
        files = _data_files(pdir)
        for idx, path in enumerate(files):
            start = int(os.path.basename(path)[5:-6])
            if start >= hi:
                break  # file names are offset-ordered
            # skip files entirely below lo WITHOUT opening them: the
            # NEXT file's start offset is this file's end, so a
            # long-running consumer pays O(new records) per trigger,
            # not O(topic history)
            if idx + 1 < len(files):
                nxt = int(os.path.basename(files[idx + 1])[5:-6])
                if nxt <= lo:
                    continue
            with open(path, "r", encoding="ascii") as f:
                for i, line in enumerate(f):
                    off = start + i
                    if off >= hi:
                        break
                    if off < lo:
                        continue
                    rec = json.loads(line)
                    yield (
                        _unb64(rec["k"]),
                        _unb64(rec["v"]),
                        self._topic,
                        pid,
                        off,
                        dt.datetime.fromtimestamp(rec["ts"] / 1e6, tz=_UTC),
                        1,  # LogAppendTime: the broker stamped it
                    )

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        tdir = self._tdir()
        n = _topic_partitions(tdir)
        if n == 1:
            lo = start["offset"]
            if isinstance(lo, dict):  # partitioned checkpoint, flat log
                raise ValueError(
                    "kafkafile: checkpoint carries per-partition offsets "
                    f"but topic {self._topic!r} is single-partition — was "
                    "the broker directory recreated under a checkpoint?"
                )
            hi = _next_offset(tdir)
            self._check_data_loss(0, lo, hi)
            # a materialized LIST iterator, not a generator: Spark's
            # simple-reader prefetch cache calls next() on the result
            # AND copy.copy()s it (list_iterator is copyable,
            # generators are not); materializing is the SimpleReader
            # tradeoff this test twin accepts by design
            return (
                iter(list(self._scan(tdir, 0, lo, hi))),
                {"offset": hi},
            )
        starts = self._starts(start, n)
        rows: list[Tuple] = []
        ends: dict[str, int] = {}
        for p in range(n):
            pdir = _partition_dir(tdir, n, p)
            lo = starts[p]
            hi = _next_offset(pdir)
            self._check_data_loss(p, lo, hi)
            rows.extend(self._scan(pdir, p, lo, hi))
            ends[str(p)] = hi
        return iter(rows), {"offset": ends}

    def _check_data_loss(self, pid: int, lo: int, hi: int) -> None:
        """A checkpointed offset PAST the log's end means the log was
        truncated or recreated under the checkpoint: the real
        connector kills the query here (failOnDataLoss=true, its
        default) — the twin must too, not clamp with max(lo, hi) and
        silently skip the new log's first ``lo`` records forever
        (round-10 review)."""
        if lo > hi:
            raise ValueError(
                f"kafkafile: checkpoint offset {lo} is past the end "
                f"({hi}) of topic {self._topic!r} partition {pid} — "
                "log truncated or broker directory recreated under a "
                "checkpoint (the real connector's failOnDataLoss "
                "refusal)"
            )

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        tdir = self._tdir()
        raw_end = end["offset"]
        if not isinstance(raw_end, dict):
            return iter(list(self._scan(tdir, 0, start["offset"], raw_end)))
        n = len(raw_end)
        starts = self._starts(start, n)
        rows: list[Tuple] = []
        for p in range(n):
            rows.extend(
                self._scan(
                    _partition_dir(tdir, n, p),
                    p,
                    starts[p],
                    int(raw_end[str(p)]),
                )
            )
        return iter(rows)


class KafkaFileDataSource(DataSource):
    """``spark.dataSource.register(KafkaFileDataSource)`` →
    ``format("kafkafile")`` on both readStream and writeStream."""

    @classmethod
    def name(cls) -> str:
        return "kafkafile"

    def schema(self) -> str:
        return KAFKA_RECORD_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _KafkaFileStreamReader:
        return _KafkaFileStreamReader(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> _KafkaFileStreamWriter:
        return _KafkaFileStreamWriter(self.options, schema)


def register_kafka_file_shim(spark) -> None:
    """Idempotent per-session registration of the stand-in format."""
    spark.dataSource.register(KafkaFileDataSource)
