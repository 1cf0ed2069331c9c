"""mypipe_spark — a PySpark-native change-data-capture + analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of
mardambey/mypipe (a MySQL binlog → Kafka CDC dataflow system) on top of
Apache Spark: batch decoding, predicate filtering, transactional
grouping, schema-aware envelopes, wire-format framing, snapshot scans,
checkpointed Structured Streaming pipes — plus the analytics and
LLM-training-data operators (dedup, similarity search, text analysis)
the original never had, expressed Spark-first so Catalyst/Tungsten pick
the physical plan.

Layout:
    session      SparkSession factory tuned for the workload
    model        canonical change-event schema + MySQL ColumnType mapping
    changelog    deterministic synthetic binlog/change-log generator
    registry     versioned Avro-style schema registry (R1-R7)
    operators/   decode, filters, txgroup, compaction (S3-S6, F1-F8, T1-T3)
    sources/     snapshot scan + change-log readers (S8-S13)
    sinks/       producer registry, wire framing (K1-K11)
    streaming/   Pipe runner: readStream → transform → writeStream (T4-T15)
    functions/   scalar fns, text analysis, dedup, similarity (X1-X9 + pipeline ops)
    plans/       the analytics query surface used by the driver's oracle
"""

__version__ = "0.1.0"
