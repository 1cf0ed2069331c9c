#!/usr/bin/env python
"""Schema-registration CLI — the RegisterSchemaApp analog (SURVEY.md
§2.11 R6: mypipe-avro RegisterSchemaApp.scala:3-29).

Registers a table's schema (inferred from a parquet file) under its
three mutation subjects in a file-backed registry:

    python tools/register_schema.py <registry.json> <db> <table> <parquet>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) != 5:
        print(__doc__)
        return 2
    reg_path, database, table, parquet = sys.argv[1:]

    from mypipe_spark.registry import (
        SchemaRegistry,
        load_registry,
        register_table,
        save_registry,
    )
    from mypipe_spark.session import get_spark

    spark = get_spark("register-schema", shuffle_partitions=4)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(parquet).schema

    reg = load_registry(reg_path) if os.path.exists(reg_path) else SchemaRegistry()
    ids = register_table(reg, database, table, schema)
    save_registry(reg, reg_path)
    for subject, sid in sorted(ids.items()):
        print(f"{subject} -> id {sid}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
