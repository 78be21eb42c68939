"""Mid-stream DDL / schema-drift handling.

≈ ``pkg/providers/postgres/publisher_replication.go:202`` in
transferia/transferia: on a relation-message change the reference
re-resolves the table schema in place and keeps pushing. Spark
Structured Streaming queries have a STATIC schema per run — the
Spark-native translation (SURVEY §7 hard part 1) is a supervisor loop:

  1. run the streaming query with the schema currently registered;
  2. a drift detector watches the source (here: the declared schema of
     arriving batches vs the registry);
  3. on drift: stop the query gracefully, evolve the registry
     (widening-only by default: new nullable columns append, removed
     columns stay nullable — history stays readable), and restart the
     query from its checkpoint with the new schema.

Checkpoint offsets make the restart seamless: no events are lost or
re-applied, exactly the contract the reference gets from slot LSNs.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


class SchemaRegistry:
    """Versioned table→schema store (file-backed, one JSON per table).

    ≈ the reference's re-resolved ``TableSchema`` kept on the
    replication worker; persisted so a restarted driver resumes with
    the schema the checkpoint was written under.
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _file(self, table: str) -> str:
        return os.path.join(self.path, f"{table}.json")

    def get(self, table: str) -> tuple[int, T.StructType] | None:
        try:
            with open(self._file(table)) as f:
                doc = json.load(f)
            return doc["version"], T.StructType.fromJson(doc["schema"])
        except FileNotFoundError:
            return None

    def put(self, table: str, schema: T.StructType) -> int:
        cur = self.get(table)
        version = (cur[0] + 1) if cur else 1
        tmp = self._file(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "schema": schema.jsonValue()}, f)
        os.replace(tmp, self._file(table))
        return version


def infer_json_type(v) -> T.DataType:
    """Spark type for a JSON-decoded value — shared by the per-format
    schema probes (binlog ``before``/``after`` dicts, wal2json
    ``columns`` arrays, change-stream documents)."""
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    return T.StringType()


def evolve(old: T.StructType, new: T.StructType) -> T.StructType:
    """Widening-only merge: old column order is preserved (dropped
    columns become nullable holes the sink keeps), new columns append
    as nullable. Incompatible type changes raise — same fatal contract
    as the reference's strict type system."""
    by_name = {f.name: f for f in new.fields}
    out: list[T.StructField] = []
    for f in old.fields:
        n = by_name.pop(f.name, None)
        if n is None:
            out.append(T.StructField(f.name, f.dataType, True))
        elif n.dataType == f.dataType:
            out.append(T.StructField(f.name, f.dataType, f.nullable or n.nullable))
        else:
            raise ValueError(
                f"incompatible drift on {f.name}: {f.dataType} → {n.dataType}"
            )
    out.extend(T.StructField(f.name, f.dataType, True) for f in new.fields if f.name in by_name)
    return T.StructType(out)


def run_with_drift_handling(
    table: str,
    registry: SchemaRegistry,
    current_source_schema: Callable[[], T.StructType],
    start_query: Callable[[T.StructType], StreamingQuery],
    max_restarts: int = 10,
) -> int:
    """Supervisor: (re)start ``start_query(schema)`` until the source
    schema stops drifting; returns the number of restarts performed.

    ``current_source_schema`` probes the source's present schema (e.g.
    a parquet footer read, a registry lookup, a relation message); each
    pass runs the query to completion of available data
    (``availableNow`` trigger inside ``start_query``), then re-probes.
    A continuously-running deployment calls this in its own loop.
    """
    restarts = 0
    while True:
        probed = current_source_schema()
        stored = registry.get(table)
        if stored is None:
            registry.put(table, probed)
            schema = probed
        else:
            schema = evolve(stored[1], probed)
            if schema != stored[1]:
                registry.put(table, schema)
        q = start_query(schema)
        q.awaitTermination()
        if current_source_schema() == probed or restarts >= max_restarts:
            return restarts
        restarts += 1  # drift arrived while the query ran — go again
