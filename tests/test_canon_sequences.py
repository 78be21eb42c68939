"""The reference's three golden replication sequences, ported verbatim.

≈ ``tests/canon/sequences/sequences_test.go:17-27`` +
``tests/canon/sequences/dump/*.sql`` in transferia/transferia: a
PG table ``insert_update_delete(i1, i2, t, PRIMARY KEY(i1, i2))`` with
REPLICA IDENTITY FULL, an empty initial snapshot, and three canonical
statement sequences replicated through the full pipeline. Here each
sequence runs wal2json-v2 lines → slot-direct waljson stream source →
collapse → merge into the empty snapshot, asserting the final table —
the same end state the reference canonizes for every sink.
"""

from __future__ import annotations

import json
import os

import pytest

from transferia_spark.cdc.merge import merge_batch
from transferia_spark.streaming.wal_source import WalJsonDataSource, wal_output_schema

DDL = "i1 int, i2 int, t string"
KEYS = ["i1", "i2"]


def _row(i1, i2, t):
    return [
        {"name": "i1", "value": i1},
        {"name": "i2", "value": i2},
        {"name": "t", "value": t},
    ]


def _replicate(spark, tmp_path, events):
    """wal2json lines → waljson source → merge into an empty snapshot."""
    spark.dataSource.register(WalJsonDataSource)
    waldir = str(tmp_path / "wal")
    os.makedirs(waldir, exist_ok=True)
    with open(os.path.join(waldir, "000.jsonl"), "w") as f:
        for e in events:
            f.write(json.dumps({"schema": "public", "table": "seq", **e}) + "\n")

    batches = []
    q = (
        spark.readStream.format("waljson")
        .schema(wal_output_schema(DDL))
        .option("path", waldir)
        .load()
        .writeStream.foreachBatch(lambda df, _bid: batches.append(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [r for b in batches for r in b]
    batch = spark.createDataFrame(rows, wal_output_schema(DDL)).drop("_table")
    target = spark.createDataFrame([], DDL)  # init.sql creates the table empty
    return sorted(tuple(r) for r in merge_batch(target, batch, KEYS).collect())


@pytest.mark.slow
def test_insert_update_delete(spark, tmp_path):
    """dump/00: INSERT (2,2,'b'); UPDATE t='c'; DELETE → empty table."""
    final = _replicate(spark, tmp_path, [
        {"action": "I", "lsn": 1, "columns": _row(2, 2, "b")},
        {"action": "U", "lsn": 2, "columns": _row(2, 2, "c"),
         "identity": _row(2, 2, "b")},
        {"action": "D", "lsn": 3, "identity": _row(2, 2, "c")},
    ])
    assert final == []


def test_updatepk(spark, tmp_path):
    """dump/01: INSERT (1,1,'a'); t='b'; PK (1,1)→(2,2); t='c' →
    exactly {(2,2,'c')} — the old key must not survive."""
    final = _replicate(spark, tmp_path, [
        {"action": "I", "lsn": 1, "columns": _row(1, 1, "a")},
        {"action": "U", "lsn": 2, "columns": _row(1, 1, "b"),
         "identity": _row(1, 1, "a")},
        {"action": "U", "lsn": 3, "columns": _row(2, 2, "b"),
         "identity": _row(1, 1, "b")},
        {"action": "U", "lsn": 4, "columns": _row(2, 2, "c"),
         "identity": _row(2, 2, "b")},
    ])
    assert final == [(2, 2, "c")]


def test_insert_update_insert(spark, tmp_path):
    """dump/02: keys are reborn after moving away (1,1) and after a
    delete (3,3); all three survivors must carry their latest value."""
    final = _replicate(spark, tmp_path, [
        {"action": "I", "lsn": 1, "columns": _row(1, 1, "1a")},
        {"action": "U", "lsn": 2, "columns": _row(1, 1, "1b"),
         "identity": _row(1, 1, "1a")},
        {"action": "U", "lsn": 3, "columns": _row(2, 2, "1b"),
         "identity": _row(1, 1, "1b")},
        {"action": "I", "lsn": 4, "columns": _row(1, 1, "2a")},
        {"action": "U", "lsn": 5, "columns": _row(1, 1, "2b"),
         "identity": _row(1, 1, "2a")},
        {"action": "I", "lsn": 6, "columns": _row(3, 3, "3a")},
        {"action": "U", "lsn": 7, "columns": _row(3, 3, "3b"),
         "identity": _row(3, 3, "3a")},
        {"action": "D", "lsn": 8, "identity": _row(3, 3, "3b")},
        {"action": "I", "lsn": 9, "columns": _row(3, 3, "4a")},
        {"action": "U", "lsn": 10, "columns": _row(3, 3, "4b"),
         "identity": _row(3, 3, "4a")},
    ])
    assert final == [(1, 1, "2b"), (2, 2, "1b"), (3, 3, "4b")]
