"""Mongo sink: FNV write-shard planning, distinct-id bulk splitting,
replace/delete models, collapse-first CDC. Transport is injected (no
MongoDB in this environment); the recording applier appends every call
to a file (the apply runs inside executor Python workers, so in-memory
capture would never reach the test process)."""

from __future__ import annotations

import json
import tempfile

import pytest

from transferia_spark.cdc.changeitem import COUNTER_COL, LSN_COL, OP_COL
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, build_sink
from transferia_spark.sinks.mongo import BulkSplitter


def _file_recorder(path: str):
    def factory(uri: str):
        def apply(database, collection, bulks):
            with open(path, "a") as f:
                f.write(json.dumps(
                    {"db": database, "coll": collection,
                     "bulks": [list(b) for b in bulks]}) + "\n")
        return apply
    return factory


@pytest.fixture()
def recorder():
    with tempfile.NamedTemporaryFile(suffix=".jsonl") as tf:
        def calls():
            with open(tf.name) as f:
                return [json.loads(line) for line in f if line.strip()]

        def ops():
            return [op for c in calls() for b in c["bulks"] for op in b]

        yield _file_recorder(tf.name), calls, ops


def test_bulk_splitter_cuts_on_repeated_id():
    s = BulkSplitter()
    s.add({"op": "replace", "n": 1}, "a")
    s.add({"op": "replace", "n": 2}, "b")
    s.add({"op": "replace", "n": 3}, "a")  # repeat → new bulk
    s.add({"op": "delete", "n": 4}, "a")   # repeat again → third bulk
    bulks = s.get()
    assert [len(b) for b in bulks] == [2, 1, 1]
    # per-id order is the append order across bulks
    assert [op["n"] for b in bulks for op in b] == [1, 2, 3, 4]


def test_bulk_splitter_max_ops():
    s = BulkSplitter(max_ops=2)
    for i in range(5):
        s.add({"n": i}, f"id{i}")
    assert [len(b) for b in s.get()] == [2, 2, 1]


def test_write_snapshot_replaces_with_id(spark, recorder):
    factory, calls, ops = recorder
    sink = build_sink("mongo", database="db", keys=["k"], applier_factory=factory)
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    sink.write(df, TableID("", "users"))
    assert len(ops()) == 2
    by_id = {op["doc"]["_id"]: op for op in ops()}
    assert by_id[1]["op"] == "replace"
    assert by_id[1]["filter"] == {"_id": 1}
    assert by_id[1]["doc"] == {"_id": 1, "v": "x"}
    assert all(c["db"] == "db" and c["coll"] == "users" for c in calls())


def test_write_cdc_collapses_then_deletes(spark, recorder):
    factory, calls, ops = recorder
    sink = build_sink("mongo", database="db", applier_factory=factory)
    batch = spark.createDataFrame(
        [
            (1, "a", "i", 10, 0),
            (1, "a2", "u", 11, 0),   # net: replace with a2
            (2, "gone", "i", 12, 0),
            (2, None, "d", 13, 0),   # insert+delete nets out
            (3, "keep", "i", 14, 0),
        ],
        f"k long, v string, {OP_COL} string, {LSN_COL} long, {COUNTER_COL} int",
    )
    sink.write_cdc(batch, TableID("", "t"), keys=["k"])
    by_key = {}
    for op in ops():
        by_key.setdefault(op["filter"]["_id"], []).append(op)
    assert by_key[1][-1]["op"] == "replace"
    assert by_key[1][-1]["doc"]["v"] == "a2"
    assert by_key[3][-1]["op"] == "replace"
    # id 2: either dropped entirely (insert+delete collapse) or a
    # delete op — never a surviving replace
    if 2 in by_key:
        assert all(op["op"] == "delete" for op in by_key[2])
    # collapse ⇒ at most one net op per id
    assert all(len(v) == 1 for v in by_key.values())


def test_shard_assignment_is_stable(spark, recorder):
    """Same _id → same shard across plans (FNV-1a over the id JSON,
    byte-exact with the ClickHouse sharder)."""
    factory, _, _ = recorder
    sink = build_sink("mongo", database="db", keys=["k"], applier_factory=factory)
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    p1 = {r["_id_json"]: r["_shard"]
          for r in sink.planned(df).select("_id_json", "_shard").collect()}
    p2 = {r["_id_json"]: r["_shard"]
          for r in sink.planned(df).select("_id_json", "_shard").collect()}
    assert p1 == p2
    assert len(set(p1.values())) > 1  # actually spreads across shards
    assert all(0 <= s < 16 for s in p1.values())


def test_composite_key_subdocument(spark, recorder):
    factory, _, ops = recorder
    sink = build_sink(
        "mongo", database="db", keys=["a", "b"], applier_factory=factory
    )
    df = spark.createDataFrame([(1, 2, "v")], "a long, b long, v string")
    sink.write(df, TableID("", "t"))
    op = ops()[0]
    assert op["filter"] == {"_id": {"a": 1, "b": 2}}
    assert op["doc"]["_id"] == {"a": 1, "b": 2}


def test_cleanup_policies(recorder):
    factory, calls, ops = recorder
    sink = build_sink("mongo", database="db", applier_factory=factory)
    sink.cleanup(TableID("", "t"), CleanupPolicy.DROP)
    assert ops()[-1] == {"op": "cleanup", "policy": "drop"}
    n = len(calls())
    sink.cleanup(TableID("", "t"), CleanupPolicy.DISABLED)
    assert len(calls()) == n


def test_missing_pymongo_is_gated():
    """Without an injected applier and without pymongo, the transport
    gate raises with a remedy (construction stays cheap)."""
    sink = build_sink("mongo", database="db")
    try:
        import pymongo  # noqa: F401
        pytest.skip("pymongo present in this environment")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pymongo"):
        sink.applier_factory("mongodb://nowhere")
