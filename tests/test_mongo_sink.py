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


def test_missing_pymongo_falls_back_to_wire_applier():
    """Without an injected applier and without pymongo, the default
    factory returns the ZERO-DEPENDENCY wire applier (r14 — the sink
    used to raise here); pymongo_applier itself keeps the explicit
    gate with a remedy. Construction stays cheap either way (no
    dial until ops apply)."""
    from transferia_spark.sinks.mongo import pymongo_applier

    sink = build_sink("mongo", database="db")
    try:
        import pymongo  # noqa: F401
        pytest.skip("pymongo present in this environment")
    except ImportError:
        pass
    apply = sink.applier_factory("mongodb://nowhere")
    assert callable(apply)  # wire applier — no dial yet
    with pytest.raises(NotImplementedError, match="pymongo"):
        pymongo_applier("mongodb://nowhere")


# -------------------------------------------- sharded target support


def test_path_helpers_and_shard_key_info():
    from transferia_spark.sinks.mongo import (
        ShardKeyInfo,
        get_value_by_path,
        has_key_diff,
        set_value_by_path,
    )

    doc = {"a": {"b": {"c": 7}}, "x": 1}
    assert get_value_by_path(doc, "a.b.c") == (7, True)
    assert get_value_by_path(doc, "a.b.z") == (None, False)
    assert get_value_by_path(doc, "x.y") == (None, False)
    out: dict = {}
    set_value_by_path(out, "a.b.c", 7)
    set_value_by_path(out, "a.d", 1)
    assert out == {"a": {"b": {"c": 7}, "d": 1}}

    assert has_key_diff({"r": 1}, {"r": 2}, ["r"]) is True
    assert has_key_diff({"r": 1}, {"r": 1}, ["r"]) is False
    assert has_key_diff({"r": 1}, {}, ["r"]) is True      # vanished
    assert has_key_diff({}, {}, ["r"]) is False           # both absent
    assert has_key_diff(
        {"a": {"b": 1}}, {"a": {"b": 2}}, ["a.b"]
    ) is True

    assert ShardKeyInfo(["_id"]).is_trivial
    assert ShardKeyInfo(["_id.sub"]).is_trivial
    info = ShardKeyInfo(["region", "_id"])
    assert not info.is_trivial and info.contains_id
    assert not ShardKeyInfo(["region"]).contains_id


def test_plan_sharded_ops_filters_and_isolation():
    """≈ sharded_collection.go GetDocumentKey + write_models.go
    makeDocumentFilter: replace filters carry the STORED shard-key
    values next to _id; an event that changes a shard-key field is
    isolated in its own bulk and refreshes the cache; deletes filter
    on _id alone and evict the cache."""
    from transferia_spark.sinks.mongo import plan_sharded_ops

    def row(id_val, op, doc=None, shard=0):
        return {
            "_id_json": json.dumps({"v": id_val}),
            "_doc_json": json.dumps(doc or {}),
            "_shard": shard, "_mop": op,
        }

    stored = {"1": {"_id": 1, "region": "eu"},
              "2": {"_id": 2, "region": "us"}}
    rows = [
        # same region: routed filter, same bulk
        row(1, "u", {"k": 1, "region": "eu", "v": "a"}),
        # region CHANGES us->ap: isolated, filter still has OLD value
        row(2, "u", {"k": 2, "region": "ap", "v": "b"}),
        # unseen id: filter from the item's own key, upsert path
        row(3, "i", {"k": 3, "region": "eu", "v": "c"}),
        # delete: _id-only filter
        row(1, "d"),
    ]
    by_shard = plan_sharded_ops(
        rows, ["region", "_id"], stored, pk_cols=["k"],
    )
    bulks = by_shard[0]
    flat = [op for b in bulks for op in b]
    assert [op["op"] for op in flat] == [
        "replace", "replace", "replace", "delete",
    ]
    assert flat[0]["filter"] == {"_id": 1, "region": "eu"}
    assert flat[1]["filter"] == {"_id": 2, "region": "us"}  # OLD value
    assert flat[2]["filter"] == {"_id": 3, "region": "eu"}
    assert flat[3]["filter"] == {"_id": 1}
    # the key-changing op sits alone in its bulk
    key_change_bulk = [b for b in bulks if flat[1] in b]
    assert key_change_bulk == [[flat[1]]]
    # cache refreshed by the change, evicted by the delete
    assert stored["2"]["region"] == "ap"
    assert "1" not in stored
    # the single-pk payload column became the document _id
    assert flat[0]["doc"]["_id"] == 1 and "k" not in flat[0]["doc"]


def test_sharded_write_cdc_end_to_end(spark, recorder):
    """MongoSink against a sharded target: scripted provider/fetcher,
    recording applier — upsert filters carry the shard key, a shard-
    key change is isolated, unsharded path untouched."""
    from transferia_spark.sinks.mongo import ShardKeyInfo

    factory, _, ops = recorder

    def provider(uri, db, coll):
        assert (db, coll) == ("db", "t")
        return ShardKeyInfo(["region"])

    def fetcher(uri, db, coll, ids, fields):
        assert fields == ["region"]
        stored = {1: "eu", 2: "us"}
        return [{"_id": i, "region": stored[i]}
                for i in ids if i in stored]

    sink = build_sink(
        "mongo", database="db", applier_factory=factory,
        shard_key_provider=provider, doc_key_fetcher=fetcher,
    )
    batch = spark.createDataFrame(
        [
            (1, "eu", "a", "u", 10, 0),
            (2, "ap", "b", "u", 11, 0),   # shard key moves us -> ap
            (3, "eu", "c", "i", 12, 0),   # new doc
        ],
        f"k long, region string, v string, {OP_COL} string, "
        f"{LSN_COL} long, {COUNTER_COL} int",
    )
    sink.write_cdc(batch, TableID("", "t"), keys=["k"])
    got = {op["filter"]["_id"]: op for op in ops()}
    assert got[1]["filter"] == {"_id": 1, "region": "eu"}
    assert got[2]["filter"] == {"_id": 2, "region": "us"}  # OLD value
    assert got[3]["filter"] == {"_id": 3, "region": "eu"}
    assert got[2]["doc"]["region"] == "ap"  # the doc carries the NEW


def test_shard_key_lookup_failure_disables_sharding(spark, recorder):
    factory, _, ops = recorder

    def provider(uri, db, coll):
        raise ConnectionError("config db unreachable")

    sink = build_sink(
        "mongo", database="db", keys=["k"], applier_factory=factory,
        shard_key_provider=provider,
    )
    df = spark.createDataFrame([(1, "x")], "k long, v string")
    sink.write(df, TableID("", "users"))  # warns, falls back to _id
    assert ops()[0]["filter"] == {"_id": 1}


def test_wire_shard_key_provider_and_fetcher():
    """The zero-dep defaults read config.collections and the target
    collection over the live wire client (loopback mongod)."""
    from test_mongo_wire import LoopbackMongod
    from transferia_spark.sinks.mongo import (
        wire_doc_key_fetcher,
        wire_shard_key_provider,
    )

    srv = LoopbackMongod({
        "config.collections": [
            {"_id": "db.t", "key": {"region": 1, "_id": 1}},
            {"_id": "db.plain"},  # no key -> unsharded
        ],
        "db.t": [
            {"_id": 1, "region": "eu", "v": "a"},
            {"_id": 2, "region": "us", "v": "b"},
            {"_id": 3, "region": "ap", "v": "c"},
        ],
    })
    try:
        uri = f"mongodb://127.0.0.1:{srv.port}/"
        info = wire_shard_key_provider(uri, "db", "t")
        assert info.fields == ["region", "_id"]
        assert not info.is_trivial and info.contains_id
        assert wire_shard_key_provider(uri, "db", "plain") is None
        assert wire_shard_key_provider(uri, "db", "absent") is None
        docs = wire_doc_key_fetcher(uri, "db", "t", [1, 3],
                                    ["region", "_id"])
        assert {d["_id"]: d["region"] for d in docs} == {
            1: "eu", 3: "ap",
        }
    finally:
        srv.close()


def test_partial_update_becomes_update_one(spark, recorder):
    """Mongo change-stream partial updates (no full image) must apply
    as UpdateOne $set over the CARRIED columns — a replace would wipe
    every uncarried field (r13 ≈ makeUpdateModel write_models.go:33).
    Full rows keep the replace path; presence folds through collapse."""
    factory, _, ops = recorder
    sink = build_sink("mongo", database="db", applier_factory=factory)
    batch = spark.createDataFrame(
        [
            # full insert: replace with every column
            (1, "v1", "w1", "i", 10, 0, None),
            # partial update of k=2: only v carried (w untouched on
            # the target; a removed field rides _removed → $unset)
            (2, "v2b", None, "u", 11, 0, ["v"]),
        ],
        f"k long, v string, w string, {OP_COL} string, {LSN_COL} long, "
        f"{COUNTER_COL} int, _present array<string>",
    )
    sink.write_cdc(batch, TableID("", "t"), keys=["k"])
    got = {op["filter"]["_id"]: op for op in ops()}
    assert got[1]["op"] == "replace"
    assert got[1]["doc"] == {"_id": 1, "v": "v1", "w": "w1"}
    assert got[2]["op"] == "update"
    assert got[2]["set"] == {"v": "v2b"}
    assert "w" not in got[2]["set"] and "doc" not in got[2]
    # the presence marker itself never leaks into documents
    assert "_present" not in got[1]["doc"]


def test_partial_update_unset_and_genuine_null(spark, recorder):
    """≈ makeUpdateModel (write_models.go:23-47): a REMOVED field
    ($unset / removedFields) emits a true $unset — not an explicit
    null — while a carried SET col = NULL patches explicit null (the
    null-dropping doc JSON cannot carry it, so the planner
    reconstructs it from presence − removal). A later $set clears an
    earlier $unset through the collapse fold."""
    factory, _, ops = recorder
    sink = build_sink("mongo", database="db", applier_factory=factory)
    batch = spark.createDataFrame(
        [
            # k=1: one partial event sets v to NULL and removes w
            # (u stays uncarried; an all-partial history never
            # upgrades to replace — see the full-image-bit test)
            (1, None, None, None, "u", 10, 0, ["v", "w"], ["w"]),
            # k=2: $unset of v at lsn 20 then $set v=x at lsn 21 —
            # the net write is the SET, no $unset survives
            (2, None, None, None, "u", 20, 0, ["v"], ["v"]),
            (2, "x", None, None, "u", 21, 0, ["v"], None),
        ],
        f"k long, v string, w string, u string, {OP_COL} string, "
        f"{LSN_COL} long, {COUNTER_COL} int, _present array<string>, "
        "_removed array<string>",
    )
    sink.write_cdc(batch, TableID("", "t"), keys=["k"])
    got = {op["filter"]["_id"]: op for op in ops()}
    assert got[1]["op"] == "update"
    assert got[1]["set"] == {"v": None}       # genuine SET v = NULL
    assert got[1]["unset"] == ["w"]           # true removal
    assert got[2]["op"] == "update"
    assert got[2]["set"] == {"v": "x"}
    assert "unset" not in got[2]


def test_partial_unset_only_update(spark, recorder):
    """An event that ONLY removes fields still emits an UpdateOne
    (unset-only, no $set) — and never a replace that would wipe the
    uncarried columns."""
    factory, _, ops = recorder
    sink = build_sink("mongo", database="db", applier_factory=factory)
    batch = spark.createDataFrame(
        [(1, None, None, "u", 10, 0, ["v"], ["v"])],
        f"k long, v string, w string, {OP_COL} string, {LSN_COL} long, "
        f"{COUNTER_COL} int, _present array<string>, "
        "_removed array<string>",
    )
    sink.write_cdc(batch, TableID("", "t"), keys=["k"])
    (op,) = ops()
    assert op["op"] == "update"
    assert op["unset"] == ["v"] and "set" not in op


def test_all_carried_partials_stay_on_update_path(spark, recorder):
    """A key whose history is ONLY partial patches must apply as an
    UpdateOne even when the patches happen to carry every declared
    column — the target document may hold fields outside the declared
    schema that a replace would wipe (code-review r14; the reference's
    makeUpdateModel uses $set/$unset for every partial update). A key
    anchored by a full image keeps the replace path."""
    factory, _, ops = recorder
    sink = build_sink("mongo", database="db", applier_factory=factory)
    batch = spark.createDataFrame(
        [
            # k=1: two partial patches that between them carry BOTH
            # declared columns — still no full image anywhere
            (1, "v1", None, "u", 10, 0, ["v"]),
            (1, None, "w1", "u", 11, 0, ["w"]),
            # k=2: full image at lsn 20, partial patch after — the
            # fold is anchored by the image, replace is complete
            (2, "v2", "w2", "u", 20, 0, None),
            (2, "v2b", None, "u", 21, 0, ["v"]),
        ],
        f"k long, v string, w string, {OP_COL} string, {LSN_COL} long, "
        f"{COUNTER_COL} int, _present array<string>",
    )
    sink.write_cdc(batch, TableID("", "t"), keys=["k"])
    got = {op["filter"]["_id"]: op for op in ops()}
    assert got[1]["op"] == "update"
    assert got[1]["set"] == {"v": "v1", "w": "w1"}
    assert got[2]["op"] == "replace"
    assert got[2]["doc"] == {"_id": 2, "v": "v2b", "w": "w2"}


def test_shared_wire_adapter_memoizes_dials():
    """Per-executor client memo: two fetches over the same uri ride
    ONE TCP dial; a dead socket evicts and retries once on a fresh
    dial (advisor/verdict r13 — ~16 TLS+SCRAM handshakes per batch
    per table otherwise)."""
    from test_mongo_wire import LoopbackMongod
    from transferia_spark.sinks.mongo import wire_doc_key_fetcher
    from transferia_spark.streaming import mongo_wire as mw

    srv = LoopbackMongod({
        "db.t": [
            {"_id": 1, "region": "eu"},
            {"_id": 2, "region": "us"},
        ],
    })
    uri = f"mongodb://127.0.0.1:{srv.port}/"
    try:
        mw.evict_shared_adapter(uri)
        before = srv.dial_count() if hasattr(srv, "dial_count") else None
        d1 = wire_doc_key_fetcher(uri, "db", "t", [1], ["region", "_id"])
        d2 = wire_doc_key_fetcher(uri, "db", "t", [2], ["region", "_id"])
        assert d1[0]["region"] == "eu" and d2[0]["region"] == "us"
        assert (uri, 30.0) in mw._SHARED_ADAPTERS
        if before is not None:
            assert srv.dial_count() - before == 1
        # kill the cached socket server-side: the next call must evict
        # and transparently redial (with_shared_adapter retry-once)
        mw._SHARED_ADAPTERS[(uri, 30.0)]._client._sock.close()
        d3 = wire_doc_key_fetcher(uri, "db", "t", [1], ["region", "_id"])
        assert d3[0]["region"] == "eu"
        if before is not None:
            assert srv.dial_count() - before == 2
    finally:
        mw.evict_shared_adapter(uri)
        srv.close()


def test_wire_applier_end_to_end(spark):
    """The ZERO-DEPENDENCY wire applier (r14): a real write_cdc batch
    applies over OP_MSG update/delete commands against a loopback
    mongod — replaces upsert, partial patches $set only the carried
    columns (an extra target field survives), removals become true
    $unset, a patch for a MISSING document upserts it (the reference's
    SetUpsert(true)), and deletes remove. The sink now works without
    pymongo like the rest of the engine."""
    from test_mongo_wire import LoopbackMongod
    from transferia_spark.sinks.mongo import MongoSink, wire_applier

    data = {"db.t": [
        {"_id": 2, "v": "old2", "w": "keep2", "extra": "survives"},
        {"_id": 3, "v": "old3", "w": "gone3"},
        {"_id": 4, "v": "old4"},
    ]}
    srv = LoopbackMongod(data)
    uri = f"mongodb://127.0.0.1:{srv.port}/"
    sink = MongoSink(uri=uri, database="db",
                     applier_factory=wire_applier)
    batch = spark.createDataFrame(
        [
            # k=1: full insert → replace-upsert creates it
            (1, "v1", "w1", "i", 10, 0, None, None),
            # k=2: partial $set of v only → extra/w survive
            (2, "v2b", None, "u", 11, 0, ["v"], None),
            # k=3: $unset w → the field is really gone, v survives
            (3, None, None, "u", 12, 0, ["w"], ["w"]),
            # k=4: delete
            (4, None, None, "d", 13, 0, None, None),
            # k=5: partial patch of a MISSING doc → upserted partial
            (5, "v5", None, "u", 14, 0, ["v"], None),
        ],
        f"k long, v string, w string, {OP_COL} string, {LSN_COL} long, "
        f"{COUNTER_COL} int, _present array<string>, "
        "_removed array<string>",
    )
    try:
        sink.write_cdc(batch, TableID("", "t"), keys=["k"])
        final = {d["_id"]: d for d in srv.data["db.t"]}
        assert final[1] == {"_id": 1, "v": "v1", "w": "w1"}
        assert final[2] == {"_id": 2, "v": "v2b", "w": "keep2",
                            "extra": "survives"}
        assert final[3] == {"_id": 3, "v": "old3"}   # w truly unset
        assert 4 not in final                         # deleted
        assert final[5] == {"_id": 5, "v": "v5"}      # upserted patch
    finally:
        srv.close()


def test_wire_applier_sharded_end_to_end(spark):
    """Full sharded-target pipeline lib-free: shard key read from
    config.collections over the wire, stored keys fetched per
    partition with one $in find, filters carry the STORED key next to
    _id (equality-matched by the server — a wrong key value would
    miss and upsert a duplicate, which the final-state assert would
    catch), and the wire applier applies it all."""
    from test_mongo_wire import LoopbackMongod
    from transferia_spark.sinks.mongo import (
        MongoSink,
        wire_applier,
        wire_shard_key_provider,
    )

    data = {
        "config.collections": [
            {"_id": "db.t", "key": {"region": 1}},
        ],
        "db.t": [
            {"_id": 1, "region": "eu", "v": "old1", "x": "keep"},
            {"_id": 2, "region": "us", "v": "old2"},
        ],
    }
    srv = LoopbackMongod(data)
    uri = f"mongodb://127.0.0.1:{srv.port}/"
    sink = MongoSink(uri=uri, database="db",
                     applier_factory=wire_applier,
                     shard_key_provider=wire_shard_key_provider)
    batch = spark.createDataFrame(
        [
            # partial patch of v on doc 1: filter carries stored
            # region=eu; x survives the $set
            (1, None, "v1b", "u", 20, 0, ["v"], None),
            # full replace of doc 2 moving its SHARD KEY us → ap —
            # isolated op, old key in the filter
            (2, "ap", "v2b", "u", 21, 0, None, None),
            # new doc in a fresh region
            (3, "sa", "v3", "i", 22, 0, None, None),
        ],
        f"k long, region string, v string, {OP_COL} string, "
        f"{LSN_COL} long, {COUNTER_COL} int, _present array<string>, "
        "_removed array<string>",
    )
    try:
        sink.write_cdc(batch, TableID("", "t"), keys=["k"])
        final = {d["_id"]: d for d in srv.data["db.t"]}
        assert len(final) == 3, f"duplicate upsert: {srv.data['db.t']}"
        assert final[1] == {"_id": 1, "region": "eu", "v": "v1b",
                            "x": "keep"}
        assert final[2] == {"_id": 2, "region": "ap", "v": "v2b"}
        assert final[3] == {"_id": 3, "region": "sa", "v": "v3"}
    finally:
        srv.close()


@pytest.mark.slow
def test_wire_applier_retryable_writes_and_chunking(spark, monkeypatch):
    """Against a replica-set/mongos target the write commands carry
    lsid + txnNumber (retryable writes — REQUIRED for shard-key-
    changing updates on mongos >=4.2; pymongo sends them by default);
    a standalone gets neither (it rejects txnNumber). Oversized
    payloads split into multiple commands under the BSON command cap
    (code-review r14 — BulkSplitter caps op count, not bytes)."""
    from test_mongo_wire import LoopbackMongod
    from transferia_spark.sinks import mongo as sink_mod
    from transferia_spark.sinks.mongo import MongoSink, wire_applier

    def write(srv, query=""):
        uri = f"mongodb://127.0.0.1:{srv.port}/{query}"
        sink = MongoSink(uri=uri, database="db",
                         applier_factory=wire_applier)
        batch = spark.createDataFrame(
            [(i, "v" * 64, "i", 10 + i, 0) for i in range(8)],
            f"k long, v string, {OP_COL} string, {LSN_COL} long, "
            f"{COUNTER_COL} int",
        )
        sink.write_cdc(batch, TableID("", "t"), keys=["k"])

    # replica-set flavor: lsid + txnNumber ride every write command
    rs = LoopbackMongod({"db.t": []}, hello_extra={
        "logicalSessionTimeoutMinutes": 30, "setName": "rs0",
        "isWritablePrimary": True,
    })
    rs.hello_extra["hosts"] = [f"127.0.0.1:{rs.port}"]
    try:
        write(rs)
        assert rs.write_cmds, "no write commands captured"
        for cmd in rs.write_cmds:
            assert "lsid" in cmd and "txnNumber" in cmd
        assert len({d["_id"] for d in rs.data["db.t"]}) == 8
        # retryWrites=false opts out even on a replica set (services
        # that advertise a setName but reject txnNumber need this)
        rs.write_cmds.clear()
        write(rs, query="?retryWrites=false")
        assert rs.write_cmds
        for cmd in rs.write_cmds:
            assert "lsid" not in cmd and "txnNumber" not in cmd
    finally:
        rs.close()

    # standalone flavor: neither field (txnNumber would be rejected)
    alone = LoopbackMongod({"db.t": []})
    try:
        write(alone)
        assert alone.write_cmds
        for cmd in alone.write_cmds:
            assert "lsid" not in cmd and "txnNumber" not in cmd
    finally:
        alone.close()

    # size chunking: with a tiny cap the same bulk splits into one
    # command per spec, all applied (direct applier call — the cap
    # patch must be visible to the chunker, so no executor round-trip)
    monkeypatch.setattr(sink_mod, "_WIRE_CMD_MAX_BYTES", 1)
    small = LoopbackMongod({"db.t": []})
    try:
        apply = wire_applier(f"mongodb://127.0.0.1:{small.port}/")
        bulk = [
            {"op": "replace", "filter": {"_id": i},
             "doc": {"_id": i, "v": "x" * 64}}
            for i in range(8)
        ]
        apply("db", "t", [bulk])
        ups = [c for c in small.write_cmds if "update" in c]
        assert len(ups) == 8  # one spec per command at cap 1
        assert all(len(c["updates"]) == 1 for c in ups)
        assert len({d["_id"] for d in small.data["db.t"]}) == 8
    finally:
        small.close()


def test_wire_applier_cleanup_policies(spark):
    """cleanup over the wire: Truncate empties in place, Drop removes
    the collection (and dropping an absent one is a no-op, matching
    pymongo's Collection.drop)."""
    from test_mongo_wire import LoopbackMongod
    from transferia_spark.sinks.base import CleanupPolicy
    from transferia_spark.sinks.mongo import MongoSink, wire_applier

    srv = LoopbackMongod({"db.t": [{"_id": 1}], "db.u": [{"_id": 2}]})
    uri = f"mongodb://127.0.0.1:{srv.port}/"
    sink = MongoSink(uri=uri, database="db",
                     applier_factory=wire_applier)
    try:
        sink.cleanup(TableID("", "t"), CleanupPolicy.TRUNCATE)
        assert srv.data["db.t"] == []
        sink.cleanup(TableID("", "u"), CleanupPolicy.DROP)
        assert "db.u" not in srv.data
        sink.cleanup(TableID("", "u"), CleanupPolicy.DROP)  # absent: ok
    finally:
        srv.close()


def test_with_shared_adapter_evicts_on_non_oserror():
    """ANY non-server error mid-exchange evicts the pooled adapter —
    only a MongoServerError proves the reply was fully read; anything
    else may leave an unread late reply that would poison the next
    caller's exchange on the shared socket (code-review r14)."""
    from test_mongo_wire import LoopbackMongod
    from transferia_spark.streaming import mongo_wire as mw

    srv = LoopbackMongod({"db.t": [{"_id": 1}]})
    uri = f"mongodb://127.0.0.1:{srv.port}/"

    def boom(a):
        raise ValueError("died between send and read")

    try:
        mw.evict_shared_adapter(uri)
        with pytest.raises(ValueError):
            mw.with_shared_adapter(uri, boom)
        assert (uri, 30.0) not in mw._SHARED_ADAPTERS
        # a server-side error keeps the adapter pooled (clean state)
        def server_err(a):
            raise mw.MongoServerError({"ok": 0, "errmsg": "x"})

        with pytest.raises(mw.MongoServerError):
            mw.with_shared_adapter(uri, server_err)
        assert (uri, 30.0) in mw._SHARED_ADAPTERS
    finally:
        mw.evict_shared_adapter(uri)
        srv.close()


def test_with_shared_adapter_serializes_threads():
    """The shared single-socket adapter is lock-guarded: DRIVER-side
    callers (each streaming query's foreachBatch thread) serialize
    their wire exchanges instead of interleaving OP_MSG frames on one
    socket (code-review r14)."""
    import threading
    import time

    from test_mongo_wire import LoopbackMongod
    from transferia_spark.streaming import mongo_wire as mw

    srv = LoopbackMongod({"db.t": [{"_id": 1, "region": "eu"}]})
    uri = f"mongodb://127.0.0.1:{srv.port}/"
    active, peaks, results = [], [], []

    def fn(a):
        active.append(1)
        peaks.append(len(active))
        docs = list(a["db"]["t"].find(filter={"_id": 1}, limit=1))
        time.sleep(0.02)
        active.pop()
        return docs

    def worker():
        results.append(mw.with_shared_adapter(uri, fn))

    try:
        mw.evict_shared_adapter(uri)
        threads = [threading.Thread(target=worker) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4
        assert all(r[0]["region"] == "eu" for r in results)
        assert max(peaks) == 1  # never two exchanges in flight
    finally:
        mw.evict_shared_adapter(uri)
        srv.close()


def test_fetcher_normalizes_wire_types():
    """Fetched stored-key values pass through bson_to_jsonable: wire
    wrapper types (ObjectId/datetime) become JSON-safe forms BEFORE
    they reach filters/the cache, so a non-_id shard key of such a
    type never hits a pymongo filter it cannot encode and cache keys
    render deterministically (advisor r13)."""
    import datetime as dt

    from test_mongo_wire import LoopbackMongod
    from transferia_spark.sinks.mongo import (
        _id_cache_key,
        wire_doc_key_fetcher,
    )
    from transferia_spark.streaming import mongo_wire as mw

    oid = mw.ObjectId(b"\x01" * 12)
    when = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    srv = LoopbackMongod({
        "db.t": [{"_id": oid, "region": when}],
    })
    uri = f"mongodb://127.0.0.1:{srv.port}/"
    try:
        docs = wire_doc_key_fetcher(uri, "db", "t", [oid],
                                    ["region", "_id"])
        (doc,) = docs
        assert doc["_id"] == oid.raw.hex()        # not an ObjectId
        assert isinstance(doc["region"], str)     # ISO, not datetime
        # cache keys are pure-JSON on both sides — json.dumps never
        # falls back to default=str on a fetched value
        _id_cache_key(doc["_id"])
        import json as _json
        _json.dumps(doc)  # fully JSON-safe
    finally:
        mw.evict_shared_adapter(uri)
        srv.close()


def test_shard_key_info_ttl_refresh(recorder):
    """The shard-key memo refreshes after its TTL: a collection
    sharded mid-transfer is picked up by a later batch instead of
    riding stale _id-only filters forever (advisor r13; the reference
    rebuilds the context every push)."""
    factory, _, _ = recorder
    from transferia_spark.sinks.mongo import ShardKeyInfo

    calls = []

    def provider(uri, db, coll):
        calls.append(coll)
        return ShardKeyInfo(["region"]) if len(calls) > 1 else None

    sink = build_sink(
        "mongo", database="db", keys=["k"], applier_factory=factory,
        shard_key_provider=provider, shard_key_ttl=0.0,
    )
    assert sink._shard_key_info("db", "t") is None
    info = sink._shard_key_info("db", "t")   # TTL 0 → re-read
    assert info is not None and info.fields == ["region"]
    assert len(calls) == 2
    sink.shard_key_ttl = 3600.0
    sink._shard_key_info("db", "t")          # within TTL → memo
    assert len(calls) == 2


def test_partial_update_shard_key_patch(spark, recorder):
    """Sharded target + partial updates: an update NOT carrying the
    shard key keeps the stored key (no spurious isolation from the
    absent column); one that DOES carry a new value is isolated with
    the OLD value in the filter (≈ getResultDocumentKey +
    CheckDiffByKeys)."""
    from transferia_spark.sinks.mongo import ShardKeyInfo

    factory, _, ops = recorder

    def provider(uri, db, coll):
        return ShardKeyInfo(["region"])

    def fetcher(uri, db, coll, ids, fields):
        stored = {1: "eu", 2: "us"}
        return [{"_id": i, "region": stored[i]}
                for i in ids if i in stored]

    sink = build_sink(
        "mongo", database="db", applier_factory=factory,
        shard_key_provider=provider, doc_key_fetcher=fetcher,
    )
    batch = spark.createDataFrame(
        [
            # partial, shard key NOT carried: stored key rides, not
            # isolated (a replace-path item_key would read region=None
            # and flag a spurious key change); w stays untouched
            (1, None, "a2", None, "u", 10, 0, ["v"]),
            # partial, shard key CARRIED and changed us -> ap; w
            # still uncarried, so this stays an UpdateOne
            (2, "ap", "b2", None, "u", 11, 0, ["region", "v"]),
        ],
        f"k long, region string, v string, w string, {OP_COL} string, "
        f"{LSN_COL} long, {COUNTER_COL} int, _present array<string>",
    )
    sink.write_cdc(batch, TableID("", "t"), keys=["k"])
    got = {op["filter"]["_id"]: op for op in ops()}
    assert got[1]["op"] == "update"
    assert got[1]["filter"] == {"_id": 1, "region": "eu"}
    assert not got[1].get("_isolated")
    assert got[1]["set"] == {"v": "a2"}
    assert got[2]["op"] == "update"
    assert got[2]["filter"] == {"_id": 2, "region": "us"}  # OLD value
    assert got[2].get("_isolated") is True
    assert got[2]["set"] == {"region": "ap", "v": "b2"}


def test_plan_sharded_ops_property_model():
    """Model-based property: for ANY event sequence and stored-key
    seed, applying the planned ops with real filter semantics
    (ReplaceOne upsert / UpdateOne upsert / DeleteOne against a store
    seeded at the stored key values) reaches the same final state as
    naive per-id event application — and no replace's filter ever
    MISSES an existing document (the mis-routing bug class the
    shard-key cache exists to prevent). r14 extends the model with the
    reference's partial-update contract (write_models.go:23-47):
    removed fields emit $unset, UpdateOne upserts a missing target
    document instead of silently no-opping."""
    import json as _json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from transferia_spark.sinks.mongo import plan_sharded_ops

    REGIONS = ["r0", "r1", "r2"]
    ids = st.integers(min_value=0, max_value=3)
    events = st.lists(
        st.tuples(
            ids,
            # p = partial set of v, r = partial REMOVAL of v
            st.sampled_from(["i", "u", "d", "p", "r"]),
            st.sampled_from(REGIONS),
            st.integers(min_value=0, max_value=9),   # v payload
            st.booleans(),                           # partial carries region?
        ),
        min_size=1, max_size=10,
    )
    seeds = st.dictionaries(ids, st.sampled_from(REGIONS), max_size=4)

    def _doc_json(d):
        # mimic Catalyst to_json: null fields are DROPPED
        return _json.dumps({k: v for k, v in d.items() if v is not None})

    @settings(max_examples=150, deadline=None)
    @given(events, seeds)
    def check(evs, seed_regions):
        # the target store seeded AT the stored key values
        store = {
            i: {"_id": i, "region": r, "v": -1}
            for i, r in seed_regions.items()
        }
        stored_keys = {
            str(i): {"_id": i, "region": r}
            for i, r in seed_regions.items()
        }
        rows = []
        for i, op, region, v, carries_region in evs:
            if op in ("p", "r"):
                present = {"region": carries_region, "v": True}
                removed = {"region": False, "v": op == "r"}
                rows.append({
                    "_id_json": _json.dumps({"v": i}),
                    "_doc_json": _doc_json(
                        {"k": i,
                         "region": region if carries_region else None,
                         "v": None if op == "r" else v}
                    ),
                    "_present_json": _json.dumps(present),
                    "_removed_json": _json.dumps(removed),
                    "_shard": 0, "_mop": "u",
                })
            else:
                rows.append({
                    "_id_json": _json.dumps({"v": i}),
                    "_doc_json": _doc_json(
                        {"k": i, "region": region, "v": v}
                    ),
                    "_present_json": None,
                    "_shard": 0, "_mop": op,
                })
        by_shard = plan_sharded_ops(
            rows, ["region", "_id"], dict(stored_keys), pk_cols=["k"],
        )

        # expected: naive per-id application of the raw events
        expected = {
            i: dict(d) for i, d in store.items()
        }
        for i, op, region, v, carries_region in evs:
            if op == "d":
                expected.pop(i, None)
            elif op in ("p", "r"):
                if carries_region and op == "p":
                    # every column carried, none removed → the planner
                    # upgrades the row to a full replace
                    expected[i] = {"_id": i, "region": region, "v": v}
                elif carries_region:
                    # op == "r" carrying region: all columns carried
                    # but v is net-REMOVED, so the planner stays on
                    # the UpdateOne path ($set region, $unset v) —
                    # final state {_id, region} either way
                    expected[i] = {"_id": i, "region": region}
                elif i in expected:
                    # genuine partial: patch/remove carried columns
                    if op == "r":
                        expected[i].pop("v", None)
                    else:
                        expected[i]["v"] = v
                else:
                    # UpdateOne upsert ≈ SetUpsert(true): a missing
                    # target document is CREATED from the filter's
                    # equality fields + $set (write_models.go:35)
                    expected[i] = (
                        {"_id": i} if op == "r" else {"_id": i, "v": v}
                    )
            else:
                expected[i] = {"_id": i, "region": region, "v": v}

        # apply the planned ops with mongo filter semantics
        def matches(doc, flt):
            return all(doc.get(k) == val for k, val in flt.items())

        for bulks in by_shard.values():
            for bulk in bulks:
                ids_in_bulk = [op["filter"]["_id"] for op in bulk]
                assert len(ids_in_bulk) == len(set(ids_in_bulk))
                for op_dict in bulk:
                    oid = op_dict["filter"]["_id"]
                    doc = store.get(oid)
                    if op_dict["op"] == "delete":
                        if doc is not None:
                            del store[oid]
                    elif op_dict["op"] == "update":
                        if doc is None:
                            # mongo upsert: new doc = filter equality
                            # fields + $set ($unset is a no-op there)
                            doc = store[oid] = dict(op_dict["filter"])
                        else:
                            assert matches(doc, op_dict["filter"]), (
                                "UpdateOne filter missed the live "
                                f"document: {op_dict['filter']} vs {doc}"
                            )
                        for c, val in op_dict.get("set", {}).items():
                            doc[c] = val  # null $set writes null
                        for c in op_dict.get("unset", []):
                            doc.pop(c, None)
                    else:  # replace, upsert
                        if doc is not None:
                            assert matches(doc, op_dict["filter"]), (
                                "ReplaceOne filter missed the live "
                                f"document: {op_dict['filter']} vs {doc}"
                            )
                        store[oid] = dict(op_dict["doc"])
        # partial sets write explicit None for carried-null columns;
        # normalize region=None vs absent for comparison
        def norm(d):
            return {i: {k: v for k, v in doc.items()}
                    for i, doc in d.items()}
        assert norm(store) == norm(expected)

    check()
