"""ClickHouse sink: DDL, FNV sharding, version-row planning, HTTP push.

No ClickHouse server exists in this environment; the network path is
exercised against a local HTTP stub that records every statement the
sink POSTs (the sink speaks the plain CH HTTP protocol, so the stub IS
the wire contract). Reference semantics under test:
``pkg/providers/clickhouse/sink_table.go`` (generateDDL,
buildChangeItemArgs), ``sharding/sharder.go`` (fnv1a-32 key hash).
"""

from __future__ import annotations

import http.server
import json
import threading
import urllib.parse

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.cdc.changeitem import BEFORE_COL, COUNTER_COL, LSN_COL, OP_COL
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, build_sink
from transferia_spark.sinks.clickhouse import (
    COMMIT_TIME_COL,
    DELETE_TIME_COL,
    ChShardingConfig,
    ClickHouseSink,
    fnv1a32,
    generate_ddl,
    plan_insert_batch,
    shard_column,
)


# --------------------------------------------------------------------------
# DDL
# --------------------------------------------------------------------------


def _schema():
    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("balance", T.DecimalType(18, 2), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )


def test_ddl_updateable_has_replacing_engine_and_system_columns():
    ddl = generate_ddl("users", _schema(), keys=["id"], updateable=True)
    assert "ENGINE=ReplacingMergeTree(__data_transfer_commit_time, __data_transfer_is_deleted)" in ddl
    assert "`__data_transfer_commit_time` UInt64" in ddl
    assert "`__data_transfer_delete_time` UInt64" in ddl
    assert "MATERIALIZED (if(__data_transfer_delete_time != 0, 1, 0))" in ddl
    assert "ORDER BY (`id`)" in ddl
    assert "`balance` Nullable(Decimal(18, 2))" in ddl
    assert "`ts` Nullable(DateTime64(6))" in ddl


def test_ddl_pre_23_2_has_no_is_deleted():
    ddl = generate_ddl("users", _schema(), keys=["id"], updateable=True, ch_version=(22, 8))
    assert "is_deleted" not in ddl
    assert "ENGINE=ReplacingMergeTree(__data_transfer_commit_time)" in ddl


def test_ddl_snapshot_plain_mergetree_and_nullable_key():
    sch = T.StructType([T.StructField("k", T.LongType(), True)])
    ddl = generate_ddl("t", sch, keys=["k"], updateable=False)
    assert "ENGINE=MergeTree()" in ddl
    assert "allow_nullable_key = 1" in ddl
    ddl2 = generate_ddl("t", sch, keys=[], updateable=False)
    assert "ORDER BY tuple()" in ddl2


def test_ddl_distributed_on_cluster():
    ddl = generate_ddl(
        "t", _schema(), keys=["id"], updateable=True, distributed=True,
        cluster="main", database="db",
    )
    assert "ON CLUSTER `main`" in ddl
    assert "ENGINE=ReplicatedReplacingMergeTree('/clickhouse/tables/{shard}/db.t_cdc', '{replica}'" in ddl


# --------------------------------------------------------------------------
# FNV-1a sharding
# --------------------------------------------------------------------------


def _fnv1a32_py(s: str) -> int:
    h = 2166136261
    for byte in s.encode():
        h = ((h ^ byte) * 16777619) % (1 << 32)
    return h


def test_fnv1a32_matches_reference_hash(spark):
    vals = ["", "a", "default", "user-42", "ключ", "東京"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", fnv1a32(F.col("s")).alias("h")).collect()}
    for v in vals:
        assert got[v] == _fnv1a32_py(v), v


def test_shard_column_precedence_and_mapping(spark):
    df = spark.createDataFrame([(1, "eu"), (2, "us"), (3, "apac")], "id long, region string")
    cfg = ChShardingConfig(shards=["s0", "s1"], shard_col="region",
                           column_to_shard_name={"eu": "s1"})
    rows = df.withColumn("_s", shard_column(cfg, "tid", df)).collect()
    by_region = {r["region"]: r["_s"] for r in rows}
    assert by_region["eu"] == 1          # user mapping wins
    assert by_region["us"] == 0          # unmapped → shard 0 (reference default)
    assert by_region["apac"] == 0

    hash_cfg = ChShardingConfig(shards=["s0", "s1", "s2"], shard_col="id")
    got = {r["id"]: r["_s"] for r in df.withColumn("_s", shard_column(hash_cfg, "t", df)).collect()}
    for i in (1, 2, 3):
        assert got[i] == _fnv1a32_py(str(i)) % 3

    const_cfg = ChShardingConfig(shards=["s0", "s1"])
    assert all(
        r["_s"] == 0
        for r in df.withColumn("_s", shard_column(const_cfg, "t", df)).collect()
    )


# --------------------------------------------------------------------------
# Version-row planning
# --------------------------------------------------------------------------


def _changelog(spark):
    # key 1: insert then update (nets to insert, last value kept)
    # key 2: delete                (delete row, delete_time set)
    # key 3: pk-change update 3→4  (delete old key + insert new)
    rows = [
        (1, "a", "i", 10, 0, None),
        (1, "a2", "u", 11, 0, None),
        (2, None, "d", 12, 0, None),
        (4, "moved", "u", 13, 0, {"id": 3}),
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField(OP_COL, T.StringType()),
            T.StructField(LSN_COL, T.LongType()),
            T.StructField(COUNTER_COL, T.IntegerType()),
            T.StructField(BEFORE_COL, T.StructType([T.StructField("id", T.LongType())])),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_plan_insert_batch_versions_deletes_and_pk_changes(spark):
    out = plan_insert_batch(_changelog(spark), keys=["id"]).orderBy("id").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    # collapsed update survives with latest payload, delete_time 0
    (r1,) = by_id[1]
    assert r1["name"] == "a2" and r1[DELETE_TIME_COL] == 0 and r1[COMMIT_TIME_COL] == 11
    # plain delete → tombstone row
    (r2,) = by_id[2]
    assert r2[DELETE_TIME_COL] == r2[COMMIT_TIME_COL] == 12
    # pk change: old key 3 tombstoned, new key 4 inserted
    (r3,) = by_id[3]
    assert r3[DELETE_TIME_COL] != 0
    (r4,) = by_id[4]
    assert r4["name"] == "moved" and r4[DELETE_TIME_COL] == 0


# --------------------------------------------------------------------------
# HTTP push against a stub server
# --------------------------------------------------------------------------


class _Recorder(http.server.BaseHTTPRequestHandler):
    statements: list[tuple[str, str]] = []  # (query, body)

    def do_POST(self):  # noqa: N802
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode()
        query = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query).get(
            "query", [""]
        )[0]
        type(self).statements.append((query or body, query and body or ""))
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def ch_stub():
    _Recorder.statements = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Recorder)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _Recorder.statements
    srv.shutdown()


def test_write_cdc_pushes_jsoneachrow_per_shard(spark, ch_stub):
    url, stmts = ch_stub
    sink = build_sink(
        "clickhouse",
        shard_urls={"s0": url, "s1": url},
        sharding=ChShardingConfig(shards=["s0", "s1"], shard_col="id"),
        write_format="JSONEachRow",  # the legacy write path, kept
    )
    sink.write_cdc(_changelog(spark), TableID("", "users"), keys=["id"])
    inserts = [s for s in stmts if s[0].startswith("INSERT INTO")]
    assert inserts, stmts
    all_rows = []
    for sql, body in inserts:
        assert "FORMAT JSONEachRow" in sql and "`users`" in sql
        all_rows += [json.loads(line) for line in body.splitlines() if line]
    assert {r["id"] for r in all_rows} == {1, 2, 3, 4}
    # each row went to the shard its fnv hash picks — rows for one key
    # are never split across inserts of different shards
    assert len(all_rows) == 4


def test_write_cdc_pushes_arrowstream_per_shard(spark, tmp_path):
    """r10 default write path: IPC bodies, one vectorized encode per
    shard slice — rows round-trip exactly through a binary recorder."""
    import http.server
    import io
    import threading
    import urllib.parse

    import pyarrow as pa

    received: list = []

    class BinRecorder(http.server.BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            ln = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(ln)
            q = urllib.parse.parse_qs(
                urllib.parse.urlparse(self.path).query
            ).get("query", [""])[0]
            received.append((q, body))
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), BinRecorder)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        sink = build_sink(
            "clickhouse",
            shard_urls={"s0": url, "s1": url},
            sharding=ChShardingConfig(shards=["s0", "s1"], shard_col="id"),
        )
        sink.write_cdc(_changelog(spark), TableID("", "users"), keys=["id"])
        inserts = [
            (q, b) for q, b in received if q.startswith("INSERT INTO")
        ]
        assert inserts
        rows = []
        for sql, body in inserts:
            assert "FORMAT ArrowStream" in sql and "`users`" in sql
            with pa.ipc.open_stream(pa.BufferReader(body)) as r:
                rows += r.read_all().to_pylist()
        assert {r["id"] for r in rows} == {1, 2, 3, 4}
        assert len(rows) == 4
        # version/tombstone system columns ride along
        assert all(
            "__data_transfer_commit_time" in r
            and "__data_transfer_delete_time" in r
            for r in rows
        )
        # code-review r10 pass 3: a delete-only batch NULLs every
        # payload column — the pinned IPC schema must keep the Spark
        # types (pandas inference would ship null-typed / float64
        # columns a real server rejects)
        received.clear()
        tomb = spark.createDataFrame(
            [(1, None, "d", 99, 0)],
            "id long, v string, _op string, _lsn long, _counter long",
        )
        sink.write_cdc(tomb, TableID("", "users"), keys=["id"])
        bodies = [b for q, b in received if q.startswith("INSERT INTO")]
        assert bodies
        with pa.ipc.open_stream(pa.BufferReader(bodies[0])) as r:
            sch = r.schema
        assert sch.field("id").type == pa.int64()
        assert sch.field("v").type == pa.string()  # NOT null/float64
    finally:
        srv.shutdown()
        srv.server_close()


def test_cleanup_and_create_table(spark, ch_stub):
    url, stmts = ch_stub
    sink = ClickHouseSink(shard_urls={"s0": url})
    sink.cleanup(TableID("", "users"), CleanupPolicy.DROP)
    sink.create_table(TableID("", "users"), _schema(), keys=["id"])
    assert any(s[0].startswith("DROP TABLE IF EXISTS `users`") for s in stmts)
    assert any(s[0].startswith("CREATE TABLE IF NOT EXISTS `users`") for s in stmts)
    # disabled policy is a no-op
    before = len(stmts)
    sink.cleanup(TableID("", "users"), CleanupPolicy.DISABLED)
    assert len(stmts) == before
