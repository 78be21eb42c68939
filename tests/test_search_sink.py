"""Elastic/OpenSearch sink: index naming, doc ids, bulk NDJSON push.

Wire path runs against a recording HTTP stub (the sink speaks the plain
bulk API). Reference semantics: ``pkg/providers/elastic/sink_funcs.go``
(makeIndexNameFromTableID, makeIDFromChangeItem,
makeIndexBodyFromChangeItem) and ``sink.go pushBatch``."""

from __future__ import annotations

import http.server
import json
import threading

import pytest
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import COUNTER_COL, LSN_COL, OP_COL
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, build_sink
from transferia_spark.sinks.search import (
    doc_id_column,
    make_index_name,
    OpenSearchSink,
)


def test_make_index_name_rules():
    assert make_index_name(TableID("Public", "Users")) == "public.users"
    assert make_index_name(TableID("", "t")) == "t"
    with pytest.raises(ValueError, match="illegal"):
        make_index_name(TableID("", "a b"))
    with pytest.raises(ValueError, match="start"):
        make_index_name(TableID("", "_hidden"))
    with pytest.raises(ValueError, match="empty"):
        make_index_name(TableID("", ""))


def test_doc_id_escaping_and_hashing(spark):
    df = spark.createDataFrame(
        [("a.b", 1), ("plain", 2), ("x" * 600, 3)], "k string, n int"
    )
    got = {r["n"]: r["i"] for r in df.select("n", doc_id_column(["k", "n"]).alias("i")).collect()}
    # dots in key values escaped before the join, then URL-escaped
    assert got[1] == "a%5C.b.1"
    assert got[2] == "plain.2"
    # >512 chars → sha1 hex (40 chars)
    assert len(got[3]) == 40 and all(c in "0123456789abcdef" for c in got[3])


class _Recorder(http.server.BaseHTTPRequestHandler):
    calls: list[tuple[str, str, str]] = []  # (method, path, body)

    def _handle(self):
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode()
        type(self).calls.append((self.command, self.path, body))
        self.send_response(200)
        self.end_headers()

    do_POST = do_DELETE = do_PUT = _handle

    def log_message(self, *a):
        pass


@pytest.fixture()
def es_stub():
    _Recorder.calls = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Recorder)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _Recorder.calls
    srv.shutdown()


def _changelog(spark):
    return spark.createDataFrame(
        [
            (1, "a", "i", 10, 0),
            (1, "a2", "u", 11, 0),
            (2, "gone", "d", 12, 0),
            (3, "c", "i", 13, 0),
        ],
        f"id long, name string, {OP_COL} string, {LSN_COL} long, {COUNTER_COL} int",
    )


def test_bulk_cdc_push_index_and_delete(spark, es_stub):
    url, calls = es_stub
    sink = build_sink("elastic", url=url)
    sink.write_cdc(_changelog(spark), TableID("app", "users"), keys=["id"])

    bulks = [c for c in calls if c[1] == "/_bulk"]
    assert bulks
    lines = [json.loads(line) for _, _, b in bulks for line in b.splitlines() if line]
    actions = [l for l in lines if "index" in l or "delete" in l]
    idx = {a["index"]["_id"]: a for a in actions if "index" in a}
    dele = [a for a in actions if "delete" in a]
    assert set(idx) == {"1", "3"}
    assert [d["delete"]["_id"] for d in dele] == ["2"]
    assert all(a["index"]["_index"] == "app.users" for a in idx.values())
    docs = [l for l in lines if "__data_transfer" in l]
    by_sys = {d["id"]: d for d in docs}
    assert by_sys[1]["name"] == "a2"  # collapsed to the last value
    assert by_sys[1]["__data_transfer"] == {"schema": "app", "table": "users"}


def test_snapshot_write_and_payload_id_renamed(spark, es_stub):
    url, calls = es_stub
    sink = OpenSearchSink(url=url)  # opensearch = same wire surface
    df = spark.createDataFrame([(5, "doc5")], "_id long, body string")
    sink.write(df, TableID("", "notes"), keys=["_id"])
    lines = [json.loads(line) for _, p, b in calls if p == "/_bulk" for line in b.splitlines()]
    (doc,) = [l for l in lines if "__data_transfer" in l]
    # payload _id collides with ES metadata → carried as original_id
    assert "_id" not in doc and doc["__data_transfer"]["original_id"] == 5


def test_cleanup_deletes_index(spark, es_stub):
    url, calls = es_stub
    sink = build_sink("elastic", url=url)
    sink.cleanup(TableID("app", "users"), CleanupPolicy.DROP)
    assert ("DELETE", "/app.users", "") in calls
    before = len(calls)
    sink.cleanup(TableID("app", "users"), CleanupPolicy.DISABLED)
    assert len(calls) == before


def test_data_stream_uses_create_action(spark, es_stub):
    url, calls = es_stub
    sink = build_sink("elastic", url=url, data_streams={"logs"})
    df = spark.createDataFrame([(1, "x")], "id long, v string").withColumn(
        OP_COL, F.lit("i")
    ).withColumn(LSN_COL, F.lit(1).cast("long")).withColumn(COUNTER_COL, F.lit(0))
    sink.write_cdc(df, TableID("", "logs"), keys=["id"])
    lines = [json.loads(line) for _, p, b in calls if p == "/_bulk" for line in b.splitlines()]
    assert any("create" in l for l in lines)


def test_kinesis_records_adapter(spark):
    """Kinesis record frame → raw queue shape → parser (source.go:197)."""
    from transferia_spark.parsers import build_parser
    from transferia_spark.streaming.readers import kinesis_records_to_raw

    records = spark.createDataFrame(
        [
            ("shardId-000000000001", "4959580", "pk1", b'{"a": 1}'),
            ("shardId-000000000002", "4959581", "pk2", b'{"a": 2}'),
        ],
        "shard_id string, sequence_number string, partition_key string, data binary",
    ).withColumn("arrival", F.current_timestamp())
    raw = kinesis_records_to_raw(records, stream="events-stream")
    assert set(raw.columns) == {"key", "value", "topic", "partition", "offset", "timestamp"}
    rows = {r["partition"]: r for r in raw.collect()}
    assert set(rows) == {1, 2} and rows[1]["topic"] == "events-stream"
    assert rows[1]["offset"] != rows[2]["offset"]  # unique per sequence number

    parsed = build_parser("json", schema="a INT", add_rest=False)(raw)
    assert sorted(r["a"] for r in parsed.collect()) == [1, 2]
