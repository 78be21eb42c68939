"""YT static-table sink: schema attribute, part-table upload,
concatenate + atomic move commit. Driven against a recording HTTP stub
(the sink speaks the public YT HTTP proxy v3 API)."""

from __future__ import annotations

import http.server
import json
import threading

import pytest
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import LSN_COL, OP_COL
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, build_sink
from transferia_spark.sinks.yt import YtHttpClient, yt_schema_attr


class _Recorder(http.server.BaseHTTPRequestHandler):
    calls: list[dict] = []

    def _handle(self):
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode()
        type(self).calls.append(
            {
                "cmd": self.path.rsplit("/", 1)[-1],
                "params": json.loads(self.headers.get("X-YT-Parameters", "{}")),
                "body": body,
            }
        )
        self.send_response(200)
        self.end_headers()

    do_PUT = do_POST = do_GET = _handle

    def log_message(self, *a):
        pass


@pytest.fixture()
def yt_stub():
    _Recorder.calls = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Recorder)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _Recorder.calls
    srv.shutdown()


def _sink(url, **kw):
    return build_sink(
        "yt_static",
        proxy_url=url,
        root="//home/t",
        client_factory=lambda proxy: YtHttpClient(proxy),
        **kw,
    )


def test_schema_attr_keys_first_sorted(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, None)],
        "id long, name string, score double, extra string",
    )
    schema = yt_schema_attr(df, key_cols=["id"])
    assert schema[0] == {
        "name": "id", "type": "int64", "required": False,
        "sort_order": "ascending",
    }
    by_name = {c["name"]: c for c in schema}
    assert by_name["name"]["type"] == "utf8"
    assert by_name["score"]["type"] == "double"
    assert "sort_order" not in by_name["score"]


def test_write_uploads_parts_then_commits(spark, yt_stub):
    url, calls = yt_stub
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(20)], "id long, name string"
    ).repartition(2)
    _sink(url, key_cols=["id"]).write(df, TableID("ns", "users"))

    cmds = [c["cmd"] for c in calls]
    target = "//home/t/ns_users"
    # per-part creates + merged create, writes, concatenate, move, cleanup
    creates = [c for c in calls if c["cmd"] == "create"]
    assert {c["params"]["path"] for c in creates} == {
        f"{target}_tmp/part_0", f"{target}_tmp/part_1", f"{target}_tmp/merged"
    }
    assert all(
        c["params"]["attributes"]["schema"][0]["sort_order"] == "ascending"
        for c in creates
    )
    writes = [c for c in calls if c["cmd"] == "write_table"]
    rows = [json.loads(ln) for c in writes for ln in c["body"].splitlines()]
    assert sorted(r["id"] for r in rows) == list(range(20))
    # retry-idempotence contract: the FIRST write of each part table
    # overwrites (truncating any half-written attempt), later chunks of
    # the same attempt append
    first_mode: dict[str, bool] = {}
    for c in writes:
        path = c["params"]["path"]
        appended = "<append=%true>" in path
        first_mode.setdefault(path.replace("<append=%true>", ""), appended)
    assert all(mode is False for mode in first_mode.values())
    # a previous failed run's tmp is force-removed before the creates
    removes = [c for c in calls if c["cmd"] == "remove"]
    assert any(c["params"]["path"] == f"{target}_tmp" for c in removes)
    concat = next(c for c in calls if c["cmd"] == "concatenate")
    assert concat["params"]["destination_path"] == f"{target}_tmp/merged"
    move = next(c for c in calls if c["cmd"] == "move")
    assert move["params"] == {
        "source_path": f"{target}_tmp/merged", "destination_path": target,
        "force": True, "recursive": True,
    }
    assert cmds[-1] == "remove"  # tmp dir cleanup after the swap


def test_write_cdc_keeps_inserts_only(spark, yt_stub):
    url, calls = yt_stub
    batch = spark.createDataFrame(
        [(1, "a", "i", 1), (2, "b", "u", 2), (3, "c", "d", 3)],
        f"id long, v string, {OP_COL} string, {LSN_COL} long",
    ).coalesce(1)
    _sink(url).write_cdc(batch, TableID("", "t"), keys=["id"])
    rows = [
        json.loads(ln)
        for c in calls
        if c["cmd"] == "write_table"
        for ln in c["body"].splitlines()
    ]
    assert [r["id"] for r in rows] == [1]  # static sink consumes inserts only
    assert all(OP_COL not in r for r in rows)  # system cols stripped


def test_cleanup_removes_target(yt_stub):
    url, calls = yt_stub
    s = _sink(url)
    s.cleanup(TableID("", "t"), CleanupPolicy.DROP)
    assert calls[-1]["cmd"] == "remove"
    assert calls[-1]["params"]["path"] == "//home/t/t"
    n = len(calls)
    s.cleanup(TableID("", "t"), CleanupPolicy.DISABLED)
    assert len(calls) == n


def test_binary_base64(spark, yt_stub):
    url, calls = yt_stub
    df = spark.createDataFrame([(1, b"\x00\x01")], "id long, p binary").coalesce(1)
    _sink(url).write(df, TableID("", "b"))
    rows = [
        json.loads(ln)
        for c in calls
        if c["cmd"] == "write_table"
        for ln in c["body"].splitlines()
    ]
    assert rows[0]["p"] == "AAE="
