"""BigQuery sink: name normalization, schema mapping, streaming-insert
batching with deterministic insertIds, append-only CDC semantics.

Wire path runs against a recording HTTP stub (the sink speaks REST v2
``tables`` / ``insertAll``). Reference semantics:
``pkg/providers/bigquery/sink.go`` (normalizedName, 1024-row batches,
InsertKind only) and ``sink_value_saver.go`` (insertId = table/LSN/tx).
"""

from __future__ import annotations

import http.server
import json
import threading

import pytest
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import COUNTER_COL, LSN_COL, OP_COL
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, build_sink
from transferia_spark.sinks.bigquery import (
    BigQueryHttpClient,
    bq_schema,
    normalized_name,
)


def test_normalized_name():
    assert normalized_name(TableID("public", "users")) == "public_users"
    assert normalized_name(TableID("", "t")) == "t"


def test_bq_schema_type_map(spark):
    df = spark.createDataFrame(
        [(1, 2, 1.5, "s", b"b", True, "i", 5, 0)],
        "a long, b int, c double, d string, e binary, f boolean, "
        f"{OP_COL} string, {LSN_COL} long, {COUNTER_COL} int",
    )
    fields = {f["name"]: f for f in bq_schema(df, TableID("ns", "t"))}
    # system CDC columns never reach the destination schema
    assert set(fields) == {"a", "b", "c", "d", "e", "f"}
    assert fields["a"]["type"] == "BIGNUMERIC"   # int64 → BIGNUMERIC
    assert fields["b"]["type"] == "INTEGER"
    assert fields["c"]["type"] == "FLOAT"
    assert fields["d"]["type"] == "STRING"
    assert fields["e"]["type"] == "BYTES"
    assert fields["f"]["type"] == "BOOLEAN"
    assert fields["a"]["mode"] in ("NULLABLE", "REQUIRED")


class _Recorder(http.server.BaseHTTPRequestHandler):
    calls: list[tuple[str, str, str]] = []

    def _handle(self):
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode()
        type(self).calls.append((self.command, self.path, body))
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(b"{}")

    do_POST = do_DELETE = do_GET = _handle

    def log_message(self, *a):
        pass


@pytest.fixture()
def bq_stub():
    _Recorder.calls = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Recorder)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _Recorder.calls
    srv.shutdown()


def _sink(url, **kw):
    return build_sink(
        "bigquery",
        project="p",
        dataset="d",
        client_factory=lambda project, dataset: BigQueryHttpClient(
            project, dataset, base_url=url
        ),
        **kw,
    )


def test_write_creates_table_and_streams_rows(spark, bq_stub):
    url, calls = bq_stub
    df = spark.createDataFrame(
        [(1, "x", 100), (2, "y", 101)],
        f"id long, name string, {LSN_COL} long",
    ).coalesce(1)
    _sink(url).write(df, TableID("ns", "t"))

    creates = [c for c in calls if c[1].endswith("/tables") and c[0] == "POST"]
    assert len(creates) == 1
    body = json.loads(creates[0][2])
    assert body["tableReference"]["tableId"] == "ns_t"
    assert {f["name"] for f in body["schema"]["fields"]} == {"id", "name"}

    inserts = [c for c in calls if c[1].endswith("/insertAll")]
    assert len(inserts) == 1 and "/tables/ns_t/" in inserts[0][1]
    rows = json.loads(inserts[0][2])["rows"]
    by_id = {r["json"]["id"]: r for r in rows}
    assert by_id[1]["json"]["name"] == "x"
    # insertId = table/LSN/tx — BigQuery's retry dedup key
    assert by_id[1]["insertId"] == "t/100"
    assert by_id[2]["insertId"] == "t/101"


@pytest.mark.slow
def test_snapshot_insert_ids_content_derived_and_dupe_suffixed(spark, bq_stub):
    """ADVICE r3: snapshot ids must survive a Spark task retry — they
    derive from row CONTENT (xxhash64 of the payload JSON), so a
    recomputed partition yields the same id set regardless of row
    order; identical rows disambiguate with a stable occurrence
    suffix."""
    url, calls = bq_stub
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (1, "x")], "id long, name string"
    ).coalesce(1)
    _sink(url).write(df, TableID("ns", "t"))
    rows = [
        r
        for c in calls
        if c[1].endswith("/insertAll")
        for r in json.loads(c[2])["rows"]
    ]
    ids = sorted(r["insertId"] for r in rows)
    assert len(set(ids)) == 3  # identical rows still stream distinctly
    # every id carries "/<partition>#<occurrence>" so identical rows in
    # DIFFERENT partitions can never share the unsuffixed id (ADVICE r4)
    assert all("#" in i and i.startswith("t/") for i in ids)
    bases = [i.rsplit("/", 1)[0] for i in ids]
    assert len(set(bases)) == 2  # the (1, x) dup shares a content base
    occ = sorted(i.rsplit("#", 1)[1] for i in ids)
    assert occ == ["0", "0", "1"]

    # retry determinism: writing the same frame again yields the SAME set
    calls.clear()
    _sink(url).write(df, TableID("ns", "t"))
    again = sorted(
        r["insertId"]
        for c in calls
        if c[1].endswith("/insertAll")
        for r in json.loads(c[2])["rows"]
    )
    assert again == ids


def test_snapshot_insert_ids_unique_across_partitions(spark, bq_stub):
    """ADVICE r4: identical rows in *different* partitions must get
    globally-distinct insertIds (the partition id is folded in), else
    BigQuery's insertId dedup silently drops genuine duplicates."""
    url, calls = bq_stub
    one = spark.createDataFrame([(1, "x")], "id long, name string").coalesce(1)
    df = one.union(one)  # 2 partitions, one identical row in each
    _sink(url).write(df, TableID("ns", "t"))
    ids = [
        r["insertId"]
        for c in calls
        if c[1].endswith("/insertAll")
        for r in json.loads(c[2])["rows"]
    ]
    assert len(ids) == 2 and len(set(ids)) == 2


def test_write_batches_split(spark, bq_stub):
    url, calls = bq_stub
    df = spark.range(10).select(F.col("id")).coalesce(1)
    _sink(url, batch_rows=4).write(df, TableID("", "n"))
    inserts = [c for c in calls if c[1].endswith("/insertAll")]
    sizes = sorted(len(json.loads(c[2])["rows"]) for c in inserts)
    assert sizes == [2, 4, 4]  # 10 rows in ≤4-row sub-batches


def test_write_cdc_collapses_and_drops_deletes(spark, bq_stub):
    url, calls = bq_stub
    batch = spark.createDataFrame(
        [
            (1, "a", "i", 10, 0),
            (1, "a2", "u", 11, 0),
            (2, "gone", "i", 12, 0),
            (2, None, "d", 13, 0),
        ],
        f"id long, v string, {OP_COL} string, {LSN_COL} long, {COUNTER_COL} int",
    ).coalesce(1)
    _sink(url).write_cdc(batch, TableID("", "t"), keys=["id"])
    inserts = [c for c in calls if c[1].endswith("/insertAll")]
    rows = [r for c in inserts for r in json.loads(c[2])["rows"]]
    # net effect: id 1 survives with the updated value; the
    # insert-then-delete of id 2 streams nothing (append-only target)
    assert [r["json"]["id"] for r in rows] == [1]
    assert rows[0]["json"]["v"] == "a2"


def test_cleanup_drop_and_disabled(bq_stub):
    url, calls = bq_stub
    s = _sink(url)
    s.cleanup(TableID("ns", "t"), CleanupPolicy.DROP)
    assert calls and calls[-1][0] == "DELETE" and calls[-1][1].endswith("/tables/ns_t")
    n = len(calls)
    s.cleanup(TableID("ns", "t"), CleanupPolicy.DISABLED)
    assert len(calls) == n


def test_binary_streams_as_base64(spark, bq_stub):
    url, calls = bq_stub
    df = spark.createDataFrame([(1, b"\x00\x01")], "id long, payload binary").coalesce(1)
    _sink(url).write(df, TableID("", "b"))
    rows = [
        r
        for c in calls
        if c[1].endswith("/insertAll")
        for r in json.loads(c[2])["rows"]
    ]
    assert rows[0]["json"]["payload"] == "AAE="
