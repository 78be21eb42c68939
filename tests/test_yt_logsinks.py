"""YT static-table source and the Datadog/Coralogix log-API sinks."""

import http.server
import json
import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.logs import (
    CoralogixSink,
    DatadogSink,
    render_template,
)
from transferia_spark.sources.yt import YtStaticSource, key_columns, yt_schema_to_spark

# ------------------------------------------------------------------- yt

YT_SCHEMA = [
    {"name": "id", "type": "uint64", "sort_order": "ascending", "required": True},
    {"name": "name", "type": "utf8"},
    {"name": "score", "type": "double"},
    {"name": "seen", "type": "timestamp"},
]


def test_yt_schema_mapping():
    st = yt_schema_to_spark(YT_SCHEMA)
    assert st["id"].dataType == T.DecimalType(20, 0)  # uint64 contract
    assert not st["id"].nullable and st["id"].metadata == {"pk": True}
    assert st["name"].dataType == T.StringType() and st["name"].nullable
    assert st["seen"].dataType == T.TimestampType()
    assert key_columns(YT_SCHEMA) == ["id"]


def test_yt_static_source_reads_weak_json_export(spark, tmp_path):
    data = tmp_path / "users"
    data.mkdir()
    (data / "part0.json").write_text(
        json.dumps({"id": "18446744073709551615", "name": "max", "score": "1.5"})
        + "\n"
        + json.dumps({"id": "7", "name": None, "score": "2.0"})
        + "\n"
    )
    src = YtStaticSource(
        {"users": {"path": str(data), "schema": YT_SCHEMA, "format": "json"}}
    )
    out = src.load_table(spark, TableID("", "users")).orderBy("score")
    rows = out.collect()
    # uint64.max survives through decimal(20,0)
    assert str(rows[0].id) == "18446744073709551615"
    assert rows[1].id == 7 and rows[1].name is None
    assert [f.dataType for f in out.schema.fields][:1] == [T.DecimalType(20, 0)]
    assert src.table_list(spark) == [TableID("", "users")]


def test_yt_live_http_read_e2e(spark):
    """r10: the YT live read plane — row-range-parallel read_table over
    a loopback HTTP proxy (the public /api/v3 surface) with the
    executor tasks dialing it themselves; ranges are exclusive and
    exhaustive, the OAuth header rides every request, and the weak
    JSON rows strictify into the declared schema."""
    import urllib.parse

    from transferia_spark.sources.yt import plan_read_ranges, range_ypath

    assert plan_read_ranges(23, 5) == [
        (0, 5), (5, 10), (10, 15), (15, 20), (20, 23)
    ]
    assert plan_read_ranges(0, 5) == [(0, 0)]
    assert range_ypath("//home/t", 5, 10) == "//home/t[#5:#10]"

    all_rows = [
        {"id": i, "name": f"u{i}", "score": i / 2,
         # full type-matrix coverage (code-review r10 pass 3: the
         # string demotion crashed on any non-core type): epoch-day
         # date, µs timestamp, uint64 above int64.max, bytes, json
         "d": 19600 + i, "ts": 1_700_000_000_000_000 + i,
         "big": 18446744073709551615 - i, "blob": f"b{i}",
         "tags": {"k": i}}
        for i in range(12)
    ]
    requests: list = []

    class Proxy(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            u = urllib.parse.urlparse(self.path)
            q = urllib.parse.parse_qs(u.query)
            requests.append(
                (u.path, q.get("path", [""])[0],
                 self.headers.get("Authorization"))
            )
            if u.path.endswith("/get"):
                body = b"12"  # @row_count
            else:
                ypath = q["path"][0]
                rng = ypath[ypath.index("[#") + 2:-1]
                s, e = (int(x) for x in rng.split(":#"))
                body = b"\n".join(
                    json.dumps(r).encode() for r in all_rows[s:e]
                )
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Proxy)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        src = YtStaticSource({
            "users": {
                "path": "//home/users",
                "schema": [
                    {"name": "id", "type": "int64", "required": True,
                     "sort_order": "ascending"},
                    {"name": "name", "type": "utf8"},
                    {"name": "score", "type": "double"},
                    {"name": "d", "type": "date"},
                    {"name": "ts", "type": "timestamp"},
                    {"name": "big", "type": "uint64"},
                    {"name": "blob", "type": "string"},
                    {"name": "tags", "type": "any"},
                ],
                "format": "live",
                "live": {
                    "proxy": f"http://127.0.0.1:{srv.server_address[1]}",
                    "token": "sekret",
                },
                "rows_per_task": 5,
            }
        })
        df = src.load_table(spark, TableID("", "users"))
        rows = {r.id: r for r in df.collect()}
        assert sorted(rows) == list(range(12))
        assert rows[3].name == "u3" and rows[3].score == 1.5
        assert [f.dataType.simpleString() for f in df.schema.fields] == [
            "bigint", "string", "double", "date", "timestamp",
            "decimal(20,0)", "binary", "string",
        ]
        import datetime as dt
        import json as _json

        assert rows[0].d == dt.date(1970, 1, 1) + dt.timedelta(days=19600)
        assert rows[0].ts == dt.datetime(
            2023, 11, 14, 22, 13, 20
        )  # 1.7e15 µs, UTC session
        assert str(rows[0].big) == "18446744073709551615"  # uint64.max
        assert bytes(rows[1].blob) == b"b1"
        assert _json.loads(rows[2].tags) == {"k": 2}
        # the driver asked for @row_count; tasks pulled disjoint,
        # exhaustive ranges with the OAuth header
        gets = [p for p, _y, _a in requests if p.endswith("/get")]
        reads = [y for p, y, _a in requests if p.endswith("/read_table")]
        assert len(gets) == 1
        assert sorted(reads) == [
            "//home/users[#0:#5]", "//home/users[#10:#12]",
            "//home/users[#5:#10]",
        ]
        assert all(a == "OAuth sekret" for _p, _y, a in requests)
        # predicate pushes into the plan (post-strictify filter)
        assert src.load_table(
            spark, TableID("", "users"), where="id >= 10"
        ).count() == 2
    finally:
        srv.shutdown()
        srv.server_close()


# ------------------------------------------------------------- log sinks


class _Recorder(http.server.BaseHTTPRequestHandler):
    calls: list[tuple[str, str, str, dict]] = []

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode()
        type(self).calls.append(
            (self.command, self.path, body, dict(self.headers))
        )
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):
        pass


@pytest.fixture()
def log_stub():
    _Recorder.calls = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Recorder)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/api/v2/logs", _Recorder.calls
    srv.shutdown()


def test_render_template(spark):
    df = spark.createDataFrame([(1, "x"), (2, None)], ["a", "b"])
    out = df.select(render_template("a={a} b={b}!").alias("m")).orderBy("a").collect()
    assert out[0].m == "a=1 b=x!"
    assert out[1].m == "a=2 b=!"  # NULL renders empty, row still logs


def test_datadog_sink_items_and_chunks(spark, log_stub):
    url, calls = log_stub
    df = spark.createDataFrame(
        [(i, f"h{i % 2}", float(i)) for i in range(5)], ["event_id", "host", "value"]
    ).coalesce(1)
    sink = DatadogSink(
        url,
        api_key="k",
        message_template="event {event_id} value {value}",
        tag_columns=["event_id"],
        host_column="host",
        chunk_size=2,
    )
    sink.write(df, TableID("app", "events"))
    assert len(calls) == 3  # 5 rows / chunk 2 → 2+2+1
    headers_ci = {k.lower(): v for k, v in calls[0][3].items()}
    assert headers_ci["dd-api-key"] == "k"
    items = [it for _, _, body, _ in calls for it in json.loads(body)]
    assert len(items) == 5
    assert items[0]["ddsource"] == '"app"."events"'
    assert items[0]["ddtags"].startswith("event_id:")
    assert "value" in items[0]["message"] and items[0]["hostname"] in ("h0", "h1")


def test_datadog_sink_drops_non_inserts(spark, log_stub):
    url, calls = log_stub
    df = spark.createDataFrame(
        [(1, "i"), (2, "u"), (3, "d")], ["event_id", "_op"]
    ).coalesce(1)
    DatadogSink(url, api_key="k", message_template="{event_id}").write(
        df, TableID("", "t")
    )
    items = [it for _, _, body, _ in calls for it in json.loads(body)]
    assert len(items) == 1 and items[0]["message"] == "1"


def test_coralogix_entries(spark, log_stub):
    url, calls = log_stub
    df = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", "boom")], ["event_id", "ts", "msg"]
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "msg")
    CoralogixSink(
        url,
        private_key="pk",
        application="app",
        subsystem="sub",
        message_template="{msg}",
        ts_column="ts",
    ).write(df, TableID("", "t"))
    items = [it for _, _, body, _ in calls for it in json.loads(body)]
    assert items[0]["applicationName"] == "app" and items[0]["text"] == "boom"
    assert items[0]["timestamp"] == 1767225600000
    auth = calls[0][3].get("Authorization")
    assert auth == "Bearer pk"
