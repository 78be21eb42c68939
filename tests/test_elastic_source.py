"""Elastic/OpenSearch sliced-scroll source against a canned stub:
index listing (dot-indices skipped), mapping→schema conversion, the
per-slice scroll loop draining to exhaustion, slice disjointness."""

from __future__ import annotations

import http.server
import json
import re
import threading

import pytest

from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.search import SearchHttpClient
from transferia_spark.sources.base import build_source
from transferia_spark.sources.elastic import mapping_to_schema

N_DOCS = 10  # per slice: page1 = 2 docs, page2 = rest


class _EsStub(http.server.BaseHTTPRequestHandler):
    """Serves: _stats, _mapping, sliced _search with scroll pages."""

    def _send(self, obj):
        body = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/_stats":
            self._send({"indices": {"docs_idx": {}, ".geoip_databases": {}, "other": {}}})
        elif self.path.endswith("/_mapping"):
            idx = self.path.split("/")[1]
            self._send({idx: {"mappings": {"properties": {
                "id": {"type": "long"},
                "name": {"type": "keyword"},
                "score": {"type": "double"},
                "meta": {"type": "object", "properties": {}},
            }}}})
        else:
            self._send({})

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(length) or b"{}")
        if re.match(r"^/[^/]+/_search", self.path):
            sl = body.get("slice", {"id": 0})["id"]
            hits = [self._doc(sl, i) for i in range(2)]
            self._send({"_scroll_id": f"scroll-{sl}-1",
                        "hits": {"hits": hits}})
        elif self.path == "/_search/scroll":
            sl, page = map(int, body["scroll_id"].split("-")[1:])
            if page == 1:
                hits = [self._doc(sl, i) for i in range(2, N_DOCS)]
                self._send({"_scroll_id": f"scroll-{sl}-2",
                            "hits": {"hits": hits}})
            else:
                self._send({"_scroll_id": body["scroll_id"],
                            "hits": {"hits": []}})
        else:
            self._send({})

    def do_DELETE(self):
        self._send({})

    @staticmethod
    def _doc(sl, i):
        return {"_source": {"id": sl * 100 + i, "name": f"d{sl}_{i}",
                            "score": i / 2, "meta": None}}

    def log_message(self, *a):
        pass


@pytest.fixture()
def es_stub():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _EsStub)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_mapping_to_schema():
    st = mapping_to_schema({"properties": {
        "a": {"type": "long"}, "b": {"type": "text"},
        "c": {"type": "unsigned_long"}, "nested_thing": {"type": "nested"},
    }})
    got = {f.name: f.dataType.simpleString() for f in st.fields}
    assert got == {"a": "bigint", "b": "string",
                   "c": "decimal(20,0)", "nested_thing": "string"}


def test_table_list_skips_internal(spark, es_stub):
    src = build_source("elastic_source", url=es_stub, n_slices=2)
    assert [t.name for t in src.table_list(spark)] == ["docs_idx", "other"]


def test_sliced_scroll_reads_all_docs(spark, es_stub):
    src = build_source("elastic_source", url=es_stub, n_slices=4)
    df = src.load_table(spark, TableID("", "docs_idx"))
    rows = df.collect()
    # 4 slices × N_DOCS disjoint docs, schema from the mapping
    assert len(rows) == 4 * N_DOCS
    ids = sorted(r["id"] for r in rows)
    assert ids == sorted(s * 100 + i for s in range(4) for i in range(N_DOCS))
    assert df.columns == ["id", "meta", "name", "score"]
    one = {r["id"]: r for r in rows}[105]
    assert one["name"] == "d1_5" and one["score"] == 2.5


# --------------------------------------------------------------------------
# Live HTTP data plane (r9): a REAL loopback server, the DEFAULT
# SearchHttpClient — executor tasks run the whole sliced-scroll loop
# (open -> page -> page -> clear) over actual sockets.
# --------------------------------------------------------------------------


def _loopback_es_server(received: list, n_docs: int = 10, page: int = 3):
    import http.server
    import json as _json
    import threading

    docs = [{"id": i, "v": f"d{i}"} for i in range(n_docs)]
    scrolls: dict[str, dict] = {}

    class H(http.server.BaseHTTPRequestHandler):
        def _reply(self, obj, code=200):
            out = _json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def do_GET(self):
            received.append(("GET", self.path, b""))
            if self.path == "/_stats":
                self._reply({"indices": {"docs": {}, ".internal": {}}})
            elif self.path.endswith("/_mapping"):
                idx = self.path.split("/")[1]
                self._reply({idx: {"mappings": {"properties": {
                    "id": {"type": "long"}, "v": {"type": "keyword"},
                }}}})
            else:
                self._reply({}, 404)

        def do_POST(self):
            ln = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(ln)
            received.append(("POST", self.path, body))
            req = _json.loads(body)
            if self.path.startswith("/_search/scroll"):
                st = scrolls[req["scroll_id"]]
            else:
                sl = req.get("slice", {"id": 0, "max": 1})
                mine = [d for i, d in enumerate(docs)
                        if i % sl["max"] == sl["id"]]
                sid = f"s{sl['id']}"
                scrolls[sid] = {"docs": mine, "pos": 0, "id": sid}
                st = scrolls[sid]
            take = st["docs"][st["pos"]:st["pos"] + page]
            st["pos"] += len(take)
            self._reply({
                "_scroll_id": st["id"],
                "hits": {"hits": [{"_source": d} for d in take]},
            })

        def do_DELETE(self):
            received.append(("DELETE", self.path, b""))
            self._reply({"succeeded": True})

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def test_elastic_live_http_sliced_scroll_e2e(spark):
    from transferia_spark.schema.colschema import TableID
    from transferia_spark.sources.elastic import ElasticSource

    received: list = []
    srv = _loopback_es_server(received, n_docs=10, page=3)
    src = ElasticSource(
        url=f"http://127.0.0.1:{srv.server_port}", n_slices=2,
        page_size=3,
    )
    tids = src.table_list(spark)
    assert [t.name for t in tids] == ["docs"]  # dot-index skipped
    df = src.load_table(spark, TableID("", "docs"))
    rows = sorted((r.id, r.v) for r in df.collect())
    srv.shutdown()
    assert rows == [(i, f"d{i}") for i in range(10)]
    # discovered schema came from the live _mapping call
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string"
    ]
    opens = [b for m, p, b in received
             if m == "POST" and p.startswith("/docs/_search")]
    assert len(opens) == 2  # one open per slice
    # each slice PAGED (5 docs at page 3 -> at least one continuation)
    conts = [p for m, p, _b in received
             if m == "POST" and p.startswith("/_search/scroll")]
    assert len(conts) >= 2
    # scroll contexts were cleared
    assert any(m == "DELETE" for m, _p, _b in received)
