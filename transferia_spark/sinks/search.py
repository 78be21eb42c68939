"""Elasticsearch / OpenSearch sink over the public bulk NDJSON API.

≈ transferia/transferia ``pkg/providers/elastic/sink.go:150``
(``pushBatch``: one bulk indexer, action ``index`` — or ``create`` for
data streams — per insert item) and ``sink_funcs.go``
(``makeIndexNameFromTableID:24``: lowercased ``namespace.name`` with
the documented illegal-symbol checks; ``makeIDFromChangeItem:53``:
PK values dot-joined, dot-escaped, URL-escaped, SHA-1'd past 512
chars; ``makeIndexBodyFromChangeItem:73``: payload + a
``__data_transfer {schema, table, id}`` system object, a payload
``_id`` renamed to ``original_id``). The same provider shape backs
OpenSearch (``pkg/providers/opensearch`` wraps the identical sink
surface).

Spark-first: document construction (index name, doc id, body) is
planned as Column expressions — ``to_json`` of a payload struct, the
doc id via ``url_encode``/``sha1`` builtins — so executors only
concatenate prepared strings into NDJSON and POST per partition
directly to the cluster (executor→node, never via the driver). The
transport is stdlib urllib (same pattern as the ClickHouse sink);
tests drive it against a recording HTTP stub.

CDC: ``index`` on insert/update (idempotent by doc id — the upsert
the reference gets by replaying inserts), bulk ``delete`` on delete.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import (
    COUNTER_COL,
    LSN_COL,
    OP_COL,
    OP_DELETE,
)
from transferia_spark.cdc.collapse import collapse
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, Sink, register_sink

ILLEGAL_SYMBOLS = '\\/*?"<>| ,#:'
ILLEGAL_START = "-_+"


def make_index_name(table: TableID) -> str:
    """≈ ``makeIndexNameFromTableID`` with the reference's checks."""
    out = ".".join(p for p in (table.namespace, table.name) if p)
    if out in ("", ".", ".."):
        raise ValueError(f"index name {out!r} can't be empty, . or ..")
    out = out.lower()
    if any(ch in ILLEGAL_SYMBOLS for ch in out):
        raise ValueError(f"index name {out!r} contains illegal symbols {ILLEGAL_SYMBOLS!r}")
    if out[0] in ILLEGAL_START:
        raise ValueError(f"index name {out!r} can't start with {ILLEGAL_START!r}")
    return out


def doc_id_column(keys: list[str]) -> Column:
    """≈ ``makeIDFromChangeItem``: PK values with ``.`` escaped to
    ``\\.``, dot-joined, URL-escaped; ids longer than 512 chars become
    their SHA-1 hex. Pure Catalyst (url_encode/sha1 are builtins)."""
    parts = [
        F.regexp_replace(F.col(k).cast("string"), r"\.", r"\\.") for k in keys
    ]
    joined = F.url_encode(F.concat_ws(".", *parts))
    return F.when(F.length(joined) > 512, F.sha1(joined)).otherwise(joined)


def document_body(df: DataFrame, table: TableID, keys: list[str]) -> Column:
    """≈ ``makeIndexBodyFromChangeItem``: payload columns + the
    ``__data_transfer`` system object; a payload ``_id`` collides with
    the ES metadata field and is carried as ``original_id``."""
    payload = [
        c
        for c in df.columns
        if c not in (OP_COL, LSN_COL, COUNTER_COL, "_commit_ts", "_tx_id", "_before")
    ]
    fields = []
    for c in payload:
        if c == "_id":
            continue
        fields.append(F.col(c).alias(c))
    sysinfo = F.struct(
        F.lit(table.namespace).alias("schema"),
        F.lit(table.name).alias("table"),
        *( [F.col("_id").alias("original_id")] if "_id" in payload else [] ),
    ).alias("__data_transfer")
    return F.to_json(F.struct(*fields, sysinfo))


class SearchHttpClient:
    """Minimal ES/OpenSearch HTTP client (stdlib only)."""

    def __init__(self, url: str, user: str = "", password: str = "", timeout: int = 90):
        self.url = url.rstrip("/")
        self.user, self.password = user, password
        self.timeout = timeout

    def request(self, method: str, path: str, body: bytes = b"",
                content_type: str = "application/json") -> bytes:
        import base64
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            self.url + path, data=body or None, method=method
        )
        req.add_header("Content-Type", content_type)
        if self.user:
            token = base64.b64encode(f"{self.user}:{self.password}".encode()).decode()
            req.add_header("Authorization", f"Basic {token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:  # 404 on idempotent deletes is fine
            if e.code == 404 and method == "DELETE":
                return b""
            raise

    def bulk(self, ndjson: bytes) -> bytes:
        return self.request("POST", "/_bulk", ndjson, "application/x-ndjson")


@register_sink
class SearchSink(Sink):
    """Elasticsearch/OpenSearch bulk writer."""

    TYPE = "elastic"

    def __init__(
        self,
        url: str,
        data_streams: set[str] | None = None,
        batch_actions: int = 1000,
        sanitize_doc_keys: bool = False,
        client_factory: Callable[[str], SearchHttpClient] = SearchHttpClient,
    ):
        self.url = url
        self.data_streams = set(data_streams or ())  # index → action "create"
        self.batch_actions = batch_actions
        self.sanitize_doc_keys = sanitize_doc_keys
        self.client_factory = client_factory

    def cleanup(self, table: TableID, policy: CleanupPolicy) -> None:
        if policy == CleanupPolicy.DISABLED:
            return
        # both policies delete the index (dropIndex; truncate has no
        # cheaper public form — delete-by-query is slower and weaker)
        self.client_factory(self.url).request(
            "DELETE", f"/{make_index_name(table)}"
        )

    def write(self, df: DataFrame, table: TableID, keys: list[str] | None = None) -> None:
        self._push(df, table, keys or [])

    def write_cdc(
        self,
        batch: DataFrame,
        table: TableID,
        keys: list[str],
        toast_aware: bool | None = None,
    ) -> None:
        net = collapse(batch, keys, toast_aware=toast_aware)
        self._push(net, table, keys)

    def _push(self, df: DataFrame, table: TableID, keys: list[str]) -> None:
        index = make_index_name(table)
        action = "create" if index in self.data_streams else "index"
        has_op = OP_COL in df.columns

        cols = [document_body(df, table, keys).alias("_doc")]
        cols.append(
            (doc_id_column(keys) if keys else F.lit(None).cast("string")).alias("_doc_id")
        )
        if has_op:
            cols.append((F.col(OP_COL) == OP_DELETE).alias("_is_del"))
        planned = df.select(*cols)

        url, factory, batch_actions = self.url, self.client_factory, self.batch_actions

        def per_partition(rows):
            client = factory(url)
            buf: list[bytes] = []

            def flush():
                if buf:
                    client.bulk(b"\n".join(buf) + b"\n")
                    buf.clear()

            for row in rows:
                meta = {"_index": index}
                if row["_doc_id"]:
                    meta["_id"] = row["_doc_id"]
                if has_op and row["_is_del"]:
                    buf.append(json.dumps({"delete": meta}).encode())
                else:
                    buf.append(json.dumps({action: meta}).encode())
                    buf.append(row["_doc"].encode())
                if len(buf) >= 2 * batch_actions:
                    flush()
            flush()

        planned.foreachPartition(per_partition)


@register_sink
class OpenSearchSink(SearchSink):
    """OpenSearch shares the elastic wire surface
    (``pkg/providers/opensearch`` wraps the same sink)."""

    TYPE = "opensearch"
