"""YTsaurus static-table sink over the public HTTP proxy API.

≈ transferia/transferia ``pkg/providers/yt/sink/static_table.go``:
- Push writes INSERT items only (static tables are snapshot targets);
- each table uploads into a TEMP table ``<target>_<postfix>`` created
  with the YT ``schema`` attribute derived from the batch schema
  (``staticYTSchema:189``, ``addWriter:326-368``), key columns as
  ``sort_order: ascending``;
- commit atomically replaces the target with the temp table
  (the reference runs the write in a YT transaction bracketed by
  InitTableLoad/DoneTableLoad control items — in Spark the job itself
  is the bracket: write every partition part, then commit);
- string values are length-capped (``YtStatMaxStringLength``) before
  write (``RestoreWithLengthLimitCheck``).

Spark-first distribution: every partition streams its rows as a
JSON-lines ``write_table`` to its OWN part table
``<tmp>/part_<partition>`` (executor→proxy, never via the driver);
``commit_table`` then ``concatenate``s the parts into the temp table
and ``move``s it over the target with ``force=true`` — YT's
concatenate is a metadata operation, so the distributed upload costs
one HTTP round-trip per partition plus two metadata calls. Row JSON
is planned as a single ``to_json`` Column (binary → base64, the YT
JSON format's ``yson_string`` convention left to the proxy).

No YT cluster exists in this environment: transport is stdlib urllib
behind an injectable client factory; tests drive a recording stub.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.cdc.changeitem import COUNTER_COL, LSN_COL, OP_COL
from transferia_spark.schema.colschema import TableID
from transferia_spark.schema.typesystem import spark_to_yt
from transferia_spark.sinks.base import CleanupPolicy, Sink, register_sink

YT_MAX_STRING = 16 * 1024 * 1024  # YtStatMaxStringLength analog
_SYSTEM_COLS = (OP_COL, LSN_COL, COUNTER_COL, "_commit_ts", "_tx_id", "_before", "_batch")


def yt_schema_attr(df: DataFrame, key_cols: list[str] | None = None) -> list[dict]:
    """StructType → YT ``schema`` attribute (list of column specs),
    key columns first with ``sort_order: ascending`` — the shape
    ``staticYTSchema`` produces."""
    keys = key_cols or []
    specs = {}
    for f in df.schema.fields:
        if f.name in _SYSTEM_COLS:
            continue
        spec = {
            "name": f.name,
            "type": spark_to_yt(f.dataType),
            "required": not f.nullable,
        }
        specs[f.name] = spec
    ordered = []
    for k in keys:
        if k in specs:
            specs[k]["sort_order"] = "ascending"
            ordered.append(specs.pop(k))
    ordered.extend(specs.values())
    return ordered


class YtHttpClient:
    """Minimal YT HTTP proxy client (v3 API, stdlib only)."""

    def __init__(self, proxy_url: str, token: str = "", timeout: int = 120):
        self.base = proxy_url.rstrip("/")
        self.token, self.timeout = token, timeout

    def request(self, command: str, params: dict, body: bytes = b"") -> bytes:
        import urllib.request

        req = urllib.request.Request(
            f"{self.base}/api/v3/{command}", data=body or None,
            method="PUT" if body or command in ("create", "move", "concatenate",
                                                "remove", "write_table") else "GET",
        )
        req.add_header("X-YT-Parameters", json.dumps(params))
        req.add_header("X-YT-Header-Format", "<format=text>json")
        req.add_header("X-YT-Input-Format", "json")
        if self.token:
            req.add_header("Authorization", f"OAuth {self.token}")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return resp.read()

    def create_table(self, path: str, schema: list[dict]) -> None:
        self.request(
            "create",
            {"path": path, "type": "table", "recursive": True,
             "ignore_existing": False,
             "attributes": {"schema": schema, "optimize_for": "scan"}},
        )

    def write_table(self, path: str, jsonl: bytes, append: bool = False) -> None:
        p = f"<append=%true>{path}" if append else path
        self.request("write_table", {"path": p}, jsonl)

    def concatenate(self, sources: list[str], dst: str) -> None:
        self.request("concatenate", {"source_paths": sources, "destination_path": dst})

    def move(self, src: str, dst: str) -> None:
        self.request("move", {"source_path": src, "destination_path": dst,
                              "force": True, "recursive": True})

    def remove(self, path: str) -> None:
        self.request("remove", {"path": path, "recursive": True, "force": True})


@register_sink
class YtStaticSink(Sink):
    """Distributed static-table writer: part tables per partition →
    concatenate → atomic move."""

    TYPE = "yt_static"

    def __init__(
        self,
        proxy_url: str = "",
        root: str = "//home/transfer",
        key_cols: list[str] | None = None,
        postfix: str = "tmp",
        client_factory: Callable[[str], YtHttpClient] = YtHttpClient,
    ):
        self.proxy_url, self.root = proxy_url, root
        self.key_cols = key_cols or []
        self.postfix = postfix  # deterministic (retries overwrite, not duplicate)
        self.client_factory = client_factory

    def target_path(self, table: TableID) -> str:
        name = f"{table.namespace}_{table.name}" if table.namespace else table.name
        return f"{self.root}/{name}"

    def _planned(self, df: DataFrame) -> DataFrame:
        cols = []
        for f in df.schema.fields:
            if f.name in _SYSTEM_COLS:
                continue
            col = F.col(f.name)
            if isinstance(f.dataType, T.BinaryType):
                col = F.base64(col)
            elif isinstance(f.dataType, T.StringType):
                col = F.substring(col, 1, YT_MAX_STRING)
            cols.append(col.alias(f.name))
        return df.select(
            F.to_json(F.struct(*cols)).alias("_json"),
            F.spark_partition_id().alias("_part"),
        )

    def write(self, df: DataFrame, table: TableID) -> None:
        target = self.target_path(table)
        tmp = f"{target}_{self.postfix}"
        schema = yt_schema_attr(df, self.key_cols)
        n_parts = df.rdd.getNumPartitions()

        client = self.client_factory(self.proxy_url)
        # a failed previous run leaves tmp behind; force-remove so the
        # rerun's create_table calls don't die on "node already exists"
        client.remove(tmp)
        for p in range(n_parts):
            client.create_table(f"{tmp}/part_{p}", schema)

        factory, proxy = self.client_factory, self.proxy_url

        def per_partition(rows):
            # first chunk OVERWRITES the part table (a Spark task retry
            # or speculative duplicate then truncates its own part
            # instead of double-appending — per-partition idempotence);
            # later chunks of the same attempt append
            c = None
            buf, part = [], None
            fresh: set[int] = set()

            def flush():
                nonlocal c
                c = c or factory(proxy)
                c.write_table(
                    f"{tmp}/part_{part}",
                    b"\n".join(buf) + b"\n",
                    append=part in fresh,
                )
                fresh.add(part)
                buf.clear()

            for row in rows:
                part = row["_part"]
                buf.append(row["_json"].encode())
                if len(buf) >= 5000:
                    flush()
            if buf and part is not None:
                flush()

        self._planned(df).foreachPartition(per_partition)

        # commit: metadata-only concatenate + atomic swap over target
        client.create_table(f"{tmp}/merged", schema)
        client.concatenate(
            [f"{tmp}/part_{p}" for p in range(n_parts)], f"{tmp}/merged"
        )
        client.move(f"{tmp}/merged", target)
        client.remove(tmp)

    def write_cdc(self, batch: DataFrame, table: TableID, keys: list[str]) -> None:
        """Static tables are append/snapshot targets: the reference's
        static sink consumes inserts only (``Push:231``) — deletes and
        updates require the dynamic-table sink, out of scope here."""
        ins = batch
        if OP_COL in batch.columns:
            ins = batch.filter(F.col(OP_COL) == "i")
        self.key_cols = keys
        self.write(ins, table)

    def cleanup(self, table: TableID, policy: CleanupPolicy) -> None:
        if policy == CleanupPolicy.DISABLED:
            return
        self.client_factory(self.proxy_url).remove(self.target_path(table))


__all__ = ["YtStaticSink", "YtHttpClient", "yt_schema_attr", "YT_MAX_STRING"]
