"""BigQuery sink over the public REST surface (streaming inserts).

≈ transferia/transferia ``pkg/providers/bigquery/sink.go``:
- table names normalize to ``namespace_name`` (``normalizedName:134``);
- activation Drop/Truncate deletes the table (``Push:47-57``);
- tables are auto-created from the batch schema with the YT→BigQuery
  type map of ``typesystem.go`` (int64/uint64 → BIGNUMERIC, smaller
  ints → INTEGER, any → JSON, bytes → BYTES, ...);
- rows stream in ≤1024-row sub-batches (``Push:97-103``) through the
  ``tabledata.insertAll`` API with a deterministic ``insertId`` =
  ``table/LSN/txId`` (``sink_value_saver.go:33`` — BigQuery's
  best-effort dedup on retry, the at-least-once contract);
- only INSERT-kind rows are streamed (``Push:120``): BigQuery is an
  append-only analytics target in the reference; updates/deletes are
  collapsed first and deletes are dropped.

Spark-first: row JSON is planned as one ``to_json`` Column (BYTES →
base64, TIMESTAMP → ISO string — the REST API's JSON encodings), so
executors only wrap prepared strings into insertAll envelopes and POST
per partition (executor→API, never via the driver). Transport is
stdlib urllib behind an injectable client factory; tests drive a
recording HTTP stub (no GCP in this environment).
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.cdc.changeitem import LSN_COL, OP_COL, OP_DELETE, TX_COL
from transferia_spark.cdc.collapse import collapse
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, Sink, register_sink

# public YT-type → BigQuery field-type map (typesystem.go:10-29)
YT_TO_BIGQUERY = {
    "int64": "BIGNUMERIC",
    "int32": "INTEGER",
    "int16": "INTEGER",
    "int8": "INTEGER",
    "uint64": "BIGNUMERIC",
    "uint32": "INTEGER",
    "uint16": "INTEGER",
    "uint8": "INTEGER",
    "float": "FLOAT",
    "double": "FLOAT",
    "string": "BYTES",
    "utf8": "STRING",
    "boolean": "BOOLEAN",
    "any": "JSON",
    "date": "DATE",
    "datetime": "DATETIME",
    "timestamp": "TIMESTAMP",
}

_SPARK_TO_BQ = {
    T.LongType: "BIGNUMERIC",
    T.IntegerType: "INTEGER",
    T.ShortType: "INTEGER",
    T.ByteType: "INTEGER",
    T.FloatType: "FLOAT",
    T.DoubleType: "FLOAT",
    T.BinaryType: "BYTES",
    T.StringType: "STRING",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
}

_SYSTEM_COLS = (OP_COL, LSN_COL, TX_COL, "_counter", "_commit_ts", "_before", "_batch")


def normalized_name(table: TableID) -> str:
    """≈ ``normalizedName``: dataset tables are flat, so the namespace
    folds into the name with an underscore."""
    return f"{table.namespace}_{table.name}" if table.namespace else table.name


def bq_schema(df: DataFrame, table: TableID) -> list[dict]:
    """BigQuery JSON field list from the frame's schema (the sink's
    auto-create path builds the same from ColSchema)."""
    fields = []
    for f in df.schema.fields:
        if f.name in _SYSTEM_COLS:
            continue
        bq_type = _SPARK_TO_BQ.get(type(f.dataType), "JSON")
        fields.append(
            {
                "name": f.name,
                "type": bq_type,
                "mode": "NULLABLE" if f.nullable else "REQUIRED",
                "description": f"{f.name} from {table.namespace}.{table.name}",
            }
        )
    return fields


class BigQueryHttpClient:
    """Minimal BigQuery REST v2 client (stdlib only; auth header is the
    caller's problem — in GCP the metadata-server token, in tests none)."""

    API = "https://bigquery.googleapis.com/bigquery/v2"

    def __init__(self, project: str, dataset: str, base_url: str | None = None,
                 token: str = "", timeout: int = 90):
        self.base = (base_url or self.API).rstrip("/")
        self.project, self.dataset = project, dataset
        self.token, self.timeout = token, timeout

    def request(self, method: str, path: str, body: bytes = b"") -> bytes:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(self.base + path, data=body or None, method=method)
        req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404 and method == "DELETE":
                return b""  # idempotent drop (the reference skips 404 too)
            raise

    def _tables(self) -> str:
        return f"/projects/{self.project}/datasets/{self.dataset}/tables"

    def delete_table(self, name: str) -> None:
        self.request("DELETE", f"{self._tables()}/{name}")

    def create_table(self, name: str, fields: list[dict]) -> None:
        body = json.dumps(
            {"tableReference": {"projectId": self.project,
                                "datasetId": self.dataset, "tableId": name},
             "schema": {"fields": fields}}
        ).encode()
        self.request("POST", self._tables(), body)

    def insert_all(self, name: str, rows: list[dict]) -> None:
        body = json.dumps({"kind": "bigquery#tableDataInsertAllRequest",
                           "rows": rows}).encode()
        self.request("POST", f"{self._tables()}/{name}/insertAll", body)


@register_sink
class BigQuerySink(Sink):
    """Streaming-insert BigQuery writer (append-only semantics)."""

    TYPE = "bigquery"

    def __init__(
        self,
        project: str,
        dataset: str,
        batch_rows: int = 1024,
        client_factory: Callable[[str, str], BigQueryHttpClient] = BigQueryHttpClient,
    ):
        self.project, self.dataset = project, dataset
        self.batch_rows = batch_rows
        self.client_factory = client_factory

    def _client(self) -> BigQueryHttpClient:
        return self.client_factory(self.project, self.dataset)

    def cleanup(self, table: TableID, policy: CleanupPolicy) -> None:
        if policy == CleanupPolicy.DISABLED:
            return
        # both Drop and Truncate delete (Push:47-57 — BigQuery has no
        # cheap public truncate on a streaming target)
        self._client().delete_table(normalized_name(table))

    def ensure_table(self, df: DataFrame, table: TableID) -> None:
        self._client().create_table(normalized_name(table), bq_schema(df, table))

    def _planned(self, df: DataFrame, table: TableID) -> DataFrame:
        """(_json, _insert_id) per row — all typing work in Catalyst."""
        payload = []
        for f in df.schema.fields:
            if f.name in _SYSTEM_COLS:
                continue
            col = F.col(f.name)
            if isinstance(f.dataType, T.BinaryType):
                col = F.base64(col)  # REST JSON encoding for BYTES
            elif isinstance(f.dataType, T.TimestampType):
                col = F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            payload.append(col.alias(f.name))
        if LSN_COL in df.columns:
            # CDC path: table/LSN/txid — the reference's deterministic
            # id (concat_ws skips NULLs: absent tx leaves "table/lsn")
            tx = F.col(TX_COL) if TX_COL in df.columns else F.lit(None)
            insert_id = F.concat_ws(
                "/",
                F.lit(table.name),
                F.col(LSN_COL).cast("string"),
                tx.cast("string"),
            )
        else:
            # snapshot path: rows carry no LSN. The id is a CONTENT hash
            # of the serialized payload (ADVICE r3: ids from
            # monotonically_increasing_id changed across Spark task
            # retries — a retry after a partial insertAll recomputed
            # them under a different intra-partition order, so
            # BigQuery's insertId dedup couldn't suppress the
            # duplicates). Identical source rows get distinct ids via a
            # per-partition occurrence suffix added at push time —
            # occurrence COUNTS per payload per partition are stable
            # under task retry (same split, identical rows are
            # interchangeable), so the id SET is retry-deterministic.
            insert_id = F.concat_ws(
                "/",
                F.lit(table.name),
                F.xxhash64(F.col("_row_json")).cast("string"),
            )
        return df.withColumn(
            "_row_json", F.to_json(F.struct(*payload))
        ).select(
            F.col("_row_json").alias("_json"),
            insert_id.alias("_insert_id"),
        )

    def write(self, df: DataFrame, table: TableID) -> None:
        self.ensure_table(df, table)
        planned = self._planned(df, table)
        name = normalized_name(table)
        factory, project, dataset = self.client_factory, self.project, self.dataset
        batch_rows = self.batch_rows
        # snapshot rows get content-hash ids: disambiguate identical
        # rows with a stable per-partition occurrence suffix. CDC ids
        # (table/lsn/tx) must NOT be suffixed — their collisions are
        # genuine replays that insertId dedup SHOULD suppress.
        suffix_dupes = LSN_COL not in df.columns

        def per_partition(rows):
            from pyspark import TaskContext

            # Fold the Spark partition id into suffixed ids: content-hash
            # ids collide across partitions for genuinely-duplicate source
            # rows, and the per-partition occurrence counter alone would
            # give both the unsuffixed id (insertId dedup would then drop
            # one). partitionId() is stable across task retries, keeping
            # retry-determinism.
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            client = factory(project, dataset)
            buf: list[dict] = []
            seen: dict[str, int] = {}

            def flush():
                if buf:
                    client.insert_all(name, list(buf))
                    buf.clear()

            for row in rows:
                iid = row["_insert_id"]
                if suffix_dupes:
                    n = seen.get(iid, 0)
                    seen[iid] = n + 1
                    iid = f"{iid}/{pid}#{n}"
                buf.append(
                    {"insertId": iid, "json": json.loads(row["_json"])}
                )
                if len(buf) >= batch_rows:
                    flush()
            flush()

        planned.foreachPartition(per_partition)

    def write_cdc(self, batch: DataFrame, table: TableID, keys: list[str]) -> None:
        """Collapse to net effect, then stream only surviving non-delete
        rows (``Push:120`` streams InsertKind only)."""
        net = collapse(batch, keys)
        if OP_COL in net.columns:
            net = net.filter(F.col(OP_COL) != OP_DELETE)
        self.write(net, table)


__all__ = ["BigQuerySink", "BigQueryHttpClient", "bq_schema", "normalized_name",
           "YT_TO_BIGQUERY"]
