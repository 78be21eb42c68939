"""Airbyte protocol source: AirbyteMessage JSONL → DataFrames.

≈ transferia/transferia ``pkg/providers/airbyte``: the reference runs a
connector container and consumes its stdout — a stream of AirbyteMessage
JSON lines (``messages.go``: type RECORD|STATE|LOG|CATALOG, record =
{stream, namespace, data, emitted_at}); records become ChangeItems with
a synthetic ``__dt_record_index`` primary key (``record_batch.go:13-25``)
because Airbyte streams need not declare one.

Spark-first shape: the connector's captured output (a file drop on
S3/local — the standard handoff when the connector doesn't run inside
the cluster) is read with the native text source; message filtering and
payload decoding are pure Column expressions (``from_json`` against the
schema derived from the stream's JSON Schema), so a 100 TB backfill is
one file scan with no Python in the row path. STATE checkpoints (tiny,
one per stream) are the only thing collected to the driver.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.sources.base import Source, register_source

RECORD_INDEX_COL = "__dt_record_index"  # record_batch.go:13 (synthetic PK)


def json_schema_to_spark(js: dict) -> T.DataType:
    """Airbyte stream ``json_schema`` → Spark type. Covers the JSON
    Schema subset the Airbyte protocol uses: type (+ nullable unions
    like ["null","string"]), airbyte_type/format refinements, object
    properties, array items."""
    t = js.get("type", "string")
    if isinstance(t, list):  # ["null", "X"] nullable unions
        non_null = [x for x in t if x != "null"]
        t = non_null[0] if non_null else "string"
    if t == "object":
        props = js.get("properties", {})
        return T.StructType(
            [T.StructField(k, json_schema_to_spark(v)) for k, v in props.items()]
        )
    if t == "array":
        return T.ArrayType(json_schema_to_spark(js.get("items", {"type": "string"})))
    if t == "integer":
        return T.LongType()
    if t == "number":
        if js.get("airbyte_type") == "integer":
            return T.LongType()
        return T.DoubleType()
    if t == "boolean":
        return T.BooleanType()
    # strings and refinements
    fmt = js.get("format", "")
    if fmt == "date-time":
        return T.TimestampType()
    if fmt == "date":
        return T.DateType()
    return T.StringType()


class AirbyteStreamSpec:
    """One configured stream of the catalog (``messages.go`` Stream)."""

    def __init__(self, stream: dict):
        self.name = stream["name"]
        self.namespace = stream.get("namespace", "")
        self.json_schema = stream.get("json_schema", {})
        self.primary_key = [
            p[0] for p in stream.get("source_defined_primary_key", []) if p
        ]
        self.cursor_field = stream.get("default_cursor_field", [])

    @property
    def spark_schema(self) -> T.StructType:
        st = json_schema_to_spark(self.json_schema)
        assert isinstance(st, T.StructType), "stream schema must be an object"
        return st


@register_source
class AirbyteSource(Source):
    """Reads a captured AirbyteMessage JSONL drop.

    ``path`` may be a local dir, S3 prefix, or glob of the connector's
    stdout capture. The catalog (AirbyteCatalog JSON: {"streams":
    [...]}) provides per-stream schemas.
    """

    TYPE = "airbyte"

    def __init__(self, path: str, catalog: dict | str):
        self.path = path
        if isinstance(catalog, str):
            with open(catalog) as f:
                catalog = json.load(f)
        self.streams = {s["name"]: AirbyteStreamSpec(s) for s in catalog["streams"]}

    def table_list(self, spark: SparkSession):
        from transferia_spark.schema.colschema import TableID

        return [TableID(s.namespace, s.name) for s in self.streams.values()]

    def _messages(self, spark: SparkSession) -> DataFrame:
        return spark.read.text(self.path).select(
            F.get_json_object("value", "$.type").alias("_type"),
            F.col("value"),
        )

    def records(self, spark: SparkSession, stream: str) -> DataFrame:
        return decode_records(self._messages(spark), self.streams[stream], stream)

    def load_table(self, spark: SparkSession, table, where: str | None = None):
        df = self.records(spark, table.name)
        return df.filter(where) if where else df

    def state(self, spark: SparkSession) -> dict:
        """Latest STATE blob per stream (incremental-resume cursor,
        ``messages.go`` AirbyteStateMessage). STATE messages are rare
        and tiny — the collect is bounded by stream count."""
        rows = (
            self._messages(spark)
            .filter(F.col("_type") == "STATE")
            .select(
                F.coalesce(
                    F.get_json_object("value", "$.state.stream.stream_descriptor.name"),
                    F.lit(""),
                ).alias("stream"),
                F.get_json_object("value", "$.state.data").alias("data"),
                F.monotonically_increasing_id().alias("_ord"),
            )
            .collect()
        )
        latest: dict[str, dict] = {}
        for r in sorted(rows, key=lambda r: r._ord):
            latest[r.stream] = json.loads(r.data) if r.data else {}
        return latest


def decode_records(
    messages: DataFrame, spec: AirbyteStreamSpec, stream: str
) -> DataFrame:
    """RECORD messages of one stream, decoded to typed columns. The
    input is any DataFrame with a ``value`` string column of
    AirbyteMessage lines (a file capture, a Kafka topic, a test frame).

    ``__dt_record_index`` reproduces the reference's synthetic PK
    (the record's position in the stream, ``record_batch.go:13``): for
    a batch capture the position is the (emitted_at, payload-hash)
    rank — deterministic for a fixed capture, which is what snapshot
    retries replay. The rank is a single global window: acceptable
    because it exists to mint a PK for PK-less streams; streams with a
    real ``source_defined_primary_key`` should key on that instead and
    skip the index.
    """
    # parse each line TWICE, not five times: get_json_object re-parses
    # the whole string per call (type + stream + data + emitted_at +
    # data-for-hash were five parses per row, profiled r14). One
    # from_json of the envelope covers the filter fields and
    # emitted_at; the raw ``$.record.data`` substring (whose EXACT text
    # feeds the deterministic hash — it must stay get_json_object) is
    # projected once and referenced twice, so CollapseProject keeps it
    # materialized instead of inlining a parse per consumer.
    # emitted_at rides as STRING then casts, reproducing the previous
    # get_json_object(...).cast("long") for every scalar shape
    # (a non-integer like 123.5 must stay NULL on both paths)
    env = F.from_json(
        "value",
        "type string, record struct<stream: string, emitted_at: string>",
    ).alias("_env")
    msgs = messages.select("value", env).filter(
        (F.col("_env.type") == "RECORD")
        & (F.col("_env.record.stream") == stream)
    )
    raw = msgs.select(
        F.col("_env.record.emitted_at").cast("long").alias("_emitted_at"),
        F.get_json_object("value", "$.record.data").alias("_raw"),
    )
    decoded = raw.select(
        F.from_json("_raw", spec.spark_schema).alias("_data"),
        F.col("_emitted_at"),
        F.xxhash64(F.col("_raw")).alias("_h"),
    )
    idx = F.row_number().over(Window.orderBy("_emitted_at", "_h")) - 1
    return decoded.select(
        idx.cast("long").alias(RECORD_INDEX_COL),
        F.col("_emitted_at").alias("_airbyte_emitted_at"),
        "_data.*",
    )


__all__ = [
    "AirbyteSource",
    "AirbyteStreamSpec",
    "decode_records",
    "json_schema_to_spark",
    "RECORD_INDEX_COL",
]
