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

#: stats-derived partition sizing for the record-index rank (same
#: trade as ``ensure_parallelism``, operators/dedup.py): one rank
#: partition per this many estimated bytes, capped at the cluster's
#: default parallelism
_INDEX_CHUNK_BYTES = 4 << 20


def _index_partitions(df: DataFrame) -> int:
    """Scale-adaptive partition count for the global-rank computation:
    ``min(defaultParallelism, ceil(plan-size / 4 MB))``, never below 1;
    unknown statistics (0 / Long.MaxValue sentinel) keep the full
    fan-out — under-partitioning a 100 TB rank is the costlier
    mistake."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — stats are advisory
        size = 0
    if 0 < size < (1 << 60):
        target = min(target, -(-size // _INDEX_CHUNK_BYTES))
    return max(1, target)


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
    retries replay.

    The rank used to be ONE global window unconditionally (every
    decoded record of the stream through a single task — the 100 TB
    failure mode; r14 optimization round). Inputs whose stats say one
    rank partition suffices keep that plain window (a single partition
    IS the global window, and the lazy form lets the optimizer elide
    the whole rank when the index column goes unused); anything larger
    computes the rank scalably and EXACTLY: range-partition by the
    sort key, then global rank = per-partition row offset + cumulative
    count of the partitions before it. Range
    partitioning guarantees every row in partition p sorts at-or-before
    every row in partition p+1 (equal keys land in one partition), so
    concatenating partitions in id order IS the global sort and the
    decomposition is an identity, not an approximation — ties are
    arbitrary within a partition exactly as they were within the single
    global window (both orders are nondeterministic under duplicate
    (emitted_at, hash) pairs; a fixed capture with the xxhash64
    tiebreak never has them in practice). Determinism hinges on the
    second ``localCheckpoint``: the range exchange SAMPLES its child to
    place boundaries with a per-RDD-id seed, so two plan branches each
    running their own exchange would disagree on partition membership
    (measured: ~all ranks off by a little) — freezing the partitioned
    batch once gives the offsets branch and the rank branch the same
    partitions by construction. The first checkpoint keeps the
    sampling pass from re-running the whole decode (the §6
    pre-exchange-persist trade from the CDC delta append). The local
    offset rides ``monotonically_increasing_id`` (documented layout:
    partition id · 2^33 + row offset in partition-iteration order,
    taken AFTER ``sortWithinPartitions``), so the payload crosses the
    network exactly once — no second full-data exchange for a
    partitioned window. A ``raise_error`` guard inside the offset
    expression fails loudly if any rank partition reaches 2^33 rows
    (where the id layout would silently overflow into partition
    bits).
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
    n = _index_partitions(decoded)
    if n == 1:
        # tiny input: a single rank partition IS the global window, so
        # keep the plain (fully lazy, count-prunable) form — the
        # offset machinery below would add exchange/checkpoint nodes
        # the optimizer cannot elide when the index column goes unused
        idx = F.row_number().over(Window.orderBy("_emitted_at", "_h")) - 1
        return decoded.select(
            idx.cast("long").alias(RECORD_INDEX_COL),
            F.col("_emitted_at").alias("_airbyte_emitted_at"),
            "_data.*",
        )
    local = F.monotonically_increasing_id().bitwiseAND(
        F.lit((1 << 33) - 1)
    )
    d = (
        decoded.localCheckpoint(eager=False)
        .repartitionByRange(n, "_emitted_at", "_h")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    offs = (
        d.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_off",
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select(
            "_pid",
            # the guard lives INSIDE the consumed expression — a
            # standalone assert column would be pruned as unused
            F.when(
                F.col("_n") < F.lit(1 << 33),
                F.coalesce("_off", F.lit(0)),
            )
            .otherwise(
                F.raise_error(
                    F.lit(
                        "airbyte record-index rank partition exceeds "
                        "the 2^33-row id layout"
                    )
                )
            )
            .alias("_off"),
        )
    )
    return (
        d.sortWithinPartitions("_emitted_at", "_h")
        .withColumn("_local", local)
        .join(F.broadcast(offs), "_pid")
        .select(
            (F.col("_off") + F.col("_local"))
            .cast("long")
            .alias(RECORD_INDEX_COL),
            F.col("_emitted_at").alias("_airbyte_emitted_at"),
            "_data.*",
        )
    )


__all__ = [
    "AirbyteSource",
    "AirbyteStreamSpec",
    "decode_records",
    "json_schema_to_spark",
    "RECORD_INDEX_COL",
]
