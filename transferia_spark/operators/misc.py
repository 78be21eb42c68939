"""Remaining transformers: jsonparser, lambda, batch_splitter,
problem_item_detector, logger.

- ``jsonparser`` ≈ ``registry/jsonparser/parser.go:24`` — apply a queue
  parser to a raw payload column mid-pipeline (``from_json``).
- ``lambda`` ≈ ``registry/lambda/lambda.go:14`` — the reference POSTs
  batches to a remote cloud function; the Spark-native superset is an
  in-process Arrow-batched function over ``mapInPandas``.
- ``batch_splitter`` ≈ ``registry/batch_splitter/batch_splitter.go:9`` —
  obsolete under Spark's own partitioning; kept as a repartition.
- ``problem_item_detector`` ≈ ``registry/problem_item_detector/...go:24``
  — canary: sideline poison rows into a dead-letter frame.
- ``logger`` ≈ ``registry/logger/logger.go:9`` — observe metrics, zero
  data movement.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID


@register
class JsonParser(Transformer):
    """Parse a raw string/bytes column into typed columns using a
    declared schema; unparsable payloads keep the raw text in
    ``_unparsed_raw`` (≈ the <table>_unparsed dead-letter of
    ``generic_parser.go:575``)."""

    TYPE = "jsonparser"

    def __init__(self, column: str, schema: str, keep_raw: bool = False, drop_source: bool = True):
        self.column = column
        self.schema = schema  # DDL string, e.g. "a INT, b STRING"
        self.keep_raw = keep_raw
        self.drop_source = drop_source

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        st = T._parse_datatype_string(self.schema)
        raw = F.col(self.column).cast("string")
        # PERMISSIVE + corrupt-record column: from_json on malformed
        # input yields a struct of NULL fields (not a NULL struct), so
        # the marker column is the only reliable failure signal
        st_c = T.StructType(
            list(st.fields) + [T.StructField("_corrupt", T.StringType(), True)]
        )
        parsed = F.from_json(
            raw, st_c, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
        )
        out = df.withColumn("_parsed", parsed)
        cols = [c for c in df.columns if c != self.column or not self.drop_source]
        fields = [F.col(f"_parsed.{f.name}").alias(f.name) for f in st.fields]
        extra = []
        if self.keep_raw:
            extra.append(F.col("_parsed._corrupt").alias("_unparsed_raw"))
        return [(table, out.select(*cols, *fields, *extra).drop("_parsed"))]


@register
class LambdaTransformer(Transformer):
    """Arbitrary user function over Arrow record batches.

    ``fn`` is ``pd.DataFrame -> pd.DataFrame`` with output schema
    ``schema`` (DDL). This is the in-process, vectorized equivalent of
    the reference's remote cloud-function lambda."""

    TYPE = "lambda"

    def __init__(self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: str):
        self.fn = fn
        self.schema = schema

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        fn = self.fn

        def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield fn(pdf)

        return [(table, df.mapInPandas(_map, self.schema))]


@register
class BatchSplitter(Transformer):
    """Bound the size of the unit a sink pushes at once
    (≈ ``pkg/transformer/registry/batch_splitter`` — the reference
    splits oversized ChangeItem batches before ``Push``).

    In Spark the write-path unit is the partition, and counting rows up
    front would cost an extra action. ``apply`` therefore tags each row
    with a ``_batch`` id derived from its position WITHIN its partition
    (``monotonically_increasing_id``'s low 33 bits are exactly that
    per-partition record index): batch k of partition p is rows
    [k·max, (k+1)·max). Push-style sinks (JDBC upsert, HTTP bulk)
    group on ``_batch`` inside ``foreachPartition`` — no shuffle, no
    action, every push ≤ ``max_rows_per_partition`` rows. File sinks
    get the same bound via ``spark.sql.files.maxRecordsPerFile``.

    Determinism caveat (same as the reference's positional batches): a
    task retry that reads its input in a different order re-batches
    rows differently — batch ids are a flow-control boundary, not a
    stable key, and sinks must stay idempotent per ROW (upsert), which
    the CDC apply contract already requires.
    """

    TYPE = "batch_splitter"

    BATCH_COL = "_batch"

    def __init__(self, max_rows_per_partition: int = 1_000_000):
        self.max_rows = max_rows_per_partition

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        within = F.monotonically_increasing_id().bitwiseAND(
            F.lit((1 << 33) - 1)
        )
        return [
            (
                table,
                df.withColumn(
                    self.BATCH_COL,
                    F.floor(within / F.lit(self.max_rows)).cast("long"),
                ),
            )
        ]

    def split(self, df: DataFrame, total_rows: int) -> DataFrame:
        """Repartition to ceil(total/max) when the caller knows the
        count (e.g. after ExactTableRowsCount) — the coarse-grained
        variant that also balances write parallelism."""
        import math

        n = max(1, math.ceil(total_rows / self.max_rows))
        return df.repartition(n)


@register
class ProblemItemDetector(Transformer):
    """Sideline rows failing a predicate into ``self.dead_letter``;
    healthy rows continue.

    Scale note: ``apply`` derives both routes from one flagged frame,
    but two lazily-evaluated frames still mean two scans if both are
    materialized independently. When the sink is a file write, use
    ``split_write`` — a single pass partitioned by the health flag —
    instead of writing ``apply``'s outputs separately.
    """

    TYPE = "problem_item_detector"

    HEALTHY_COL = "_healthy"

    def __init__(self, healthy_when: str):
        self.healthy_when = healthy_when
        self.dead_letter: DataFrame | None = None

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        flagged = df.withColumn(self.HEALTHY_COL, F.expr(self.healthy_when))
        self.dead_letter = flagged.filter(~F.col(self.HEALTHY_COL)).drop(self.HEALTHY_COL)
        return [(table, flagged.filter(F.col(self.HEALTHY_COL)).drop(self.HEALTHY_COL))]

    def split_write(self, df: DataFrame, path: str, fmt: str = "parquet") -> None:
        """One-pass dead-letter split: partition the write on the health
        flag so healthy rows land under ``_healthy=true/`` and poison
        rows under ``_healthy=false/`` without scanning the input twice.
        This is the 100 TB shape (two filters = two full scans)."""
        flagged = df.withColumn(self.HEALTHY_COL, F.expr(self.healthy_when))
        flagged.write.mode("overwrite").partitionBy(self.HEALTHY_COL).format(fmt).save(path)


@register
class LoggerTransformer(Transformer):
    """Attach ``observe`` metrics (row count) — the Spark-native way to
    count without a second pass; values surface via QueryExecutionListener
    or ``df.observe`` results in streaming."""

    TYPE = "logger"

    def __init__(self, name: str = "logger", metrics: list[Column] | None = None):
        self.name = name
        self.metrics = metrics

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        metrics = self.metrics or [F.count(F.lit(1)).alias("rows")]
        return [(table, df.observe(f"{self.name}:{table.fqtn()}", *metrics))]
