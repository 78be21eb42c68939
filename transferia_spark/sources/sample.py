"""Synthetic generator source (≈ ``pkg/providers/sample/{iot.go:54,
user_activities.go,streaming_data.go}`` in transferia/transferia):
deterministic generated tables for demos/tests, built on
``spark.range`` so generation is distributed and seed-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transferia_spark.schema.colschema import TableID
from transferia_spark.sources.base import Source, register_source


@register_source
class SampleSource(Source):
    TYPE = "sample"

    TABLES = ("iot", "user_activities")

    def __init__(self, rows: int = 10_000, seed: int = 42, partitions: int | None = None):
        self.rows = rows
        self.seed = seed
        self.partitions = partitions

    def table_list(self, spark: SparkSession) -> list[TableID]:
        return [TableID("sample", t) for t in self.TABLES]

    def load_table(self, spark: SparkSession, table: TableID, where: str | None = None) -> DataFrame:
        base = spark.range(0, self.rows, numPartitions=self.partitions)
        # deterministic pseudo-random via hashing the id with the seed —
        # stable across partitioning, unlike rand()
        h = F.abs(F.xxhash64(F.col("id"), F.lit(self.seed)))
        if table.name == "iot":
            df = base.select(
                F.col("id").alias("device_id"),
                (F.timestamp_seconds(F.lit(1704067200) + F.col("id") % 86400)).alias("ts"),
                ((h % 10000) / 100.0).alias("temperature"),
                ((F.abs(F.xxhash64(F.col("id"), F.lit(self.seed + 1))) % 1000) / 10.0).alias(
                    "humidity"
                ),
                (h % 4).cast("int").alias("zone"),
            )
        elif table.name == "user_activities":
            df = base.select(
                F.col("id").alias("activity_id"),
                (h % 1000).alias("user_id"),
                F.element_at(
                    F.array(*[F.lit(x) for x in ("login", "view", "cart", "buy", "logout")]),
                    (h % 5 + 1).cast("int"),
                ).alias("kind"),
                (F.timestamp_seconds(F.lit(1704067200) + h % 604800)).alias("ts"),
            )
        else:
            raise ValueError(f"sample source: unknown table {table.name!r}")
        return df.filter(where) if where else df
