"""Delta Lake source — gated on the delta-spark package.

≈ ``pkg/providers/delta/storage.go`` in transferia/transferia, which
implements its own Go reader of the delta transaction log (actions,
protocol, checkpoints). On Spark the entire provider collapses into
``spark.read.format("delta")`` — the log replay, data skipping, and
time travel come from the delta-spark connector. The container does
not bundle the jar, so availability is validated at load time with the
remedy in the error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from transferia_spark.schema.colschema import TableID
from transferia_spark.sources.base import Source, register_source

DELTA_PACKAGE = "io.delta:delta-spark_2.13"


@register_source
class DeltaSource(Source):
    TYPE = "delta"

    def __init__(self, path: str, version: int | None = None, timestamp: str | None = None):
        self.path = path
        self.version = version
        self.timestamp = timestamp

    def table_list(self, spark: SparkSession) -> list[TableID]:
        return [TableID("", self.path.rstrip("/").split("/")[-1])]

    def load_table(
        self, spark: SparkSession, table: TableID, where: str | None = None
    ) -> DataFrame:
        try:
            reader = spark.read.format("delta")
            if self.version is not None:
                reader = reader.option("versionAsOf", self.version)
            if self.timestamp is not None:
                reader = reader.option("timestampAsOf", self.timestamp)
            df = reader.load(self.path)
        except Exception as e:
            if "delta" in str(e).lower() or "DATA_SOURCE_NOT_FOUND" in str(e):
                raise NotImplementedError(
                    f"delta source needs --packages {DELTA_PACKAGE}"
                ) from e
            raise
        return df.where(where) if where else df
