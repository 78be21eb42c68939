"""Delta Lake source: connector fast path + pure-Python log replay.

≈ ``pkg/providers/delta/storage.go`` in transferia/transferia, which
implements its own Go reader of the delta transaction log (actions,
protocol, checkpoints) rather than requiring a connector. This source
mirrors that: when the delta-spark jar is on the classpath,
``spark.read.format("delta")`` provides log replay / data skipping /
time travel; without it, ``sources/delta_log.py`` replays the public
log protocol in Python and the resolved file set feeds the ordinary
parquet reader (``basePath`` recovers hive partition directories, the
declared metaData schema rides in, and Catalyst pushdown/pruning apply
as with any parquet scan). Unsupported reader features (column
mapping, deletion vectors) raise rather than read wrong.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

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

    def _load_via_connector(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("delta")
        if self.version is not None:
            reader = reader.option("versionAsOf", self.version)
        if self.timestamp is not None:
            reader = reader.option("timestampAsOf", self.timestamp)
        return reader.load(self.path)

    def _load_via_log_replay(self, spark: SparkSession) -> DataFrame:
        from transferia_spark.sources.delta_log import read_snapshot

        if self.timestamp is not None:
            raise NotImplementedError(
                "timestampAsOf needs commit timestamps from the connector "
                f"(--packages {DELTA_PACKAGE}); pin a version instead"
            )
        snap = read_snapshot(self.path, self.version)
        schema = T.StructType.fromJson(snap.schema_json)
        if not snap.paths:
            return spark.createDataFrame([], schema)
        files = [os.path.join(self.path, p) for p in snap.paths]
        reader = spark.read.option("basePath", self.path)
        # data files store only non-partition columns; partition values
        # come back from the hive directory names under basePath
        data_schema = T.StructType(
            [f for f in schema.fields if f.name not in snap.partition_columns]
        )
        df = reader.schema(data_schema if snap.partition_columns else schema).parquet(
            *files
        )
        # normalize partition column dtypes to the declared schema
        # (directory-name discovery infers strings/ints)
        from pyspark.sql import functions as F

        for pc in snap.partition_columns:
            df = df.withColumn(pc, F.col(pc).cast(schema[pc].dataType))
        return df.select(*[f.name for f in schema.fields])

    def load_table(
        self, spark: SparkSession, table: TableID, where: str | None = None
    ) -> DataFrame:
        try:
            df = self._load_via_connector(spark)
        except Exception as e:
            # Fall back to pure-Python log replay ONLY when the connector
            # itself is absent — real table errors (corrupt log, permission
            # denied) must surface, not get rerouted to the feature-limited
            # replayer (ADVICE r4: matching 'delta' in the message also hit
            # table *paths*, masking genuine failures).
            msg = str(e)
            connector_absent = (
                "DATA_SOURCE_NOT_FOUND" in msg
                or "Failed to find data source" in msg
                or "Failed to find the data source" in msg
                or isinstance(e, ModuleNotFoundError)
            )
            if connector_absent:
                df = self._load_via_log_replay(spark)
            else:
                raise
        return df.where(where) if where else df
