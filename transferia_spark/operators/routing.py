"""Table-routing transformers.

- ``rename_tables`` ≈ ``registry/rename/rename.go:12,46-61``
- ``table_splitter_transformer`` ≈ ``registry/table_splitter/table_splitter.go:18``
- ``sharder_transformer`` ≈ ``registry/sharder/sharder.go:19``

Routing in Spark is either (a) a target-name remap (free), or (b) a
``partitionBy`` on write — the splitter exposes both: a ``_route``
column computed JVM-side for partitioned writes (the scale path — one
pass, no per-table job), and an explicit fan-out for sinks that need
separate tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID

ROUTE_COL = "_route"
PART_COL = "_part_id"


@register
class RenameTables(Transformer):
    """Remap TableID → TableID; rows untouched."""

    TYPE = "rename_tables"

    def __init__(self, mapping: dict[str, str]):
        # keys/values in "namespace.name" (or bare "name") form
        self.mapping = {TableID.parse(k): TableID.parse(v) for k, v in mapping.items()}

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        return [(self.mapping.get(table, table), df)]


@register
class TableSplitter(Transformer):
    """Route each row to table ``orig/v1/v2`` built from column values
    (name-generation rule of ``table_splitter.go:37-59``).

    ``apply`` attaches a ``_route`` column (scale path: one partitioned
    write). ``fan_out`` materializes per-table DataFrames when a sink
    genuinely needs distinct tables — it triggers one distinct() to
    discover routes, so use only for low-cardinality splits.
    """

    TYPE = "table_splitter"

    def __init__(self, columns: list[str], separator: str = "/"):
        self.columns = columns
        self.separator = separator

    def _route(self, table: TableID):
        parts = [F.lit(table.name)]
        for c in self.columns:
            parts.append(F.coalesce(F.col(c).cast("string"), F.lit("null")))
        return F.concat_ws(self.separator, *parts)

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        return [(table, df.withColumn(ROUTE_COL, self._route(table)))]

    #: fan_out refuses above this many routes unless raised explicitly —
    #: the route discovery is a driver collect and each route costs one
    #: filtered re-scan of the input (r4 verdict scale guard)
    MAX_ROUTES = 1000

    def fan_out(
        self, table: TableID, df: DataFrame, max_routes: int | None = None
    ) -> Routed:
        cap = self.MAX_ROUTES if max_routes is None else max_routes
        routed = df.withColumn(ROUTE_COL, self._route(table))
        # limit bounds the driver collect even when the user split on a
        # high-cardinality column by mistake — fail fast, not OOM
        names = [
            r[0]
            for r in routed.select(ROUTE_COL).distinct().limit(cap + 1).collect()
        ]
        if len(names) > cap:
            raise ValueError(
                f"table_splitter.fan_out on {self.columns} exceeds "
                f"{cap} routes; this path materializes one DataFrame per "
                "route (driver-side route collect + one filtered scan "
                "each) and is meant for low-cardinality splits. For file "
                "sinks use write_fan_out() — one scan, partitioned write "
                "— or pass max_routes explicitly."
            )
        return [
            (
                TableID(table.namespace, name),
                routed.filter(F.col(ROUTE_COL) == name).drop(ROUTE_COL),
            )
            for name in sorted(names)
        ]

    def write_fan_out(
        self,
        table: TableID,
        df: DataFrame,
        root: str,
        format: str = "parquet",
        mode: str = "overwrite",
    ) -> str:
        """Scale path for file sinks: ONE scan, hive-partitioned write
        on the split columns — each leaf directory is a route's table
        (the same name material as ``table_splitter.go:37-59``, encoded
        as directories instead of table-name suffixes). No per-route
        job, no driver route collect; works at any route cardinality."""
        import os

        out = os.path.join(root, table.name)
        (
            df.write.mode(mode)
            .partitionBy(*self.columns)
            .format(format)
            .save(out)
        )
        return out


@register
class Sharder(Transformer):
    """Assign a deterministic shard id = hash(cols) % N (or a round-robin
    when no columns given) — ≈ ``sharder.go:19`` setting PartID. The
    shard id doubles as the downstream ``repartition`` key, which is the
    actual scale mechanism (co-located writes per shard)."""

    TYPE = "sharder_transformer"

    def __init__(self, columns: list[str] | None, shards: int):
        self.columns = columns
        self.shards = shards

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        if self.columns:
            cols = [F.col(c) for c in self.columns]
        else:
            # no declared shard key: hash the full row content. Unlike
            # monotonically_increasing_id() this is stable across task
            # retries/recomputation (depends only on row values), so a
            # retried partition re-shards identically mid-write.
            cols = [F.col(c) for c in df.columns]
        shard = F.pmod(F.xxhash64(*cols), F.lit(self.shards))
        return [(table, df.withColumn(PART_COL, shard.cast("int")))]

    def repartitioned(self, df: DataFrame) -> DataFrame:
        out = self.apply(TableID("", "t"), df)[0][1]
        return out.repartition(self.shards, PART_COL)
