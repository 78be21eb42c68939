"""ClickHouse storage: native sharded snapshot reads over HTTP.

≈ transferia/transferia ``pkg/providers/clickhouse/query_builder.go:10``
(``buildSelectQuery``: FINAL over deletable ReplacingMergeTree targets
+ ``__data_transfer_delete_time == 0`` tombstone filter,
``storage.go:806``) and the cluster read model of
``a2_data_provider.go`` / ``sharding/`` — each shard's local table is
read independently and the union is the logical table.

Spark-first shape: (shard × part) pairs become a small parts frame;
``mapInPandas`` fans the SELECTs out so every Spark task streams one
shard slice over the ClickHouse HTTP protocol (JSONEachRow) directly
into Arrow batches — reads are executor→shard, never via the driver,
and a 16-shard cluster loads with ≥16-way parallelism. Within one
shard, parts split by ``cityHash64(pk) % n`` — evaluated inside
ClickHouse, so each slice is an indexed scan server-side.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.clickhouse import ChHttpClient, DELETE_TIME_COL, quote_ch
from transferia_spark.sources.base import Source, register_source


def build_select_query(
    table: TableID,
    columns: list[str],
    deletable: bool = False,
    where: str | None = None,
    part_cond: str | None = None,
) -> str:
    """≈ ``buildSelectQuery`` (query_builder.go:10): FINAL collapses
    ReplacingMergeTree versions server-side; the delete-time filter
    hides tombstones the CDC sink wrote."""
    cols = ", ".join(quote_ch(c) for c in columns)
    name = (
        f"{quote_ch(table.namespace)}.{quote_ch(table.name)}"
        if table.namespace
        else quote_ch(table.name)
    )
    q = f"SELECT {cols} FROM {name}"
    if deletable:
        q += " FINAL"
    q += " WHERE 1=1"
    if where:
        q += f" AND ({where})"
    if part_cond:
        q += f" AND ({part_cond})"
    if deletable:
        q += f" AND {DELETE_TIME_COL} == 0"
    return q


@register_source
class ClickHouseSource(Source):
    """Sharded snapshot reads; one HTTP endpoint per shard.

    ``schemas[table]`` declares the typed contract (DDL string);
    ``keys`` drive the within-shard ``cityHash64`` part split.
    ``parts_per_shard`` bounds fan-out: total tasks = shards × parts.
    """

    TYPE = "clickhouse"

    def __init__(
        self,
        shard_urls: dict[str, str],
        schemas: dict[str, str],
        database: str = "",
        keys: dict[str, list[str]] | None = None,
        deletable: bool = False,
        parts_per_shard: int = 4,
        client_factory: Callable[[str], ChHttpClient] = ChHttpClient,
    ):
        self.shard_urls = dict(shard_urls)
        self.schemas = dict(schemas)
        self.database = database
        self.keys = keys or {}
        self.deletable = deletable
        self.parts_per_shard = max(1, parts_per_shard)
        self.client_factory = client_factory

    def table_list(self, spark: SparkSession) -> list[TableID]:
        return [TableID(self.database, t) for t in sorted(self.schemas)]

    def plan_read_tasks(
        self, table: TableID, where: str | None = None
    ) -> list[tuple[str, str]]:
        """The parallel-unit plan: (shard url, SELECT) per shard×part
        (≈ the reference's shard/part fan-out, storage.go). Factored
        out of :meth:`load_table` so the plan is testable without a
        live cluster — the clickhouse_read_plan driver query compares
        the generated strings against a SQL oracle."""
        st = T._parse_datatype_string(self.schemas[table.name])
        cols = [f.name for f in st.fields]
        keys = self.keys.get(table.name, [])
        n_parts = self.parts_per_shard if keys else 1
        tasks = []
        for url in (self.shard_urls[s] for s in sorted(self.shard_urls)):
            for p in range(n_parts):
                cond = None
                if n_parts > 1:
                    keyexpr = ", ".join(quote_ch(k) for k in keys)
                    cond = f"cityHash64({keyexpr}) % {n_parts} == {p}"
                tasks.append(
                    (url, build_select_query(
                        table, cols, self.deletable, where, cond
                    ))
                )
        return tasks

    def load_table(
        self, spark: SparkSession, table: TableID, where: str | None = None
    ) -> DataFrame:
        st = T._parse_datatype_string(self.schemas[table.name])
        cols = [f.name for f in st.fields]
        tasks = self.plan_read_tasks(table, where)

        parts_df = spark.createDataFrame(tasks, "url string, query string").repartition(
            len(tasks)
        )
        factory = self.client_factory

        def read_parts(batches):
            import pandas as pd

            for pdf in batches:
                for url, query in zip(pdf["url"], pdf["query"]):
                    body = factory(url).execute(query + " FORMAT JSONEachRow")
                    rows = [json.loads(line) for line in body.splitlines() if line]
                    if not rows:
                        continue
                    yield pd.DataFrame({c: [r.get(c) for r in rows] for c in cols})

        return parts_df.mapInPandas(read_parts, st)
