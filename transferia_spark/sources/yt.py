"""YTsaurus static-table source.

≈ transferia/transferia ``pkg/providers/yt``: the reference reads YT
static tables through the native wire protocol with the YT schema
attribute (list of ``{name, type, required, sort_order}`` column
specs) driving the type mapping. No YT cluster exists here (nor a
public Spark connector in this container), so the Spark-first shape
is: the table's exported data (YT's standard parquet/JSONL export, or
an SPYT-written directory) is read with the native file source, and
the YT SCHEMA is the contract — mapped through the same
``yt_to_spark`` matrix the typesystem uses everywhere else, then
``strictify``'d so weakly-typed exports (JSON strings) land in the
exact column types the reference would produce.

Sorted tables declare their sort columns as the PK
(``sort_order: ascending`` ≈ key columns in YT), which downstream CDC
collapse/merge and upsert sinks key on.

Scale: the read is a plain file scan — splits, pushdown, and pruning
come from the parquet source; ``strictify`` is a projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from transferia_spark.schema.colschema import TableID
from transferia_spark.schema.typesystem import strictify, yt_to_spark
from transferia_spark.sources.base import Source, register_source


def yt_schema_to_spark(yt_schema: list[dict]) -> T.StructType:
    """YT schema attribute → StructType. ``required: false`` columns
    are nullable (YT optionals); key columns (``sort_order``) carry
    ``{"pk": true}`` metadata, the convention colschema uses."""
    fields = []
    for col in yt_schema:
        meta = {"pk": True} if col.get("sort_order") else {}
        fields.append(
            T.StructField(
                col["name"],
                yt_to_spark(col["type"]),
                nullable=not col.get("required", False),
                metadata=meta,
            )
        )
    return T.StructType(fields)


def key_columns(yt_schema: list[dict]) -> list[str]:
    return [c["name"] for c in yt_schema if c.get("sort_order")]


@register_source
class YtStaticSource(Source):
    """Read a YT static table from its exported data + schema spec.

    ``tables`` maps table path → {"path": data location,
    "schema": YT schema attribute list, "format": parquet|json}.
    """

    TYPE = "yt"

    def __init__(self, tables: dict[str, dict]):
        self.tables = tables

    def table_list(self, spark: SparkSession) -> list[TableID]:
        return [TableID("", name) for name in self.tables]

    def load_table(
        self, spark: SparkSession, table: TableID, where: str | None = None
    ) -> DataFrame:
        spec = self.tables[table.name]
        target = yt_schema_to_spark(spec["schema"])
        fmt = spec.get("format", "parquet")
        if fmt == "parquet":
            df = spark.read.parquet(spec["path"])
        elif fmt == "json":
            # weakly-typed export: read strings, strictify into the matrix
            df = spark.read.json(spec["path"])
        else:
            raise ValueError(f"unsupported YT export format {fmt!r}")
        out = strictify(df, target)
        return out.filter(where) if where else out


__all__ = ["YtStaticSource", "yt_schema_to_spark", "key_columns"]
