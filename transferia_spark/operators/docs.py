"""Document-shape transformers.

- ``raw_doc_grouper`` ≈ ``registry/raw_doc_grouper/raw_doc_grouper.go:22``:
  restructure each row into {key cols..., etl_updated_at, doc = whole
  row as JSON} — append-only document form.
- ``raw_cdc_doc_grouper`` ≈ ``raw_cdc_doc_grouper.go:20``: same, plus a
  ``deleted_flg`` and the CDC metadata kept as event-log rows.
- ``yt_dict_transformer`` ≈ ``registry/yt_dict/yt_dict.go:14``: coerce
  an ``any`` JSON column into a typed map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.cdc.changeitem import META_COLS, OP_COL, OP_DELETE
from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID


@register
class RawDocGrouper(Transformer):
    TYPE = "raw_doc_grouper"

    def __init__(self, keys: list[str]):
        self.keys = keys

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        payload = [c for c in df.columns if c not in META_COLS]
        out = df.select(
            *self.keys,
            F.current_timestamp().alias("etl_updated_at"),
            F.to_json(F.struct(*[F.col(c) for c in payload])).alias("doc"),
        )
        return [(table, out)]


@register
class RawCdcDocGrouper(Transformer):
    TYPE = "raw_cdc_doc_grouper"

    def __init__(self, keys: list[str]):
        self.keys = keys

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        payload = [c for c in df.columns if c not in META_COLS]
        deleted = (
            (F.col(OP_COL) == OP_DELETE) if OP_COL in df.columns else F.lit(False)
        )
        meta = [F.col(c) for c in df.columns if c in META_COLS and c != OP_COL]
        out = df.select(
            *self.keys,
            F.current_timestamp().alias("etl_updated_at"),
            deleted.alias("deleted_flg"),
            F.to_json(F.struct(*[F.col(c) for c in payload])).alias("doc"),
            *meta,
        )
        return [(table, out)]


@register
class YtDict(Transformer):
    """``any`` JSON column → MapType (or a declared StructType)."""

    TYPE = "yt_dict"

    def __init__(self, columns: list[str], value_type: str = "string"):
        self.columns = columns
        self.value_type = value_type

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        mt = T.MapType(T.StringType(), T._parse_datatype_string(self.value_type))
        out = df
        for c in self.columns:
            out = out.withColumn(c, F.from_json(F.col(c), mt))
        return [(table, out)]
