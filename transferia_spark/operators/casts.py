"""Type-conversion transformers.

- ``convert_to_string`` ≈ ``registry/to_string/to_string.go:17``
- ``convert_to_datetime`` ≈ ``registry/to_datetime/to_datetime.go:16``
- ``number_to_float_transformer`` ≈ ``registry/number_to_float/...go:17``

All are pure ``cast`` chains — JVM-side, fully inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID


@register
class ConvertToString(Transformer):
    TYPE = "convert_to_string"

    def __init__(self, columns: list[str] | None = None):
        self.columns = columns  # None = all columns

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        targets = self.columns if self.columns is not None else df.columns
        out = df
        for f in df.schema.fields:
            if f.name not in targets:
                continue
            # match the reference's SerializeToString rules: binary →
            # base64, containers → JSON text, scalars → plain cast
            if isinstance(f.dataType, T.BinaryType):
                out = out.withColumn(f.name, F.base64(F.col(f.name)))
            elif isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
                out = out.withColumn(f.name, F.to_json(F.col(f.name)))
            else:
                out = out.withColumn(f.name, F.col(f.name).cast("string"))
        return [(table, out)]


@register
class ConvertToDatetime(Transformer):
    """Numeric epoch (s/ms/µs by magnitude or explicit unit) or string →
    timestamp."""

    TYPE = "convert_to_datetime"

    def __init__(self, columns: list[str], unit: str = "auto", fmt: str | None = None):
        self.columns = columns
        self.unit = unit
        self.fmt = fmt

    def _convert(self, c, dt: T.DataType):
        col = F.col(c)
        if isinstance(dt, T.StringType):
            return F.to_timestamp(col, self.fmt) if self.fmt else F.to_timestamp(col)
        if isinstance(dt, (T.TimestampType,)):
            return col
        unit = self.unit
        if unit == "auto":
            # heuristic by magnitude: >1e14 µs, >1e11 ms, else seconds
            return F.when(
                F.abs(col) > F.lit(10**14), F.timestamp_micros(col.cast("long"))
            ).when(
                F.abs(col) > F.lit(10**11), F.timestamp_millis(col.cast("long"))
            ).otherwise(F.to_timestamp(col.cast("double")))
        if unit == "s":
            return F.to_timestamp(col.cast("double"))
        if unit == "ms":
            return F.timestamp_millis(col.cast("long"))
        if unit == "us":
            return F.timestamp_micros(col.cast("long"))
        raise ValueError(f"convert_to_datetime: unknown unit {unit!r}")

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        types = {f.name: f.dataType for f in df.schema.fields}
        out = df
        for c in self.columns:
            out = out.withColumn(c, self._convert(c, types[c]))
        return [(table, out)]


@register
class NumberToFloat(Transformer):
    """Every numeric column (or the listed ones) → double, schema and
    values (heterogeneous-target compatibility)."""

    TYPE = "number_to_float"

    NUMERIC = (
        T.ByteType,
        T.ShortType,
        T.IntegerType,
        T.LongType,
        T.FloatType,
        T.DecimalType,
    )

    def __init__(self, columns: list[str] | None = None):
        self.columns = columns

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        out = df
        for f in df.schema.fields:
            if self.columns is not None and f.name not in self.columns:
                continue
            if isinstance(f.dataType, self.NUMERIC):
                out = out.withColumn(f.name, F.col(f.name).cast("double"))
        return [(table, out)]
