"""Value-rewriting transformers.

- ``mask_field`` ≈ ``registry/mask/hmac_hasher.go:19`` — HMAC-SHA256
  with a salt over listed columns.
- ``regex_replace_transformer`` ≈ ``registry/regex_replace/transformer.go:15``
- ``replace_primary_key`` ≈ ``registry/replace_primary_key/...go:15``
- ``mongo_pk_extender`` ≈ ``registry/mongo_pk_extender/...go:16``

Masking runs JVM-side: HMAC-SHA256(salt, value) is expressed as
sha2(concat(key, value)) per the reference's hasher shape — salted,
deterministic, irreversible; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import MD_PRIMARY_KEY, TableID

from pyspark.sql import types as T


@register
class MaskField(Transformer):
    TYPE = "mask_field"

    def __init__(self, columns: list[str], salt: str = ""):
        self.columns = columns
        self.salt = salt

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        out = df
        for c in self.columns:
            out = out.withColumn(
                c, F.sha2(F.concat(F.lit(self.salt), F.col(c).cast("string")), 256)
            )
        return [(table, out)]


@register
class RegexReplace(Transformer):
    TYPE = "regex_replace"

    def __init__(self, columns: list[str], pattern: str, replacement: str):
        self.columns = columns
        self.pattern = pattern
        self.replacement = replacement

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        out = df
        for c in self.columns:
            out = out.withColumn(
                c, F.regexp_replace(F.col(c), self.pattern, self.replacement)
            )
        return [(table, out)]


@register
class ReplacePrimaryKey(Transformer):
    """Redefine the PK column set — a metadata-only change on the
    StructFields; downstream MERGE reads keys from this metadata."""

    TYPE = "replace_primary_key"

    def __init__(self, keys: list[str]):
        self.keys = keys

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        missing = [k for k in self.keys if k not in df.columns]
        if missing:
            raise ValueError(f"replace_primary_key: missing columns {missing}")
        fields = []
        for f in df.schema.fields:
            md = dict(f.metadata or {})
            if f.name in self.keys:
                md[MD_PRIMARY_KEY] = True
            else:
                md.pop(MD_PRIMARY_KEY, None)
            fields.append(T.StructField(f.name, f.dataType, f.nullable, md))
        # metadata change without an RDD round-trip: alias with metadata
        out = df.select(
            *[
                F.col(f.name).alias(f.name, metadata=dict(fields[i].metadata))
                for i, f in enumerate(df.schema.fields)
            ]
        )
        return [(table, out)]


@register
class MongoPkExtender(Transformer):
    """Expand a document ``_id`` struct into top-level PK columns."""

    TYPE = "mongo_pk_extender"

    def __init__(self, id_column: str = "_id"):
        self.id_column = id_column

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        dt = {f.name: f.dataType for f in df.schema.fields}[self.id_column]
        if isinstance(dt, T.StructType):
            others = [c for c in df.columns if c != self.id_column]
            out = df.select(F.col(f"{self.id_column}.*"), *others)
        else:
            out = df
        return [(table, out)]
