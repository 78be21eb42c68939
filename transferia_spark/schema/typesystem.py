"""Type system: YT-style logical types ↔ Spark types, strictify, fallbacks.

The reference's type currency is the YTsaurus scalar set
(``pkg/abstract/typesystem/schema.go:48-68`` in transferia/transferia):
int8..int64, uint8..uint64, float, double, string (bytes), utf8,
boolean, date, datetime (seconds), timestamp (µs), interval, and ``any``
(an opaque JSON-serializable container). We map those onto Spark types;
``any`` becomes JSON-in-StringType (the reference's own "everything
weird → any" rule).

``strictify`` (≈ ``changeitem/strictify/strictify.go:18-42``)
canonicalizes weakly-typed values into the declared schema with CAST +
from_json; a failed cast yields NULL unless the column is required, in
which case the caller can assert with ``required_violations``.

Versioned **fallbacks** (≈ ``typesystem/fallback.go:1-57``) downgrade
value representations for transfers pinned to an older typesystem
version, e.g. dates as strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LATEST_TYPESYSTEM_VERSION = 10

# --- YT → Spark ------------------------------------------------------------

_YT_TO_SPARK: dict[str, T.DataType] = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    # Spark has no unsigned ints: next-wider signed; uint64 exact via decimal
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.BinaryType(),  # YT "string" is bytes
    "utf8": T.StringType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),  # seconds precision at source
    "timestamp": T.TimestampType(),  # µs
    "interval": T.DayTimeIntervalType(),
    "any": T.StringType(),  # JSON-serialized container
    # v2 extensions (pkg/abstract2/types): decimal handled parametrically below
    "json": T.StringType(),
    # TIMESTAMP in Spark is session-tz-normalized instants (UTC-stored),
    # which is exactly what timestamp_tz carries
    "timestamp_tz": T.TimestampType(),
    # big_float exceeds IEEE doubles in the v2 model; Spark has no wider
    # float, so it downgrades to double — the same representational
    # fallback the reference's versioned fallbacks apply
    "big_float": T.DoubleType(),
    "composite": T.StringType(),  # JSON container, like "any"
}


def yt_to_spark(yt_type: str) -> T.DataType:
    t = yt_type.strip()
    if t.startswith("decimal(") and t.endswith(")"):
        p, s = t[len("decimal(") : -1].split(",")
        return T.DecimalType(int(p), int(s))
    try:
        return _YT_TO_SPARK[t]
    except KeyError:
        raise ValueError(f"unknown YT type: {yt_type!r}") from None


_SPARK_TO_YT: list[tuple[type, str]] = [
    (T.ByteType, "int8"),
    (T.ShortType, "int16"),
    (T.IntegerType, "int32"),
    (T.LongType, "int64"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.BinaryType, "string"),
    (T.StringType, "utf8"),
    (T.BooleanType, "boolean"),
    (T.DateType, "date"),
    (T.TimestampType, "timestamp"),
    (T.DayTimeIntervalType, "interval"),
]


def spark_to_yt(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        if dt.precision == 20 and dt.scale == 0:
            return "uint64"
        return f"decimal({dt.precision},{dt.scale})"
    for cls, name in _SPARK_TO_YT:
        if isinstance(dt, cls):
            return name
    # containers / structs / maps / arrays → "any" (JSON container), the
    # same rule the reference applies for exotic source types
    return "any"


# --- strictify --------------------------------------------------------------


def strictify(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Cast every column of ``df`` to the declared Spark type.

    Columns present in the schema but absent from ``df`` are added as
    NULL; extra columns are kept (callers project separately). String →
    complex types go through ``from_json``.
    """
    cols: list[Column] = []
    existing = set(df.columns)
    for f in schema.fields:
        if f.name not in existing:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        c = F.col(f.name)
        cur = dict(zip(df.columns, [x.dataType for x in df.schema.fields]))[f.name]
        if cur == f.dataType:
            cols.append(c)
        elif isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)) and isinstance(
            cur, T.StringType
        ):
            cols.append(F.from_json(c, f.dataType).alias(f.name))
        else:
            cols.append(c.cast(f.dataType).alias(f.name))
    extra = [F.col(c) for c in df.columns if c not in {f.name for f in schema.fields}]
    return df.select(*cols, *extra)


def required_violations(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Rows violating NOT NULL after strictify — the reference treats
    these as fatal per-column errors."""
    req = [f.name for f in schema.fields if not f.nullable and f.name in df.columns]
    if not req:
        return df.limit(0)
    cond = None
    for n in req:
        c = F.col(n).isNull()
        cond = c if cond is None else (cond | c)
    return df.filter(cond)


# --- versioned fallbacks ----------------------------------------------------

# Each fallback: (introduced_in_version, applies_fn). A transfer pinned to
# version < introduced_in gets the downgraded representation, mirroring
# pkg/providers/postgres/fallback_*.go.
FallbackFn = Callable[[DataFrame], DataFrame]


def _dates_as_strings(df: DataFrame) -> DataFrame:
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.DateType, T.TimestampType)):
            out = out.withColumn(f.name, F.col(f.name).cast("string"))
    return out


def _binary_as_base64_string(df: DataFrame) -> DataFrame:
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, T.BinaryType):
            out = out.withColumn(f.name, F.base64(F.col(f.name)))
    return out


FALLBACKS: list[tuple[int, FallbackFn]] = [
    (5, _dates_as_strings),  # ≈ fallback_date_as_string.go
    (7, _binary_as_base64_string),  # ≈ fallback_bit_as_bytes.go (string repr)
]


def apply_fallbacks(df: DataFrame, version: int) -> DataFrame:
    """Apply every fallback introduced after ``version`` (old transfers
    keep old representations)."""
    out = df
    for introduced_in, fn in FALLBACKS:
        if version < introduced_in:
            out = fn(out)
    return out


def arrow_to_pandas_column(arr, dt: T.DataType):
    """One Arrow array → a pandas column that round-trips NULLs for the
    given Spark type: nullable extension arrays for ints/floats/bools
    (a plain ``to_pandas()`` turns an int64-with-nulls column into
    float64 + NaN, which neither the Arrow hop back nor a driver-side
    ``createDataFrame`` accepts), plain conversion otherwise. Shared by
    every wire-decode path (mysql_select, clickhouse) so the mask
    semantics can't drift between them (code-review r9)."""
    import pandas as pd

    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        # width rides the numpy dtype of the (already target-cast) array
        return pd.arrays.IntegerArray(
            arr.fill_null(0).to_numpy(zero_copy_only=False),
            arr.is_null().to_numpy(zero_copy_only=False),
        )
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return pd.arrays.FloatingArray(
            arr.fill_null(0.0).to_numpy(zero_copy_only=False),
            arr.is_null().to_numpy(zero_copy_only=False),
        )
    if isinstance(dt, T.BooleanType):
        return pd.arrays.BooleanArray(
            arr.fill_null(False).to_numpy(zero_copy_only=False),
            arr.is_null().to_numpy(zero_copy_only=False),
        )
    return arr.to_pandas()
