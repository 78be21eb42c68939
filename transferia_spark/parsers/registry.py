"""Parser implementations over Kafka-shaped raw-message DataFrames."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_COLS = ("key", "value", "topic", "partition", "offset", "timestamp")

_PARSERS: dict[str, Callable[..., Callable[[DataFrame], DataFrame]]] = {}


def register_parser(name: str):
    def deco(fn):
        _PARSERS[name] = fn
        return fn

    return deco


def build_parser(name: str, **config):
    try:
        return _PARSERS[name](**config)
    except KeyError:
        raise ValueError(f"unknown parser {name!r}; known: {sorted(_PARSERS)}") from None


def _aux_columns(df: DataFrame) -> list[Column]:
    """System columns the reference attaches to every parsed row
    (generic_parser.go:115-166)."""
    cols = []
    if "timestamp" in df.columns:
        cols.append(F.col("timestamp").alias("_timestamp"))
    else:
        cols.append(F.current_timestamp().alias("_timestamp"))
    if "partition" in df.columns:
        cols.append(F.col("partition").alias("_partition"))
    if "offset" in df.columns:
        cols.append(F.col("offset").alias("_offset"))
        cols.append(F.col("offset").alias("_idx"))
    return cols


@register_parser("json")
def json_parser(
    schema: str,
    add_rest: bool = True,
    add_system_cols: bool = True,
    null_keys_allowed: bool = True,
):
    """Generic JSON field extraction with declared schema; unknown
    fields overflow into ``_rest`` (map<string,string>); rows that fail
    to parse carry ``_unparsed_raw``/``_error``."""
    st = T._parse_datatype_string(schema)
    declared = [f.name for f in st.fields]
    # PERMISSIVE mode + corrupt-record column: bad payloads land in
    # _corrupt instead of erroring (Spark leaves data fields null)
    st_c = T.StructType(list(st.fields) + [T.StructField("_corrupt", T.StringType(), True)])

    def parse(df: DataFrame) -> DataFrame:
        raw = F.col("value").cast("string")
        parsed = F.from_json(
            raw, st_c, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
        )
        all_map = F.from_json(raw, T.MapType(T.StringType(), T.StringType()))
        out_cols = [F.col(f"_p.{f.name}").alias(f.name) for f in st.fields]
        extra = []
        if add_rest:
            extra.append(
                F.map_filter(F.col("_m"), lambda k, _: ~k.isin(declared)).alias("_rest")
            )
        if add_system_cols:
            extra.extend(_aux_columns(df))
        extra.append(F.col("_p._corrupt").alias("_unparsed_raw"))
        return (
            df.withColumn("_p", parsed)
            .withColumn("_m", all_map)
            .select(*out_cols, *extra)
        )

    return parse


@register_parser("tskv")
def tskv_parser(schema: str | None = None, add_system_cols: bool = True):
    """tab-separated key=value lines → map, optionally cast to schema."""

    def parse(df: DataFrame) -> DataFrame:
        raw = F.col("value").cast("string")
        # strip the leading "tskv\t" marker if present
        body = F.regexp_replace(raw, r"^tskv\t", "")
        m = F.str_to_map(body, F.lit("\t"), F.lit("="))
        extra = _aux_columns(df) if add_system_cols else []
        if schema:
            st = T._parse_datatype_string(schema)
            cols = [
                F.element_at(m, f.name).cast(f.dataType).alias(f.name) for f in st.fields
            ]
            return df.select(*cols, *extra)
        return df.select(m.alias("fields"), *extra)

    return parse


# Debezium envelope: the industry-standard CDC wire format; the
# reference both parses (pkg/parsers/registry/debezium) and emits
# (pkg/debezium/) it. Value schema: {before, after, source{...}, op, ts_ms}.
def debezium_value_type(row_schema: str) -> T.StructType:
    row_st = T._parse_datatype_string(row_schema)
    return T.StructType(
        [
            T.StructField("before", row_st, True),
            T.StructField("after", row_st, True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("db", T.StringType(), True),
                        T.StructField("schema", T.StringType(), True),
                        T.StructField("table", T.StringType(), True),
                        T.StructField("lsn", T.LongType(), True),
                        T.StructField("txId", T.StringType(), True),
                        T.StructField("ts_ms", T.LongType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


@register_parser("debezium")
def debezium_parser(row_schema: str, add_system_cols: bool = True):
    """Debezium JSON → ChangeItem DataFrame (_op/_lsn/_commit_ts/_before
    + payload columns). 'r' (snapshot read) maps to insert, as the
    reference does."""
    vt = debezium_value_type(row_schema)
    row_st = T._parse_datatype_string(row_schema)

    def parse(df: DataFrame) -> DataFrame:
        v = F.from_json(F.col("value").cast("string"), vt)
        op = (
            F.when(v["op"].isin("c", "r"), F.lit("i"))
            .when(v["op"] == "u", F.lit("u"))
            .when(v["op"] == "d", F.lit("d"))
            .otherwise(v["op"])
        )
        row = F.when(op == "d", v["before"]).otherwise(v["after"])
        payload = [row[f.name].alias(f.name) for f in row_st.fields]
        extra = _aux_columns(df) if add_system_cols else []
        return df.select(
            *payload,
            op.alias("_op"),
            F.coalesce(v["source"]["lsn"], F.col("offset") if "offset" in df.columns else F.lit(None)).alias("_lsn"),
            F.lit(0).alias("_counter"),
            F.timestamp_millis(v["ts_ms"]).alias("_commit_ts"),
            v["source"]["txId"].alias("_tx_id"),
            v["before"].alias("_before"),
            F.concat_ws(".", v["source"]["schema"], v["source"]["table"]).alias("_table"),
            *extra,
        )

    return parse


@register_parser("raw")
def raw_parser(table_column: bool = False):
    """Mirror/raw passthrough (≈ ``changeitem/mirror.go``): keep the
    queue columns untouched for queue→queue transfer."""

    def parse(df: DataFrame) -> DataFrame:
        cols = [c for c in RAW_COLS if c in df.columns]
        out = df.select(*cols)
        if table_column and "topic" in df.columns:
            out = out.withColumn("_table", F.col("topic"))
        return out

    return parse
