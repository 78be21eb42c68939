"""Serializers: rows → bytes (SURVEY §2.7, queue-sink surface).

≈ ``pkg/abstract/model/serialization.go:11-18`` formats
(JSON | Debezium | Mirror | Native | RawColumn) implemented in
``pkg/serializer/queue/*.go`` in transferia/transferia. Spark-side all
are single JVM expressions producing a ``value`` (and optional ``key``)
column ready for a Kafka/file writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import (
    BEFORE_COL,
    COMMIT_TS_COL,
    LSN_COL,
    META_COLS,
    OP_COL,
    TX_COL,
)


def json_serializer(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Row → JSON value; optional key = JSON of the PK columns."""
    payload = [c for c in df.columns if c not in META_COLS]
    out = [F.to_json(F.struct(*[F.col(c) for c in payload])).alias("value")]
    if key_cols:
        out.insert(0, F.to_json(F.struct(*[F.col(c) for c in key_cols])).alias("key"))
    return df.select(*out)


def debezium_serializer(
    df: DataFrame,
    source_db: str = "",
    source_table: str = "",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """ChangeItem DataFrame → Debezium envelope JSON
    (≈ ``pkg/debezium/emitter_common.go``)."""
    payload = [c for c in df.columns if c not in META_COLS]
    row = F.struct(*[F.col(c) for c in payload])
    op = F.col(OP_COL) if OP_COL in df.columns else F.lit("r")
    before = (
        F.col(BEFORE_COL)
        if BEFORE_COL in df.columns
        else F.when(op == "d", row).otherwise(F.lit(None))
    )
    after = F.when(op != "d", row).otherwise(F.lit(None))
    source = F.struct(
        F.lit(source_db).alias("db"),
        F.lit(source_table).alias("table"),
        (F.col(LSN_COL) if LSN_COL in df.columns else F.lit(None).cast("long")).alias("lsn"),
        (F.col(TX_COL) if TX_COL in df.columns else F.lit(None).cast("string")).alias("txId"),
    )
    ts_ms = (
        (F.unix_millis(F.col(COMMIT_TS_COL)))
        if COMMIT_TS_COL in df.columns
        else F.unix_millis(F.current_timestamp())
    )
    envelope = F.to_json(
        F.struct(
            before.alias("before"),
            after.alias("after"),
            source.alias("source"),
            F.when(op == "i", "c").otherwise(op).alias("op"),
            ts_ms.alias("ts_ms"),
        )
    )
    out = [envelope.alias("value")]
    if key_cols:
        out.insert(0, F.to_json(F.struct(*[F.col(c) for c in key_cols])).alias("key"))
    return df.select(*out)


def mirror_serializer(df: DataFrame) -> DataFrame:
    """Raw passthrough (queue→queue): key/value preserved byte-for-byte."""
    cols = [c for c in ("key", "value") if c in df.columns]
    return df.select(*cols)


def raw_column_serializer(df: DataFrame, column: str) -> DataFrame:
    """Emit one column's value as the message payload."""
    return df.select(F.col(column).cast("binary").alias("value"))


def native_serializer(df: DataFrame, table: str = "") -> DataFrame:
    """ChangeItem DataFrame → the engine's native wire form: one JSON
    object per event carrying kind/lsn/counter/commit_ts/table plus the
    full row under ``columns`` and the pre-image under ``old_keys``
    (≈ ``pkg/serializer/queue/native_serializer.go``). Round-trips
    through the ``native`` parser."""
    payload = [c for c in df.columns if c not in META_COLS]
    row = F.struct(*[F.col(c) for c in payload])
    op = F.col(OP_COL) if OP_COL in df.columns else F.lit("i")
    lsn = F.col(LSN_COL) if LSN_COL in df.columns else F.lit(0).cast("long")
    counter = (
        F.col("_counter") if "_counter" in df.columns else F.lit(0).cast("int")
    )
    commit_ts = (
        F.col(COMMIT_TS_COL).cast("string")
        if COMMIT_TS_COL in df.columns
        else F.current_timestamp().cast("string")
    )
    before = F.col(BEFORE_COL) if BEFORE_COL in df.columns else F.lit(None)
    return df.select(
        F.to_json(
            F.struct(
                op.alias("kind"),
                lsn.alias("lsn"),
                counter.alias("counter"),
                commit_ts.alias("commit_ts"),
                F.lit(table).alias("table"),
                row.alias("columns"),
                before.alias("old_keys"),
            )
        ).alias("value")
    )


def avro_serializer(
    df: DataFrame,
    schema_json: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Rows → Avro binary ``value`` under the given writer schema —
    the produce twin of the registry parser's decode (pure-Python
    codec from parsers/schema_registry.py, Arrow-batched mapInPandas;
    ≈ the Avro subjects of ``pkg/serializer/queue``). Optional ``key``
    = JSON of the PK columns (framing parity with json_serializer)."""
    import json as _json

    payload = [c for c in df.columns if c not in META_COLS]
    with_key = bool(key_cols)
    out_ddl = ("key binary, " if with_key else "") + "value binary"

    # Spark's Arrow conversion hands mapInPandas NAIVE timestamps
    # localized to the SESSION timezone — epoch math must re-anchor
    # them or every encoded instant shifts by the tz offset
    # (code-review r11 pass 3)
    session_tz = df.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    )

    def run(batches):
        import pandas as pd

        from transferia_spark.parsers.schema_registry import AvroCodec

        codec = AvroCodec(schema_json)
        # per-field (accepted primitives, logical types) from the
        # PARSED writer schema — coercions are schema-driven
        accepts: dict[str, set] = {}
        logicals: dict[str, set] = {}
        if codec.schema.get("type") == "record":
            for name, fs in codec.schema["fields"]:
                branches = (
                    fs["branches"] if fs["type"] == "union" else [fs]
                )
                accepts[name] = {b["type"] for b in branches}
                logicals[name] = {
                    b.get("logicalType") for b in branches
                    if b.get("logicalType")
                }

        def py(v, col=None):
            # numpy scalars / pandas NA → Python natives (the codec
            # type-dispatches on exact native types)
            if v is None or v is pd.NaT or v is pd.NA:
                return None
            if isinstance(v, float) and v != v:
                return None
            ts = accepts.get(col)
            if isinstance(v, pd.Timestamp):
                if v.tzinfo is None:
                    v = v.tz_localize(session_tz)
                v = v.tz_convert("UTC")
                if ts is None or not ts:
                    # column absent from the writer record (the codec
                    # drops it) or a JSON key column — ISO string
                    return v.isoformat()
                if ts & {"long", "int"}:
                    lts = logicals.get(col) or set()
                    if "timestamp-micros" in lts:
                        return int(v.value // 1_000)
                    if "timestamp-millis" in lts:
                        return int(v.value // 1_000_000)
                    raise ValueError(
                        f"column {col!r} is a timestamp feeding a "
                        "long field with no logicalType — declare "
                        "timestamp-millis or timestamp-micros (a "
                        "silent unit guess corrupts instants)"
                    )
                if "string" in ts:
                    return v.isoformat()
                raise ValueError(
                    f"column {col!r} is a timestamp but the writer "
                    f"schema accepts {sorted(ts)} — use long "
                    "(timestamp-millis/micros) or string"
                )
            v = v.item() if hasattr(v, "item") else v
            if (
                ts
                and isinstance(v, float)
                and v.is_integer()
                and ts & {"long", "int"}
                and not ts & {"double", "float"}
            ):
                # a nullable int/long column reaches pandas as float64
                # (Arrow NULL coercion) — restore the integer the
                # schema demands (code-review r11 pass 2)
                return int(v)
            return v

        for pdf in batches:
            recs = pdf[payload].to_dict("records")
            vals = [
                codec.encode({k: py(v, k) for k, v in r.items()})
                for r in recs
            ]
            out = {}
            if with_key:
                # no default=str: a binary key would silently become
                # its Python repr and break key compaction/affinity —
                # loud TypeError beats a non-interoperable key
                # (code-review r11 pass 3)
                out["key"] = [
                    _json.dumps(
                        {k: py(r[k], k) for k in key_cols}
                    ).encode()
                    for r in recs
                ]
            out["value"] = vals
            yield pd.DataFrame(out)

    return df.mapInPandas(run, out_ddl)


def confluent_sr_serializer(
    df: DataFrame,
    schema_id: int | None = None,
    body=json_serializer,
    registry_url: str | None = None,
    subject: str | None = None,
    schema_json: str | None = None,
    schema_type: str = "JSON",
    registry_auth: tuple[str, str] | None = None,
    registry_tls_ca: str | None = None,
    registry_tls_insecure: bool = False,
    **body_kw,
) -> DataFrame:
    """Confluent wire framing on the SINK side, mirroring the
    ``confluent_schema_registry`` parser (parsers/registry.py):
    ``value`` = 1 magic byte (0x0) + 4-byte big-endian schema id + the
    body bytes from an inner serializer (JSON by default; AVRO via
    :func:`avro_serializer`). ≈ ``pkg/serializer/queue`` SR framing +
    ``pkg/schemaregistry/confluent``: with ``registry_url`` + ``subject``
    + ``schema_json`` the schema REGISTERS live (one driver-side HTTP
    call, idempotent server-side) and the returned id frames every row;
    a pre-resolved ``schema_id`` skips the control plane. Round-trips
    through the parser: frame → (_schema_id, body)."""
    schema_type = schema_type.upper()  # 'avro' would register as-is
    #                                    and real registries 422 it
    if schema_id is None:
        if not (registry_url and subject and schema_json):
            raise ValueError(
                "confluent_sr_serializer needs schema_id, or "
                "registry_url + subject + schema_json to register live"
            )
        from transferia_spark.parsers.schema_registry import (
            SchemaRegistryClient,
        )

        schema_id = SchemaRegistryClient(
            registry_url, auth=registry_auth,
            tls_ca=registry_tls_ca, tls_insecure=registry_tls_insecure,
        ).register_schema(subject, schema_json, schema_type)
    if (
        schema_type == "AVRO"
        and body is json_serializer
        and schema_json
    ):
        body = avro_serializer
        body_kw.setdefault("schema_json", schema_json)
    framed = body(df, **body_kw)
    prefix = bytes([0]) + int(schema_id).to_bytes(4, "big")
    cols = []
    if "key" in framed.columns:
        cols.append(F.col("key"))
    cols.append(
        F.concat(F.lit(prefix), F.col("value").cast("binary")).alias("value")
    )
    return framed.select(*cols)


def csv_serializer(df: DataFrame, sep: str = ",") -> DataFrame:
    """Row → CSV line (for line-oriented sinks); file sinks should use
    df.write.csv (parallel) instead."""
    payload = [c for c in df.columns if c not in META_COLS]
    return df.select(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in payload]).alias("value")
    )
