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


@register_parser("blank")
def blank_parser():
    """Queue message → the reference's fixed "blank" row shape
    (≈ ``pkg/parsers/registry/blank/parser_blank.go:56-66``:
    partition/offset PK, seq_no, source_id, c_time, w_time, ip,
    lb_raw_message, lb_extra_fields). Payload stays raw; downstream
    transformers (e.g. ``jsonparser``) parse it later."""

    def parse(df: DataFrame) -> DataFrame:
        part = (
            F.col("partition").cast("string")
            if "partition" in df.columns
            else F.lit("0")
        )
        off = F.col("offset").cast("long") if "offset" in df.columns else F.lit(0)
        ts = (
            F.col("timestamp")
            if "timestamp" in df.columns
            else F.current_timestamp()
        )
        return df.select(
            part.alias("partition"),
            off.alias("offset"),
            off.alias("seq_no"),
            (F.col("key").cast("string") if "key" in df.columns else F.lit("")).alias(
                "source_id"
            ),
            ts.alias("c_time"),
            ts.alias("w_time"),
            F.lit("").alias("ip"),
            F.col("value").cast("string").alias("lb_raw_message"),
            F.lit(None).cast("string").alias("lb_extra_fields"),
        )

    return parse


@register_parser("logfeller")
def logfeller_parser(
    parser_name: str,
    schema: str,
    splitter: str = "line",
    timestamp_field: str | None = None,
    add_system_cols: bool = True,
):
    """Logfeller-family parser: splitter × record parser × declared
    schema (≈ ``pkg/parsers/registry/logfeller/lib/lib.go`` — the
    reference delegates to a cgo library keyed by (ParserName,
    SplitterName) and feeds the result through the generic parser,
    ``generic_parser.go:455`` ``doLfParser``).

    Public semantics reproduced Spark-side:

    - the SPLITTER turns one transport message into many records:
      ``line`` (newline-split, the dominant config) or ``json_list``
      (a JSON array per message);
    - the record PARSER is ``json`` or ``tskv``, into the declared
      DDL ``schema``;
    - every record gets ``_logfeller_timestamp`` (PK, lib.go:19-21):
      the record's ``timestamp_field`` when declared, else the
      transport write time;
    - records that fail to parse carry ``_unparsed_raw`` + ``_error``
      so the pipeline routes them to ``<table>_unparsed``
      (``route_unparsed`` in plans/transfer.py).

    Splitting is ``posexplode(split(...))`` — pure Catalyst, one pass,
    no Python; record parsing is ``from_json``/``str_to_map``.
    """
    st = T._parse_datatype_string(schema)
    if parser_name not in ("json", "tskv"):
        raise ValueError(f"logfeller: unknown parser {parser_name!r} (json|tskv)")
    if splitter not in ("line", "json_list"):
        raise ValueError(f"logfeller: unknown splitter {splitter!r} (line|json_list)")

    def parse(df: DataFrame) -> DataFrame:
        raw = F.col("value").cast("string")
        if splitter == "json_list":
            records = F.from_json(raw, T.ArrayType(T.StringType()))
            # a message that is not a JSON array is one unsplittable record
            records = F.coalesce(records, F.array(raw))
        else:
            records = F.filter(
                F.split(raw, r"\n"), lambda line: F.length(line) > 0
            )
        exploded = df.select(
            *[F.col(c) for c in df.columns],
            F.posexplode(records).alias("_rec_idx", "_rec"),
        )
        rec = F.col("_rec")
        if parser_name == "json":
            st_c = T.StructType(
                list(st.fields) + [T.StructField("_corrupt", T.StringType(), True)]
            )
            parsed = F.from_json(
                rec, st_c, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
            )
            field_expr = {f.name: parsed[f.name] for f in st.fields}
            bad = parsed["_corrupt"].isNotNull()
        else:  # tskv
            body = F.regexp_replace(rec, r"^tskv\t", "")
            m = F.str_to_map(body, F.lit("\t"), F.lit("="))
            field_expr = {
                f.name: F.element_at(m, f.name).cast(f.dataType) for f in st.fields
            }
            bad = ~rec.contains("=")
        fields = [c.alias(n) for n, c in field_expr.items()]
        if timestamp_field:
            lf_ts = field_expr[timestamp_field].cast("timestamp")
        elif "timestamp" in df.columns:
            lf_ts = F.col("timestamp")
        else:
            lf_ts = F.current_timestamp()
        extra = []
        if add_system_cols:
            # like _aux_columns, but _idx here is the record index
            # within the message (the lf contract), not the offset
            extra.append(
                (F.col("timestamp") if "timestamp" in df.columns else F.current_timestamp()).alias("_timestamp")
            )
            if "partition" in df.columns:
                extra.append(F.col("partition").alias("_partition"))
            if "offset" in df.columns:
                extra.append(F.col("offset").alias("_offset"))
        return exploded.select(
            *fields,
            lf_ts.alias("_logfeller_timestamp"),
            *extra,
            F.when(bad, rec).alias("_unparsed_raw"),
            F.when(bad, F.lit(f"logfeller/{parser_name}: malformed record")).alias("_error"),
            F.col("_rec_idx").alias("_idx"),
        )

    return parse


@register_parser("raw_to_table")
def raw_to_table_parser(column: str = "raw", keep_binary: bool = False):
    """Whole message → a one-column table row plus dedupe-key system
    columns (≈ ``pkg/parsers/registry/raw_to_table/parser_raw_to_table.go``)."""

    def parse(df: DataFrame) -> DataFrame:
        payload = F.col("value") if keep_binary else F.col("value").cast("string")
        return df.select(payload.alias(column), *_aux_columns(df))

    return parse


@register_parser("cloudevents")
def cloudevents_parser(
    add_system_cols: bool = False,
    binding: str = "json",
    registry_auth: tuple[str, str] | None = None,
    registry_tls_ca: str | None = None,
    registry_tls_insecure: bool = False,
    url_converter=None,
):
    """CloudEvents envelope → fixed row shape
    (≈ ``pkg/parsers/registry/cloudevents/engine/parser.go:37-47``:
    id PK, source, type, dataschema, subject, time, payload).

    ``binding="json"`` parses the public JSON binding declaratively.
    ``binding="proto"`` is the reference's actual flow
    (cloudevents/engine/protobuf.go + parser.go): the protobuf
    envelope decodes with the repo's bounded proto codec, the
    ``dataschema`` CE-URI names the registry + schema id, and the Any
    ``type_url`` addresses the message — executor tasks resolve and
    decode, payload lands as canonical JSON (bytes hex-encoded)."""
    if binding == "proto":
        def parse_proto(df: DataFrame) -> DataFrame:
            # the same _timestamp/_partition/_offset/_idx system-column
            # CONTRACT every parser emits (generic_parser.go:115-166) —
            # raw source names here broke downstream selects keyed on
            # the underscored names (code-review r11 pass 6)
            aux = (
                [c for c in df.columns if c != "value"]
                if add_system_cols else []
            )
            st = T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("type", T.StringType()),
                    T.StructField("dataschema", T.StringType()),
                    T.StructField("subject", T.StringType()),
                    T.StructField("time", T.TimestampType()),
                    T.StructField("payload", T.StringType()),
                    T.StructField("_schema_id", T.IntegerType()),
                ]
                + [df.schema[c] for c in aux]
            )

            def run(batches):
                import datetime as _dt
                import json as _json

                import pandas as pd

                from transferia_spark.parsers.cloudevents_proto import (
                    decode_cloudevent_payload,
                )
                from transferia_spark.parsers.schema_registry import (
                    client_for,
                )

                factory = (
                    lambda base: client_for(
                        base, auth=registry_auth,
                        tls_ca=registry_tls_ca,
                        tls_insecure=registry_tls_insecure,
                    )
                )

                def canon(v):
                    if isinstance(v, bytes):
                        return v.hex()
                    if isinstance(v, dict):
                        return {k: canon(x) for k, x in v.items()}
                    if isinstance(v, list):
                        return [canon(x) for x in v]
                    return v

                names = ("id", "source", "type", "dataschema",
                         "subject", "time", "payload", "_schema_id")
                for pdf in batches:
                    rows = {n: [] for n in names}
                    for v in pdf["value"]:
                        if v is None:
                            # Kafka tombstone: a null row, never a
                            # crashed stream (code-review r11 pass 5)
                            for n in names:
                                rows[n].append(None)
                            continue
                        fields, sid, rec = decode_cloudevent_payload(
                            bytes(v), factory, url_converter
                        )
                        for n in ("id", "source", "type", "dataschema",
                                  "subject"):
                            rows[n].append(fields[n])
                        # tz-AWARE: a naive datetime would be
                        # re-interpreted in the session timezone,
                        # shifting the instant (code-review r11 pass 5)
                        rows["time"].append(_dt.datetime.fromtimestamp(
                            fields["time"], _dt.timezone.utc
                        ))
                        rows["payload"].append(
                            _json.dumps(canon(rec), sort_keys=True)
                            if isinstance(rec, dict)
                            else (rec.hex() if isinstance(rec, bytes)
                                  else rec)
                        )
                        rows["_schema_id"].append(sid)
                    out = dict(rows)
                    for c in aux:
                        out[c] = pdf[c]
                    yield pd.DataFrame(out)

            parsed = df.mapInPandas(run, st)
            if aux:
                keep = [c for c in parsed.columns if c not in aux]
                return parsed.select(*keep, *_aux_columns(parsed))
            return parsed

        return parse_proto
    if binding != "json":
        raise ValueError(f"unknown cloudevents binding {binding!r}")
    env = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("dataschema", T.StringType()),
            T.StructField("subject", T.StringType()),
            T.StructField("time", T.StringType()),
            T.StructField("data", T.StringType()),
        ]
    )

    def parse(df: DataFrame) -> DataFrame:
        v = F.from_json(F.col("value").cast("string"), env)
        extra = _aux_columns(df) if add_system_cols else []
        return df.select(
            v["id"].alias("id"),
            v["source"].alias("source"),
            v["type"].alias("type"),
            v["dataschema"].alias("dataschema"),
            v["subject"].alias("subject"),
            F.to_timestamp(v["time"]).alias("time"),
            v["data"].alias("payload"),
            *extra,
        )

    return parse


@register_parser("cloudlogging")
def cloudlogging_parser(add_system_cols: bool = False):
    """Cloud-logging JSON records → fixed row shape
    (≈ ``pkg/parsers/registry/cloudlogging/engine/parser.go:51-64``:
    timestamp+uid PK, resource any, ingestedAt, savedAt, level,
    message, jsonPayload any, streamName)."""
    env = T.StructType(
        [
            T.StructField("timestamp", T.StringType()),
            T.StructField("uid", T.StringType()),
            T.StructField("resource", T.StringType()),
            T.StructField("ingestedAt", T.StringType()),
            T.StructField("savedAt", T.StringType()),
            T.StructField("level", T.StringType()),
            T.StructField("message", T.StringType()),
            T.StructField("jsonPayload", T.StringType()),
            T.StructField("streamName", T.StringType()),
        ]
    )

    def parse(df: DataFrame) -> DataFrame:
        v = F.from_json(F.col("value").cast("string"), env)
        extra = _aux_columns(df) if add_system_cols else []
        return df.select(
            F.to_timestamp(v["timestamp"]).alias("timestamp"),
            v["uid"].alias("uid"),
            v["resource"].alias("resource"),
            F.to_timestamp(v["ingestedAt"]).alias("ingestedAt"),
            F.to_timestamp(v["savedAt"]).alias("savedAt"),
            v["level"].alias("level"),
            v["message"].alias("message"),
            v["jsonPayload"].alias("jsonPayload"),
            v["streamName"].alias("streamName"),
            *extra,
        )

    return parse


@register_parser("audittrailsv1")
def audittrails_parser(add_system_cols: bool = False):
    """Audit-trails JSON events: well-known envelope fields extracted
    as typed columns, the full record preserved in ``details`` (the
    reference flattens dynamically per record,
    ``pkg/parsers/registry/audittrailsv1/engine/parser.go:163-175``;
    a static-schema engine keeps the spill in a map column instead)."""
    known = [
        "event_id",
        "event_source",
        "event_type",
        "event_time",
        "event_status",
    ]

    def parse(df: DataFrame) -> DataFrame:
        raw = F.col("value").cast("string")
        m = F.from_json(raw, T.MapType(T.StringType(), T.StringType()))
        extra = _aux_columns(df) if add_system_cols else []
        return df.select(
            F.element_at(m, "event_id").alias("event_id"),
            F.element_at(m, "event_source").alias("event_source"),
            F.element_at(m, "event_type").alias("event_type"),
            F.to_timestamp(F.element_at(m, "event_time")).alias("event_time"),
            F.element_at(m, "event_status").alias("event_status"),
            F.map_filter(m, lambda k, _: ~k.isin(known)).alias("details"),
            *extra,
        )

    return parse


# Confluent wire format: 1 magic byte (0x0) + 4-byte big-endian schema
# id, then the Avro/Protobuf/JSON body. The reference resolves the id
# against a live registry (pkg/parsers/registry/confluentschemaregistry
# + pkg/schemaregistry/confluent); `registry_url` does the same here —
# executor tasks resolve ids over stdlib HTTP (bounded per-process
# cache) and decode the body with the WRITER schema (AVRO binary via
# parsers/schema_registry.AvroCodec, JSON via json.loads), projecting
# onto the declared `schema`. Without a registry, the framing split +
# a pluggable body parser remain (offline flows, tests).
@register_parser("confluent_schema_registry")
def confluent_sr_parser(
    body_parser=None,
    registry_url: str | None = None,
    schema: str | None = None,
    registry_auth: tuple[str, str] | None = None,
    registry_tls_ca: str | None = None,
    registry_tls_insecure: bool = False,
    table_name_policy: str | None = None,
    on_invalid: str = "unparsed",
    drift_guard: bool = False,
    **body_config,
):
    # per-RECORD schema violations (wrong-typed field, missing
    # required, bad magic/frame, unknown id) route to unparsed rows by
    # default like the reference (engine/parser.go: a bad record
    # becomes NewUnparsed, never a dead stream); on_invalid="fail" is
    # the opt-in strict mode keeping the old loud raise (ADVICE r11:
    # one bad record must not poison the topic). Registry transport
    # failures (connection refused, TLS, timeouts) stay loud in both
    # modes — they are infra, not data.
    if on_invalid not in ("unparsed", "fail"):
        raise ValueError(
            f"on_invalid must be 'unparsed' or 'fail', got {on_invalid!r}"
        )
    # drift_guard=True (the replicate verb's registry drift contract):
    # every NEW writer-schema id is checked against the declared
    # columns — added columns raise the transient RegistrySchemaDrift
    # (the supervisor evolves the declared schema from the registry
    # and restarts), a retype raises the fatal ValueError. Off by
    # default: a standalone parser projecting a wider writer schema
    # onto fewer declared columns is a legitimate read.
    if registry_url is not None:
        if schema is None:
            raise ValueError(
                "confluent_schema_registry with registry_url needs the "
                "declared output `schema` DDL (Spark plans need a "
                "static schema; the registry supplies the WRITER "
                "schema per record)"
            )
        out_st = T._parse_datatype_string(schema)
        names = [f.name for f in out_st.fields]

        def parse_live(df: DataFrame) -> DataFrame:
            import pandas as pd

            aux = [c for c in df.columns if c != "value"]
            route = (
                [T.StructField("_table", T.StringType())]
                if table_name_policy else []
            )
            dead = (
                [T.StructField("_unparsed_raw", T.BinaryType()),
                 T.StructField("_error", T.StringType())]
                if on_invalid == "unparsed" else []
            )
            st = T.StructType(
                [T.StructField("_schema_id", T.IntegerType())]
                + route
                + list(out_st.fields)
                + dead
                + [df.schema[c] for c in aux]
            )

            def run(batches):
                import struct

                from transferia_spark.parsers.schema_registry import (
                    build_table_id,
                    check_registry_drift,
                    client_for,
                    decode_confluent,
                    decode_confluent_full,
                )

                # per-PROCESS client: the id→schema cache must survive
                # across tasks/batches or every micro-batch re-issues
                # registry GETs (code-review r11)
                client = client_for(
                    registry_url, auth=registry_auth,
                    tls_ca=registry_tls_ca,
                    tls_insecure=registry_tls_insecure,
                )
                #: data-shaped decode failures; transport errors
                #: (OSError incl. URLError, ssl) propagate and fail
                #: the task loudly in BOTH modes
                _record_errs = (ValueError, KeyError, IndexError,
                                struct.error, UnicodeDecodeError,
                                EOFError, OverflowError)
                declared_types = (
                    {f.name: f.dataType for f in out_st.fields}
                    if drift_guard else None
                )
                dkey = None
                if declared_types is not None:
                    from transferia_spark.parsers.schema_registry import (
                        declared_key,
                    )

                    dkey = declared_key(declared_types)
                for pdf in batches:
                    ids, tables, cols = [], [], {n: [] for n in names}
                    raws, errs = [], []
                    for v in pdf["value"]:
                        if v is None:
                            # Kafka tombstone (delete marker): null
                            # payload rides through as a null row, the
                            # frame split must not crash the stream
                            # (code-review r11)
                            ids.append(None)
                            tables.append(None)
                            raws.append(None)
                            errs.append(None)
                            for n in names:
                                cols[n].append(None)
                            continue
                        try:
                            if table_name_policy:
                                (sid, rec, stype,
                                 src) = decode_confluent_full(
                                    bytes(v), client
                                )
                                table = build_table_id(
                                    table_name_policy, stype, src
                                )
                            else:
                                sid, rec = decode_confluent(
                                    bytes(v), client
                                )
                                table = None
                        except _record_errs as e:
                            if on_invalid == "fail":
                                raise
                            ids.append(None)
                            tables.append(None)
                            raws.append(bytes(v))
                            errs.append(
                                f"confluent_schema_registry: {e}"
                            )
                            for n in names:
                                cols[n].append(None)
                            continue
                        if declared_types is not None:
                            # OUTSIDE the per-record catch: drift is
                            # schema lifecycle, not per-record poison
                            # — RegistrySchemaDrift must reach the
                            # supervisor, a retype must stay fatal
                            check_registry_drift(
                                bytes(v), client, declared_types,
                                dkey=dkey,
                            )
                        tables.append(table)
                        raws.append(None)
                        errs.append(None)
                        ids.append(sid)
                        for n in names:
                            cols[n].append(
                                rec.get(n) if isinstance(rec, dict)
                                else None
                            )
                    out = {"_schema_id": ids}
                    if table_name_policy:
                        # schema-derived routing table per record ≈ the
                        # reference's table_name_policy — feeds the
                        # replicate verb's `_table` multi-table router
                        out["_table"] = tables
                    out.update(cols)
                    if on_invalid == "unparsed":
                        out["_unparsed_raw"] = raws
                        out["_error"] = errs
                    for c in aux:
                        out[c] = pdf[c]
                    yield pd.DataFrame(out)

            parsed = df.mapInPandas(run, st)
            # over a live queue source the raw kafka system columns
            # become the reference's underscored system columns
            # (_timestamp/_partition/_offset/_idx) like every other
            # parser — the replicate verb's kafkawire path orders on
            # _timestamp/_offset. Aux columns already underscored
            # (offline fixtures) pass through untouched.
            raw_sys = [c for c in ("timestamp", "partition", "offset")
                       if c in aux]
            if raw_sys:
                keep = [c for c in parsed.columns if c not in raw_sys]
                parsed = parsed.select(*keep, *_aux_columns(parsed))
            return parsed

        return parse_live

    if schema is not None:
        # offline path: `schema` belongs to the BODY parser (json etc.),
        # not the registry resolution
        body_config["schema"] = schema

    def parse(df: DataFrame) -> DataFrame:
        framed = df.withColumn(
            "_schema_id",
            F.conv(F.hex(F.expr("substring(value, 2, 4)")), 16, 10).cast("int"),
        ).withColumn("value", F.expr("substring(value, 6, length(value)-5)"))
        if body_parser is not None:
            body = build_parser(body_parser, **body_config)
            out = body(framed)
            if "_schema_id" not in out.columns:
                # surface the id for schema-drift routing
                out = body(framed.withColumnRenamed("_schema_id", "_sr_id"))
            return out
        return framed

    return parse


@register_parser("protobuf")
def protobuf_parser(
    descriptor_file: str | None = None,
    message_name: str | None = None,
    schema: str | None = None,
    engine: str = "jvm",
    field_spec: dict | None = None,
):
    """Protobuf payloads (≈ ``pkg/parsers/registry/protobuf``).

    ``engine="jvm"`` (production fast path) uses spark-protobuf's
    ``from_protobuf`` against a compiled descriptor file; the jar is an
    external module, so absence raises at build time rather than on the
    executors. ``engine="python"`` decodes the wire format in pure
    Python (``parsers/protowire.py``) against a ``field_spec``
    (``{num: (name, type)}`` — the minimal descriptor) into the declared
    ``schema``, via one Arrow-batched ``mapInPandas`` pass — the
    executable path for jar-less environments and the test evidence for
    the parser's semantics.
    """
    if engine == "python":
        if not field_spec or not schema:
            raise ValueError(
                "protobuf engine='python' needs field_spec and schema"
            )
        from transferia_spark.parsers.protowire import decode_message

        out_st = T._parse_datatype_string(schema)
        names = [f.name for f in out_st.fields]

        def parse_py(df: DataFrame) -> DataFrame:
            import pandas as pd

            def run(batches):
                for pdf in batches:
                    decoded = [
                        decode_message(bytes(v), field_spec)
                        for v in pdf["value"]
                    ]
                    yield pd.DataFrame(
                        {n: [d.get(n) for d in decoded] for n in names}
                    )

            return df.select("value").mapInPandas(run, out_st)

        return parse_py

    try:
        from pyspark.sql.protobuf.functions import from_protobuf
    except ImportError as e:  # pragma: no cover - depends on jar availability
        raise NotImplementedError(
            "protobuf parser requires the spark-protobuf package "
            "(--packages org.apache.spark:spark-protobuf_2.13); "
            "engine='python' with a field_spec decodes without the jar"
        ) from e
    if not descriptor_file or not message_name:
        raise ValueError("protobuf parser needs descriptor_file and message_name")

    def parse(df: DataFrame) -> DataFrame:
        parsed = from_protobuf(F.col("value"), message_name, descFilePath=descriptor_file)
        return df.select(F.col("_p.*")).withColumn("_p", parsed)

    return parse


@register_parser("native")
def native_parser(schema: str):
    """Round-trip of the native serializer: ChangeItem-as-JSON
    ({kind, lsn, counter, commit_ts, table, columns{...}}) back into a
    ChangeItem DataFrame (≈ ``pkg/parsers/registry/native``)."""
    row_st = T._parse_datatype_string(schema)
    env = T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("counter", T.IntegerType()),
            T.StructField("commit_ts", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("columns", row_st),
            T.StructField("old_keys", row_st),
        ]
    )

    def parse(df: DataFrame) -> DataFrame:
        v = F.from_json(F.col("value").cast("string"), env)
        payload = [v["columns"][f.name].alias(f.name) for f in row_st.fields]
        return df.select(
            *payload,
            v["kind"].alias("_op"),
            v["lsn"].alias("_lsn"),
            v["counter"].alias("_counter"),
            F.to_timestamp(v["commit_ts"]).alias("_commit_ts"),
            v["old_keys"].alias("_before"),
            v["table"].alias("_table"),
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
