"""Oracle/Greenplum snapshot sharding, the Airbyte protocol source,
the YDB changefeed envelope, and batch splitting."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.cdc.changeitem import LSN_COL, OP_COL, PRESENT_COL
from transferia_spark.cdc.envelopes import ydb_changefeed_to_changeitems
from transferia_spark.operators import build
from transferia_spark.schema.colschema import TableID
from transferia_spark.sources.airbyte import (
    AirbyteSource,
    RECORD_INDEX_COL,
    json_schema_to_spark,
)
from transferia_spark.sources.enterprise import (
    GreenplumSnapshotSource,
    OracleSnapshotSource,
    encode_rowid,
    gp_segment_predicates,
    gpfdist_external_table_ddl,
    ora_hash_predicates,
    oracle_select_list,
    rowid_range_predicates,
)

# ---------------------------------------------------------------- oracle


def test_encode_rowid_golden():
    # obj=32768 (AAAIAA), file=4 (AAE), block=0, row=0
    assert encode_rowid(32768, 4, 0, 0) == "AAAIAAAAEAAAAAAAAA"
    assert encode_rowid(0, 0, 0, 0) == "A" * 18
    # 6-bit digit boundaries: 63 -> '/', 64 -> 'BA'
    assert encode_rowid(63, 0, 0, 0).startswith("AAAAA/")
    assert encode_rowid(64, 0, 0, 0).startswith("AAAABA")


def test_rowid_range_predicates_cover_extents_disjointly():
    preds = rowid_range_predicates(
        12345, [(4, 128, 64), (5, 0, 32)], blocks_per_shard=32
    )
    assert len(preds) == 3  # 64/32 + 32/32
    assert all("CHARTOROWID" in p for p in preds)
    # extent-aligned: no predicate spans two files
    assert preds[0] != preds[1]


def test_ora_hash_and_select_list():
    preds = ora_hash_predicates(4)
    assert preds[0] == "ORA_HASH(ROWID, 3) = 0" and len(preds) == 4
    sel = oracle_select_list([("ID", "NUMBER"), ("RID", "ROWID")])
    assert sel == '"ID", ROWIDTOCHAR("RID") AS "RID"'


def test_oracle_dbtable_flashback():
    src = OracleSnapshotSource("jdbc:oracle:thin:@h:1521/db", flashback_scn=998877)
    q = src.dbtable("SCOTT.EMP", where="SAL > 0")
    assert q == "(SELECT * FROM SCOTT.EMP AS OF SCN 998877 WHERE SAL > 0)"


# ------------------------------------------------------------- greenplum


def test_gp_segment_predicates_and_ddl():
    assert gp_segment_predicates(3) == [
        "gp_segment_id = 0",
        "gp_segment_id = 1",
        "gp_segment_id = 2",
    ]
    ddl = gpfdist_external_table_ddl(
        "public.sales",
        [("id", "bigint"), ("amt", "numeric")],
        ["gpfdist://w1:8080/sales", "gpfdist://w2:8080/sales"],
    )
    assert ddl.startswith('CREATE WRITABLE EXTERNAL TABLE "public.sales__unload"')
    assert "gpfdist://w2:8080/sales" in ddl and "FORMAT 'TEXT'" in ddl


def test_greenplum_where_composes_with_segments():
    src = GreenplumSnapshotSource("jdbc:postgresql://h/db", n_segments=2)
    preds = gp_segment_predicates(src.n_segments)
    composed = [f"({p}) AND (x > 1)" for p in preds]
    assert composed[1] == "(gp_segment_id = 1) AND (x > 1)"


# --------------------------------------------------------------- airbyte

CATALOG = {
    "streams": [
        {
            "name": "users",
            "namespace": "crm",
            "supported_sync_modes": ["full_refresh", "incremental"],
            "json_schema": {
                "type": "object",
                "properties": {
                    "id": {"type": "integer"},
                    "name": {"type": ["null", "string"]},
                    "score": {"type": "number"},
                    "joined": {"type": "string", "format": "date-time"},
                    "tags": {"type": "array", "items": {"type": "string"}},
                },
            },
        }
    ]
}


def _write_capture(tmp_path):
    lines = [
        {"type": "LOG", "log": {"level": "INFO", "message": "starting"}},
        {
            "type": "RECORD",
            "record": {
                "stream": "users",
                "data": {"id": 2, "name": "bob", "score": 1.5, "tags": ["x"]},
                "emitted_at": 1700000001000,
            },
        },
        {
            "type": "RECORD",
            "record": {
                "stream": "users",
                "data": {"id": 1, "name": None, "score": 2.0, "tags": []},
                "emitted_at": 1700000000000,
            },
        },
        {
            "type": "STATE",
            "state": {
                "type": "STREAM",
                "stream": {"stream_descriptor": {"name": "users"}},
                "data": {"cursor": "2024-01-01"},
            },
        },
        {
            "type": "STATE",
            "state": {
                "type": "STREAM",
                "stream": {"stream_descriptor": {"name": "users"}},
                "data": {"cursor": "2024-02-02"},
            },
        },
    ]
    p = tmp_path / "capture.jsonl"
    p.write_text("\n".join(json.dumps(line) for line in lines))
    return str(p)


def test_json_schema_to_spark_types():
    st = json_schema_to_spark(CATALOG["streams"][0]["json_schema"])
    assert isinstance(st, T.StructType)
    assert st["id"].dataType == T.LongType()
    assert st["name"].dataType == T.StringType()
    assert st["score"].dataType == T.DoubleType()
    assert st["joined"].dataType == T.TimestampType()
    assert st["tags"].dataType == T.ArrayType(T.StringType())


def test_airbyte_records_and_state(spark, tmp_path):
    path = _write_capture(tmp_path)
    src = AirbyteSource(path, CATALOG)
    rows = src.records(spark, "users").orderBy(RECORD_INDEX_COL).collect()
    assert [r[RECORD_INDEX_COL] for r in rows] == [0, 1]
    # earlier emitted_at gets the lower record index
    assert rows[0].id == 1 and rows[0].name is None
    assert rows[1].id == 2 and rows[1].tags == ["x"]
    assert src.table_list(spark)[0] == TableID("crm", "users")
    # latest STATE wins
    assert src.state(spark) == {"users": {"cursor": "2024-02-02"}}


# ----------------------------------------------------------------- ydb

YDB_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_ydb_changefeed_modes(spark):
    lines = [
        # NEW_IMAGE mode: full row
        (json.dumps({"key": [1], "update": {}, "newImage": {"name": "a", "score": 1.0},
                     "ts": [1700000000000, 42]}), 0, 10),
        # UPDATES mode: only changed columns -> _present contract
        (json.dumps({"key": [1], "update": {"score": 2.0}}), 0, 11),
        # erase -> delete
        (json.dumps({"key": [1], "erase": {}}), 0, 12),
    ]
    df = spark.createDataFrame(lines, ["json", "part_id", "offset"])
    out = ydb_changefeed_to_changeitems(df, ["id"], YDB_SCHEMA).orderBy(LSN_COL)
    rows = out.collect()
    assert [r[OP_COL] for r in rows] == ["u", "u", "d"]
    assert rows[0].id == 1 and rows[0].name == "a" and rows[0][PRESENT_COL] is None
    assert rows[0]._tx_id == "42"
    # partial update: score present, name absent
    assert sorted(rows[1][PRESENT_COL]) == ["id", "score"]
    assert rows[1].score == 2.0
    # delete carries key only
    assert rows[2].id == 1 and rows[2].name is None


def test_ydb_collapse_integration(spark):
    """update-mode partials through collapse keep unmentioned columns."""
    from transferia_spark.cdc.collapse import collapse

    lines = [
        (json.dumps({"key": [7], "update": {}, "newImage": {"name": "x", "score": 1.0}}), 0, 1),
        (json.dumps({"key": [7], "update": {"score": 5.0}}), 0, 2),
    ]
    df = spark.createDataFrame(lines, ["json", "part_id", "offset"])
    frame = ydb_changefeed_to_changeitems(df, ["id"], YDB_SCHEMA)
    net = collapse(frame, keys=["id"]).collect()
    assert len(net) == 1
    assert net[0].name == "x" and net[0].score == 5.0  # name survived the partial


# -------------------------------------------------------- batch splitter


def test_batch_splitter_bounds_push_units(spark):
    df = spark.range(0, 1000).repartition(2)
    t = build("batch_splitter", max_rows_per_partition=100)
    out = t.apply(TableID("", "t"), df)[0][1]
    per_batch = (
        out.groupBy(F.spark_partition_id().alias("p"), t.BATCH_COL)
        .count()
        .collect()
    )
    assert all(r["count"] <= 100 for r in per_batch)
    assert out.count() == 1000


def test_record_index_offset_rank_equals_global_window(spark, monkeypatch):
    """The r14 scalable record index (range partition + per-partition
    offsets over monotonically_increasing_id) must reproduce the plain
    global-window rank EXACTLY with the fan-out forced on tiny data:
    dense 0..N-1, ordered by (emitted_at NULLS FIRST, payload hash),
    no row_number window anywhere in the plan, and the empty frame
    keeps its schema."""
    import json as _json

    import transferia_spark.sources.airbyte as ab

    # 1-byte chunks -> _index_partitions returns defaultParallelism
    monkeypatch.setattr(ab, "_INDEX_CHUNK_BYTES", 1)
    spec = ab.AirbyteStreamSpec(
        {
            "name": "s",
            "json_schema": {
                "type": "object",
                "properties": {"id": {"type": "integer"}},
            },
        }
    )
    # unique emitted_at (incl. one null via an ABSENT field) in
    # shuffled order, LOG noise interleaved -> expected index =
    # emitted_at rank, null first (NULLS FIRST on both the old window
    # and the range sort)
    emitted = [83, 7, 55, None, 19, 91, 2, 40, 66, 28]
    lines = []
    for i, e in enumerate(emitted):
        rec = {
            "type": "RECORD",
            "record": {"stream": "s", "data": {"id": i}},
        }
        if e is not None:
            rec["record"]["emitted_at"] = e
        lines.append(_json.dumps(rec))
        lines.append('{"type":"LOG","log":{"level":"INFO","message":"t"}}')
    df = spark.createDataFrame([(x,) for x in lines], ["value"])
    out = ab.decode_records(df, spec, "s")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number(" not in plan  # no global-window funnel left
    rows = {r["id"]: r for r in out.collect()}
    order = sorted(
        emitted, key=lambda e: (e is not None, e if e is not None else 0)
    )
    expected_idx = {e: i for i, e in enumerate(order)}
    assert len(rows) == len(emitted)
    for i, e in enumerate(emitted):
        r = rows[i]
        assert r[ab.RECORD_INDEX_COL] == expected_idx[e]
        assert r["_airbyte_emitted_at"] == e
    # empty frame: schema preserved, zero rows
    empty = ab.decode_records(
        spark.createDataFrame([], "value string"), spec, "s"
    )
    assert empty.columns == [ab.RECORD_INDEX_COL, "_airbyte_emitted_at", "id"]
    assert empty.count() == 0
