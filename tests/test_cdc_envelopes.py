"""MySQL binlog / Mongo change-stream envelope adapters.

Reference semantics under test: ``pkg/providers/mysql/source.go:141``
(OnRow row-pair contract, GTID tx ids), ``utils.go:204`` (binlog
file/pos → LSN), ``pkg/providers/mongo/change_stream_watcher.go:38``
(+ partial updateDescription events)."""

from __future__ import annotations

from pyspark.sql import functions as F

from transferia_spark.cdc.collapse import collapse
from transferia_spark.cdc.envelopes import (
    fnv1_32,
    mongo_change_stream_to_changeitems,
    mysql_binlog_to_changeitems,
    mysql_lsn,
)
from transferia_spark.cdc.merge import merge_batch

MYSQL_DDL = (
    "action string, log_file string, log_pos long, ts_sec long, gtid string, "
    "row_idx int, before struct<id:long, v:string>, after struct<id:long, v:string>"
)


def _fnv1_32_py(s: str) -> int:
    h = 2166136261
    for byte in s.encode():
        h = (h * 16777619) % (1 << 32)
        h ^= byte
    return h


def test_mysql_lsn_matches_calculate_lsn(spark):
    df = spark.createDataFrame(
        [("binlog.000007", 1234), ("mysql-bin.000001", 5), ("binlog", 42)],
        "f string, p long",
    )
    got = [r["l"] for r in df.select(mysql_lsn(F.col("f"), F.col("p")).alias("l")).collect()]
    assert got == [7 * 10**12 + 1234, 1 * 10**12 + 5, 10**12 + 42]


def test_fnv1_32_matches_go_fnv(spark):
    vals = ["", "a", "3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", fnv1_32(F.col("s")).alias("h")).collect()}
    for v in vals:
        assert got[v] == _fnv1_32_py(v), v


def test_mysql_binlog_row_pairs_and_pk_change(spark):
    rows = [
        ("insert", "binlog.000001", 10, 1700000000, "g:1", 0, None, (1, "a")),
        # plain update: old image in before, new in after
        ("update", "binlog.000001", 20, 1700000001, "g:2", 0, (1, "a"), (1, "b")),
        # PK-changing update 1 → 2 (OldKeys drive delete+insert downstream)
        ("update", "binlog.000001", 30, 1700000002, "g:3", 0, (1, "b"), (2, "b")),
        # delete carries the old row (source.go:287 contract)
        ("delete", "binlog.000002", 5, 1700000003, "g:4", 0, (7, "zz"), None),
    ]
    df = spark.createDataFrame(rows, MYSQL_DDL)
    items = mysql_binlog_to_changeitems(df, keys=["id"])
    got = {(r["_lsn"], r["_op"]): r for r in items.collect()}

    ins = got[(10**12 + 10, "i")]
    assert ins["id"] == 1 and ins["v"] == "a" and ins["_before"] is None
    upd = got[(10**12 + 20, "u")]
    assert upd["v"] == "b" and upd["_before"]["id"] == 1
    moved = got[(10**12 + 30, "u")]
    assert moved["id"] == 2 and moved["_before"]["id"] == 1  # pre-image keeps old key
    dele = got[(2 * 10**12 + 5, "d")]
    assert dele["id"] == 7 and dele["v"] == "zz"  # payload from before image
    assert dele["_tx_id"] == "g:4"

    # end-to-end: the moved key must not leave a stale row behind
    target = spark.createDataFrame([], "id long, v string")
    final = sorted(tuple(r) for r in merge_batch(target, items, ["id"]).collect())
    assert final == [(2, "b")]


MONGO_DDL = (
    "op_type string, cluster_time long, order long, "
    "doc_key struct<_id:long>, full_doc struct<_id:long, v:string, w:string>, "
    "updated_fields map<string,string>, removed_fields array<string>"
)


def test_mongo_partial_update_keeps_absent_and_nulls_removed(spark):
    rows = [
        ("insert", 1, 0, (1,), (1, "a", "keep"), None, None),
        # partial update: only v set — w is ABSENT, must survive collapse
        ("update", 2, 0, (1,), None, {"v": "b"}, None),
        # $unset w: explicitly removed → genuine NULL, must NOT keep 'keep'
        ("update", 3, 0, (2,), None, None, ["w"]),
        ("insert", 0, 0, (2,), (2, "x", "keep"), None, None),
        ("replace", 4, 0, (3,), (3, "r", None), None, None),
        ("delete", 5, 0, (4,), None, None, None),
    ]
    df = spark.createDataFrame(rows, MONGO_DDL)
    items = mongo_change_stream_to_changeitems(df)
    net = {r["_id"]: r for r in collapse(items, keys=["_id"]).collect()}

    assert net[1]["v"] == "b" and net[1]["w"] == "keep"  # absent column carried
    assert net[2]["v"] == "x" and net[2]["w"] is None    # $unset wins over 'keep'
    assert net[3]["_op"] in ("i", "u") and net[3]["v"] == "r"
    assert net[4]["_op"] == "d"


def test_mongo_envelope_dotted_partial_update_fails_loudly(spark):
    """A partial update whose dotted path touches a DECLARED column
    fails the batch loudly — element_at would miss it and the column
    would silently go stale (code-review r14; the direct reader
    raises/dead-letters the same class). Dotted paths under
    UNDECLARED prefixes still drop per the declared-schema contract."""
    import pytest

    # dotted under the DECLARED column v → loud
    bad = spark.createDataFrame(
        [("update", 2, 0, (1,), None, {"v.sub": "7"}, None)], MONGO_DDL
    )
    with pytest.raises(Exception, match="dotted-path partial update"):
        mongo_change_stream_to_changeitems(bad).collect()
    # dotted removal of a declared column's fragment → loud too
    bad2 = spark.createDataFrame(
        [("update", 2, 0, (1,), None, None, ["w.x"])], MONGO_DDL
    )
    with pytest.raises(Exception, match="dotted-path partial update"):
        mongo_change_stream_to_changeitems(bad2).collect()
    # dotted under an UNDECLARED prefix → drops like any undeclared
    ok = spark.createDataFrame(
        [("update", 2, 0, (1,), None, {"zz.q": "1", "v": "b"}, None)],
        MONGO_DDL,
    )
    (row,) = mongo_change_stream_to_changeitems(ok).collect()
    assert row["v"] == "b" and row["_op"] == "u"


def test_mongo_pk_extender_chain(spark):
    """Compound documentKey struct → top-level PK columns (the
    reference chains mongo sources with the mongo_pk_extender
    transformer for exactly this shape)."""
    from transferia_spark.operators import build

    ddl = (
        "op_type string, cluster_time long, order long, "
        "doc_key struct<_id:struct<tenant:string, n:long>>, "
        "full_doc struct<_id:struct<tenant:string, n:long>, v:string>, "
        "updated_fields map<string,string>, removed_fields array<string>"
    )
    rows = [("insert", 1, 0, ((("t1", 10),)), ((("t1", 10)), "a"), None, None)]
    df = spark.createDataFrame(rows, ddl)
    items = mongo_change_stream_to_changeitems(df)
    t = build("mongo_pk_extender", id_column="_id")
    out = t.apply_df(items)
    assert {"tenant", "n", "v"} <= set(out.columns) and "_id" not in out.columns
    row = out.collect()[0]
    assert (row["tenant"], row["n"], row["v"]) == ("t1", 10, "a")
