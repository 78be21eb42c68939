"""Wire-source schema discovery (sources/schema_discovery.py — r8
verdict item 1): TableList/TableSchema parity for pgcopy/mysqlselect.
Pure matrix/fold/statement tests + loopback e2es where transfer.yaml
omits ``schema:`` entirely and the source discovers it live."""

from __future__ import annotations

import socket
import struct
import threading

import pytest
from pyspark.sql import types as T

from transferia_spark.sources.schema_discovery import (
    discover_mysql_tables,
    discover_pg_tables,
    fold_columns,
    fold_constraints,
    mysql_columns_sql,
    mysql_constraints_sql,
    mysql_type_to_spark,
    mysql_type_to_yt,
    pg_columns_sql,
    pg_pkeys_sql,
    pg_type_to_spark,
    pg_type_to_yt,
)

# ------------------------------------------------------------- matrices


def test_pg_type_matrix_follows_published_table():
    """postgres/typesystem.md source-mapping parity, spot-checked over
    every row family."""
    assert pg_type_to_yt("bigint") == "int64"
    assert pg_type_to_yt("integer") == "int32"
    assert pg_type_to_yt("smallint") == "int16"
    for t in ("numeric", "real", "double precision"):
        assert pg_type_to_yt(t) == "double"
    for t in ("bytea", "bit", "bit varying"):
        assert pg_type_to_yt(t) == "string"  # YT string = bytes
    for t in ("text", "character varying", "name", "uuid", "money",
              "interval", "time without time zone"):
        assert pg_type_to_yt(t) == "utf8"
    assert pg_type_to_yt("boolean") == "boolean"
    assert pg_type_to_yt("date") == "date"
    assert pg_type_to_yt("timestamp without time zone") == "timestamp"
    assert pg_type_to_yt("timestamp with time zone") == "timestamp"
    # the weird-but-published rows: CHARACTER(N), ARRAY, json → any
    for t in ("character", "ARRAY", "json", "jsonb", "inet", "hstore",
              "USER-DEFINED", "xml", "tsrange"):
        assert pg_type_to_yt(t) == "any"
    # Spark faces
    assert isinstance(pg_type_to_spark("bigint"), T.LongType)
    assert isinstance(pg_type_to_spark("bytea"), T.BinaryType)
    assert isinstance(pg_type_to_spark("numeric"), T.DoubleType)
    assert isinstance(pg_type_to_spark("jsonb"), T.StringType)


def test_mysql_type_matrix_follows_cast_go():
    """mysql/cast.go:146-194 TypeToYt parity, including the unsigned
    bumps and the raw column_type spellings information_schema emits."""
    assert mysql_type_to_yt("tinyint(1)") == "int8"
    assert mysql_type_to_yt("tinyint(3) unsigned") == "uint8"
    assert mysql_type_to_yt("smallint(5) unsigned") == "uint16"
    assert mysql_type_to_yt("int(11)") == "int32"
    assert mysql_type_to_yt("int(10) unsigned") == "uint32"
    assert mysql_type_to_yt("mediumint(9)") == "int32"
    assert mysql_type_to_yt("bigint(20)") == "int64"
    assert mysql_type_to_yt("bigint(20) unsigned") == "uint64"
    for t in ("decimal(10,2)", "double", "float", "float(7,4)"):
        assert mysql_type_to_yt(t) == "double"
    assert mysql_type_to_yt("date") == "date"
    assert mysql_type_to_yt("datetime(6)") == "timestamp"
    assert mysql_type_to_yt("timestamp") == "timestamp"
    for t in ("varchar(255)", "char(4)", "text", "longtext",
              "enum('a','b')", "set('x','y')", "time", "year(4)"):
        assert mysql_type_to_yt(t) == "utf8"
    for t in ("varbinary(16)", "blob", "longblob", "binary(8)",
              "bit(1)", "geometry", "point"):
        assert mysql_type_to_yt(t) == "string"
    assert mysql_type_to_yt("json") == "any"
    # Spark faces (unsigned widens; uint64 stays exact via decimal)
    assert isinstance(mysql_type_to_spark("int(10) unsigned"), T.LongType)
    assert isinstance(mysql_type_to_spark("bigint(20) unsigned"),
                      T.DecimalType)
    assert isinstance(mysql_type_to_spark("varbinary(16)"), T.BinaryType)


# ----------------------------------------------------------------- folds


def test_fold_columns_orders_by_ordinal():
    rows = [
        {"table_schema": "s", "table_name": "t", "column_name": "b",
         "ordinal_position": "2", "type": "text"},
        {"table_schema": "s", "table_name": "t", "column_name": "a",
         "ordinal_position": "1", "type": "bigint"},
        {"table_schema": "s", "table_name": "u", "column_name": "x",
         "ordinal_position": "1", "type": "date"},
    ]
    out = fold_columns(rows, pg_type_to_spark)
    assert [f.name for f in out["s.t"].fields] == ["a", "b"]
    assert isinstance(out["s.t"]["a"].dataType, T.LongType)
    assert isinstance(out["s.u"]["x"].dataType, T.DateType)


def test_fold_constraints_primary_first_then_first_unique():
    """The rows arrive PRIMARY-sorted-first (the statement's ORDER BY);
    the fold keeps the FIRST constraint per table — PK when present,
    else the first unique key (mysql/schema.go:166-215)."""
    rows = [
        # t1 has a PRIMARY (sorted first) and a secondary unique key
        {"table_schema": "s", "table_name": "t1", "column_name": "id",
         "ordinal_position": "1", "constraint_name": "PRIMARY"},
        {"table_schema": "s", "table_name": "t1", "column_name": "id2",
         "ordinal_position": "2", "constraint_name": "PRIMARY"},
        {"table_schema": "s", "table_name": "t1", "column_name": "u",
         "ordinal_position": "1", "constraint_name": "uniq_u"},
        # t2 only has a unique key
        {"table_schema": "s", "table_name": "t2", "column_name": "k",
         "ordinal_position": "1", "constraint_name": "uniq_k"},
    ]
    out = fold_constraints(rows)
    assert out == {"s.t1": ["id", "id2"], "s.t2": ["k"]}


# ------------------------------------------------------------ statements


def test_statements_exclude_system_schemas_and_order():
    c = pg_columns_sql()
    assert "'pg_catalog', 'information_schema'" in c
    assert c.endswith("ORDER BY c.table_schema, c.table_name, "
                      "c.ordinal_position")
    assert "BASE TABLE" in c
    assert "c.table_schema = 'shop'" in pg_columns_sql("shop")
    p = pg_pkeys_sql()
    assert "PRIMARY KEY" in p and "key_column_usage" in p
    m = mysql_columns_sql("shop")
    assert "'sys', 'mysql', 'information_schema', 'performance_schema'" in m
    assert "c.table_schema = 'shop'" in m
    k = mysql_constraints_sql()
    assert "constraint_name = 'PRIMARY' DESC" in k


# -------------------------------------------------------------- PG e2e


def _pg_catalog_rows():
    cols = [
        # ordinal order deliberately scrambled: the fold re-sorts
        (b"public", b"items", b"bal", b"3", b"double precision", b"float8"),
        (b"public", b"items", b"id", b"1", b"bigint", b"int8"),
        (b"public", b"items", b"name", b"2", b"text", b"text"),
        # PK-less table whose key is a unique replica-identity index
        (b"public", b"audit", b"aid", b"1", b"bigint", b"int8"),
        (b"public", b"audit", b"name", b"2", b"text", b"text"),
        (b"public", b"audit", b"bal", b"3", b"double precision",
         b"float8"),
    ]
    pks = [(b"public", b"items", b"id", b"1")]
    ident = [(b"public", b"audit", b"aid", b"1")]
    parents: list = []
    return cols, pks, ident, parents


def _serve_pg_discovery_and_copy(srv: socket.socket, n_conns: int,
                                 log: list | None = None):
    """Scripted PG: catalog discovery on the first connection, sharded
    COPY on the rest (same shard payloads as tests/test_pg_copy.py)."""
    from test_pg_copy import copy_data, copy_done, copy_out_resp
    from test_pg_session import auth, cmd_complete, data_row, ready, row_desc

    shard_rows = {
        0: b'1,alice,10.5\n3,"c,d",\\N\n',
        1: b"2,bob,-0.25\n4,\\N,7\n",
    }
    cat_cols, cat_pks, cat_ident, cat_parents = _pg_catalog_rows()

    def one(conn: socket.socket, conn_no: int):
        def recv_exact(n):
            out = b""
            while len(out) < n:
                b = conn.recv(n - len(out))
                if not b:
                    return out
                out += b
            return out

        (ln,) = struct.unpack(">I", recv_exact(4))
        recv_exact(ln - 4)
        conn.sendall(auth(0) + ready())
        while True:
            tag = recv_exact(1)
            if not tag:
                return
            (ln,) = struct.unpack(">I", recv_exact(4))
            sql = recv_exact(ln - 4).rstrip(b"\x00").decode()
            if log is not None:
                log.append((conn_no, sql))
            if sql.startswith("SELECT c.table_schema"):
                payload = row_desc(
                    [b"table_schema", b"table_name", b"column_name",
                     b"ordinal_position", b"data_type", b"udt_name"]
                )
                for r in cat_cols:
                    payload += data_row(list(r))
                conn.sendall(payload + cmd_complete() + ready())
                continue
            if sql.startswith("SELECT tc.table_schema"):
                payload = row_desc(
                    [b"table_schema", b"table_name", b"column_name",
                     b"ordinal_position"]
                )
                for r in cat_pks:
                    payload += data_row(list(r))
                conn.sendall(payload + cmd_complete() + ready())
                continue
            if sql.startswith("SELECT n.nspname"):  # replident fallback
                payload = row_desc(
                    [b"table_schema", b"table_name", b"column_name",
                     b"ordinal_position"]
                )
                for r in cat_ident:
                    payload += data_row(list(r))
                conn.sendall(payload + cmd_complete() + ready())
                continue
            if sql.startswith("SELECT cn.nspname"):  # partition parents
                payload = row_desc(
                    [b"child_schema", b"child_name", b"parent_schema",
                     b"parent_name"]
                )
                for r in cat_parents:
                    payload += data_row(list(r))
                conn.sendall(payload + cmd_complete() + ready())
                continue
            if not sql.startswith("COPY"):
                conn.sendall(cmd_complete(b"SET") + ready())
                continue
            shard = 0 if "% 2 = 0" in sql else 1
            payload = shard_rows[shard]
            conn.sendall(
                copy_out_resp(3) + copy_data(payload) + copy_done()
                + cmd_complete(b"COPY 2") + ready()
            )
            break
        conn.recv(1)
        conn.close()

    for i in range(n_conns):
        conn, _addr = srv.accept()
        threading.Thread(target=one, args=(conn, i), daemon=True).start()


def test_pgcopy_source_discovers_schema_and_pk(spark):
    """transfer.yaml with NO schema: and NO pk: — the source reads
    information_schema over its own wire session, maps types through
    the published matrix and shards on the discovered PK."""
    from transferia_spark.sources import build_source

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    log: list = []
    threading.Thread(
        target=_serve_pg_discovery_and_copy, args=(srv, 3, log),
        daemon=True,
    ).start()

    src = build_source(
        "pgcopy",
        live={"host": "127.0.0.1", "port": port, "user": "u",
              "database": "db", "timeout": 10.0},
        tables={"public.items": {"n_shards": 2}},
    )
    [tid] = src.table_list(spark)
    df = src.load_table(spark, tid)
    assert [
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    ] == [("id", "bigint"), ("name", "string"), ("bal", "double")]
    rows = {r.id: (r.name, r.bal) for r in df.collect()}
    srv.close()
    assert rows == {1: ("alice", 10.5), 3: ("c,d", None),
                    2: ("bob", -0.25), 4: (None, 7.0)}
    # the shard predicates used the DISCOVERED pk
    copies = [s for _c, s in log if s.startswith("COPY")]
    assert len(copies) == 2
    assert all('row("id")' in s for s in copies)
    # discovery ran exactly once (cached), on the first connection
    cats = [s for c, s in log if s.startswith("SELECT c.table_schema")]
    assert len(cats) == 1


def test_pgcopy_unknown_table_without_schema_is_loud(spark):
    from transferia_spark.sources import build_source

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    threading.Thread(
        target=_serve_pg_discovery_and_copy, args=(srv, 1), daemon=True
    ).start()
    src = build_source(
        "pgcopy",
        live={"host": "127.0.0.1", "port": port, "user": "u",
              "database": "db", "timeout": 10.0},
        tables={"public.nope": {}},
    )
    [tid] = src.table_list(spark)
    with pytest.raises(ValueError, match="public.nope"):
        src.load_table(spark, tid)
    srv.close()


# ------------------------------------------------------------ MySQL e2e


def _serve_mysql_discovery_and_select(srv: socket.socket, n_conns: int,
                                      log: list | None = None):
    from test_mysql_select import result_set
    from test_mysql_session import (
        encode_packet,
        handshake_payload,
        ok_packet,
    )

    shard_rows = {
        0: [[b"1", b"alice", b"10.5"], [b"3", None, b"0.25"]],
        1: [[b"2", b"bob", b"-1"], [b"4", b"d,quote", None]],
    }
    cat_cols = [
        [b"shop", b"items", b"bal", b"3", b"decimal(10,2)"],
        [b"shop", b"items", b"id", b"1", b"bigint(20)"],
        [b"shop", b"items", b"name", b"2", b"varchar(64)"],
    ]
    cat_cons = [
        [b"shop", b"items", b"id", b"1", b"PRIMARY"],
        [b"shop", b"items", b"name", b"1", b"uniq_name"],
    ]

    def one(conn: socket.socket, conn_no: int):
        def recv_exact(n):
            out = b""
            while len(out) < n:
                b = conn.recv(n - len(out))
                if not b:
                    return out
                out += b
            return out

        def recv_packet():
            head = recv_exact(4)
            ln = int.from_bytes(head[:3], "little")
            return recv_exact(ln)

        conn.sendall(encode_packet(handshake_payload(), 0))
        recv_packet()
        conn.sendall(encode_packet(ok_packet(), 2))
        while True:
            q = recv_packet()
            if not q:
                return
            sql = q[1:].decode()
            if log is not None:
                log.append((conn_no, sql))
            if sql.startswith("SELECT c.table_schema"):
                conn.sendall(result_set(
                    [b"table_schema", b"table_name", b"column_name",
                     b"ordinal_position", b"column_type"],
                    cat_cols,
                ))
                continue
            if sql.startswith("SELECT DISTINCT k.table_schema"):
                conn.sendall(result_set(
                    [b"table_schema", b"table_name", b"column_name",
                     b"ordinal_position", b"constraint_name"],
                    cat_cons,
                ))
                continue
            if not sql.startswith("SELECT"):
                conn.sendall(encode_packet(ok_packet(), 1))
                continue
            shard = 0 if "% 2 = 0" in sql else 1
            conn.sendall(
                result_set([b"id", b"name", b"bal"], shard_rows[shard])
            )
            break
        conn.recv(1)
        conn.close()

    for i in range(n_conns):
        conn, _addr = srv.accept()
        threading.Thread(target=one, args=(conn, i), daemon=True).start()


def test_mysqlselect_source_discovers_schema_and_pk(spark):
    from transferia_spark.sources import build_source

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    log: list = []
    threading.Thread(
        target=_serve_mysql_discovery_and_select, args=(srv, 3, log),
        daemon=True,
    ).start()

    src = build_source(
        "mysqlselect",
        live={"host": "127.0.0.1", "port": port, "user": "repl",
              "database": "shop", "timeout": 10.0},
        tables={"shop.items": {"n_shards": 2}},
    )
    [tid] = src.table_list(spark)
    df = src.load_table(spark, tid)
    assert [
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    ] == [("id", "bigint"), ("name", "string"), ("bal", "double")]
    rows = {r.id: (r.name, r.bal) for r in df.collect()}
    srv.close()
    assert rows == {1: ("alice", 10.5), 3: (None, 0.25),
                    2: ("bob", -1.0), 4: ("d,quote", None)}
    # shard predicates used the DISCOVERED pk (PRIMARY wins over the
    # unique key that also arrived)
    sels = [s for _c, s in log
            if s.startswith("SELECT `id`")]
    assert len(sels) == 2 and all("`id`" in s for s in sels)
    # the discovery statements scoped to the live database
    cats = [s for _c, s in log if "information_schema.columns" in s]
    assert len(cats) == 1 and "c.table_schema = 'shop'" in cats[0]


def test_discover_whole_database_when_no_tables_configured(spark):
    """TableList parity: an empty tables: section transfers every
    discovered table."""
    from transferia_spark.sources import build_source

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    threading.Thread(
        target=_serve_mysql_discovery_and_select, args=(srv, 1),
        daemon=True,
    ).start()
    src = build_source(
        "mysqlselect",
        live={"host": "127.0.0.1", "port": port, "user": "repl",
              "database": "shop", "timeout": 10.0},
        tables={},
    )
    tids = src.table_list(spark)
    srv.close()
    assert [t.fqtn() for t in tids] == ["shop.items"]


# --------------------------------------------------- session-level units


def test_discover_pg_tables_over_fake_session():
    class FakeSession:
        def __init__(self):
            self.sqls = []

        def simple_query(self, sql):
            self.sqls.append(sql)
            if sql.startswith("SELECT c.table_schema"):
                return [
                    {"table_schema": "public", "table_name": "t",
                     "column_name": "id", "ordinal_position": "1",
                     "data_type": "bigint", "udt_name": "int8"},
                    {"table_schema": "public", "table_name": "t",
                     "column_name": "tags", "ordinal_position": "2",
                     "data_type": "ARRAY", "udt_name": "_text"},
                ]
            if sql.startswith("SELECT tc.table_schema"):
                return [
                    {"table_schema": "public", "table_name": "t",
                     "column_name": "id", "ordinal_position": "1"},
                ]
            return []  # replident / partition-parent catalogs: empty

    out = discover_pg_tables(FakeSession(), schema="public")
    assert out["public.t"]["pk"] == ["id"]
    st = out["public.t"]["schema"]
    assert isinstance(st["id"].dataType, T.LongType)
    assert isinstance(st["tags"].dataType, T.StringType)  # ARRAY → any


def test_pg_discovery_key_fallbacks():
    """r10 (≈ postgres/schema.go:318-447): a PK-less table falls back
    to its unique replica-identity index, a partition child inherits
    the parent's key (walking multi-level trees), and a PK always wins
    over both."""
    from transferia_spark.sources.schema_discovery import (
        pg_partition_parents_sql,
        pg_replident_keys_sql,
        resolve_pg_keys,
    )

    def col(t, name, pos):
        return {"table_schema": "s", "table_name": t,
                "column_name": name, "ordinal_position": str(pos),
                "data_type": "bigint", "udt_name": "int8"}

    class FakeSession:
        def simple_query(self, sql):
            if sql.startswith("SELECT c.table_schema"):
                return [
                    col("haspk", "id", 1),
                    col("ident_only", "a", 1), col("ident_only", "b", 2),
                    col("child", "id", 1),
                    col("grandchild", "id", 1),
                    col("keyless", "x", 1),
                ]
            if sql.startswith("SELECT tc.table_schema"):
                return [{"table_schema": "s", "table_name": "haspk",
                         "column_name": "id", "ordinal_position": "1"}]
            if sql.startswith("SELECT n.nspname"):
                # replident on (b, a) — INDEX key order, not ordinal
                return [
                    {"table_schema": "s", "table_name": "ident_only",
                     "column_name": "b", "ordinal_position": "1"},
                    {"table_schema": "s", "table_name": "ident_only",
                     "column_name": "a", "ordinal_position": "2"},
                ]
            if sql.startswith("SELECT cn.nspname"):
                return [
                    {"child_schema": "s", "child_name": "child",
                     "parent_schema": "s", "parent_name": "haspk"},
                    {"child_schema": "s", "child_name": "grandchild",
                     "parent_schema": "s", "parent_name": "child"},
                ]
            return []

    out = discover_pg_tables(FakeSession(), schema="s")
    assert out["s.haspk"]["pk"] == ["id"]
    assert out["s.ident_only"]["pk"] == ["b", "a"]  # index key order
    assert out["s.child"]["pk"] == ["id"]        # inherited from parent
    assert out["s.grandchild"]["pk"] == ["id"]   # two levels up
    assert out["s.keyless"]["pk"] == []          # honest: no key at all
    # a parent-loop (corrupt catalog) terminates instead of recursing
    assert resolve_pg_keys({}, {}, {"a.t": "a.t"}, "a.t") == []
    # statement shape: pg_catalog reads filter the schema literal
    assert "nspname = 'shop'" in pg_replident_keys_sql("shop")
    assert "indisreplident" in pg_replident_keys_sql(None)
    assert "pg_inherits" in pg_partition_parents_sql("shop")


def test_pgcopy_pk_less_table_shards_on_replica_identity(spark):
    """Loopback e2e (r9 verdict next #5 'done' bar): a table with NO
    primary key discovers its replica-identity key over the wire and
    shards its COPY on it."""
    from transferia_spark.sources import build_source

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    log: list = []
    threading.Thread(
        target=_serve_pg_discovery_and_copy, args=(srv, 3, log),
        daemon=True,
    ).start()

    src = build_source(
        "pgcopy",
        live={"host": "127.0.0.1", "port": port, "user": "u",
              "database": "db", "timeout": 10.0},
        tables={"public.audit": {"n_shards": 2}},
    )
    [tid] = src.table_list(spark)
    df = src.load_table(spark, tid)
    assert df.count() == 4
    srv.close()
    copies = [s for _c, s in log if s.startswith("COPY")]
    assert len(copies) == 2
    # shard predicates use the DISCOVERED replica-identity key
    assert all('row("aid")' in s for s in copies)


def test_discover_mysql_tables_over_fake_session():
    class FakeSession:
        def query_rows(self, sql):
            if "information_schema.columns" in sql:
                names = ["table_schema", "table_name", "column_name",
                         "ordinal_position", "column_type"]
                rows = [[b"shop", b"o", b"id", b"1",
                         b"bigint(20) unsigned"],
                        [b"shop", b"o", b"blob_c", b"2", b"longblob"]]
            else:
                names = ["table_schema", "table_name", "column_name",
                         "ordinal_position", "constraint_name"]
                rows = [[b"shop", b"o", b"id", b"1", b"PRIMARY"]]
            return names, iter(rows)

    out = discover_mysql_tables(FakeSession(), database="shop")
    assert out["shop.o"]["pk"] == ["id"]
    st = out["shop.o"]["schema"]
    assert isinstance(st["id"].dataType, T.DecimalType)  # uint64 exact
    assert isinstance(st["blob_c"].dataType, T.BinaryType)


def test_replicate_stream_schema_resolves_from_discovery(spark, tmp_path):
    """r9: replication.source may omit schema/schema_file when the
    snapshot source discovers the catalog — one schema authority for
    seed AND stream (TableSchema-at-activation parity)."""
    import json
    import os

    from transferia_spark.plans.config import transfer_from_yaml
    from transferia_spark.streaming.bucketed_table import (
        BucketedParquetTable,
    )
    from transferia_spark.tasks.replicate import run_replication

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(8)
    port = srv.getsockname()[1]
    threading.Thread(
        target=_serve_pg_discovery_and_copy, args=(srv, 3), daemon=True
    ).start()

    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    target = str(tmp_path / "target")
    spec = transfer_from_yaml(f"""
type: SNAPSHOT_AND_INCREMENT
src:
  type: pgcopy
  params:
    live: {{host: 127.0.0.1, port: {port}, user: u, database: db,
           timeout: 10.0}}
    tables:
      public.items: {{n_shards: 2}}
dst: {{type: file, params: {{path: {tmp_path}/unused, format: parquet}}}}
replication:
  source:
    format: binlogjson
    path: {binlog}
  target: {{kind: bucketed, root: {target}, keys: [id], n_buckets: 4}}
""")
    run_replication(
        spark, spec, state_dir=str(tmp_path / "state"), once=True,
        retry_interval=0.0,
    )
    with open(os.path.join(binlog, "000.jsonl"), "w") as f:
        f.write(json.dumps(
            {"action": "insert", "log_file": "b.1", "log_pos": 9,
             "row_idx": 0,
             "after": {"id": 9, "name": "new", "bal": 3.5}}) + "\n")
    run_replication(
        spark, spec, state_dir=str(tmp_path / "state"), once=True,
        retry_interval=0.0,
    )
    srv.close()
    t = BucketedParquetTable(spark, target, keys=["id"], n_buckets=4)
    got = {r.id: (r.name, r.bal) for r in t.read().collect()}
    # 4 seeded rows (discovered schema) + 1 streamed row (same schema,
    # resolved from the SAME discovery — no schema: anywhere)
    assert got[9] == ("new", 3.5) and len(got) == 5
