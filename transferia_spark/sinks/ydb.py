"""YDB sink: YQL batch upsert/delete planning + gated transport.

≈ transferia/transferia ``pkg/providers/ydb/sink.go``:

- type matrix YT→YQL (``ydbType:1271-1406``, incl. the column-oriented
  [OLAP] overrides: Bool→Uint8, Int8/16→Int32, Decimal→String, …)
- batch apply as declared-parameter YQL (``insertTemplate:56`` /
  ``deleteTemplate:72``): ``DECLARE $batch AS List<Struct<…>>;
  UPSERT INTO … SELECT … FROM AS_TABLE($batch)`` and a keys-equality
  DELETE
- table DDL (``createTableQueryTemplate:88``): row tables get
  ``UNIFORM_PARTITIONS`` (or ``AUTO_PARTITIONING_BY_SIZE``), column
  tables ``PARTITION BY HASH(keys)`` + ``STORE = COLUMN``
- chunking (``splitToChunks:713``): ≤10 000 rows AND ≤48 MiB per
  request (YDB's RPC limit is 64 MB)
- PK-changing updates become delete(old)+insert(new) BEFORE collapse
  (``processPKUpdate:731`` — YDB cannot update a primary key in place);
  our ``collapse`` does that rewrite internally
  (``normalize_pk_changes``)
- Truncate is implemented as Drop (``Push:626-663``)

Spark-first: collapse/merge planning and the YQL text are Catalyst +
pure functions; rows reach YDB through an injectable per-partition
executor (``executor(yql, rows)``), gated on the absent ``ydb`` SDK the
same way the Mongo/ClickHouse sinks gate their clients.
"""

from __future__ import annotations

import posixpath
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.cdc.changeitem import (
    BEFORE_COL,
    COUNTER_COL,
    LSN_COL,
    OP_COL,
    OP_DELETE,
    PRESENT_COL,
    REMOVED_COL,
)
from transferia_spark.cdc.collapse import (
    FULL_NET_COL,
    PRESENT_NET_COL,
    REMOVED_NET_COL,
    collapse,
)
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, Sink, register_sink

WRITE_BATCH_MAX_LEN = 10_000  # sink.go:46
WRITE_BATCH_MAX_SIZE = 48 * 1024 * 1024  # sink.go:47 — YDB RPC cap 64 MB

_SYSTEM_COLS = (
    OP_COL, LSN_COL, COUNTER_COL, "_commit_ts", "_tx_id", BEFORE_COL,
    PRESENT_COL, PRESENT_NET_COL, REMOVED_COL, REMOVED_NET_COL,
    FULL_NET_COL, "_table",
)

# YT logical type → YQL type (ydbType: sink.go:1361-1406, the
# dataType branch). (row_type, olap_override)
_YT_TO_YDB: dict[str, tuple[str, str | None]] = {
    "boolean": ("Bool", "Uint8"),
    "int8": ("Int32", None),
    "int16": ("Int32", None),
    "int32": ("Int32", None),
    "int64": ("Int64", None),
    "uint8": ("Uint8", None),
    "uint16": ("Uint32", None),
    "uint32": ("Uint32", None),
    "uint64": ("Uint64", None),
    "float": ("Float", None),
    "double": ("Double", None),
    "string": ("String", None),  # YT bytes → YDB String
    "utf8": ("Utf8", None),
    "date": ("Date", None),
    "datetime": ("Datetime", None),
    "timestamp": ("Timestamp", None),
    "interval": ("Interval", "Int64"),
    "any": ("Json", None),
}

# original-type overrides for ydb:-prefixed natives whose row/olap
# types differ from the plain matrix (ydbType: sink.go:1277-1358)
_NATIVE_OLAP_OVERRIDES = {
    "Bool": "Uint8",
    "Int8": "Int32",
    "Int16": "Int32",
    "Uint16": "Uint32",
    "Decimal": "String",
    "Interval": "Int64",
    "Uuid": "Utf8",
    "DyNumber": "String",
}


def ydb_type(
    data_type: str, original_type: str = "", column_oriented: bool = False
) -> str:
    """YQL type name for a column (``ydbType``, sink.go:1271).
    ``original_type`` of the form ``ydb:Xxx`` round-trips the native
    type; otherwise the YT matrix applies. Column-oriented (OLAP)
    tables take the documented narrowing overrides."""
    if original_type.startswith("ydb:"):
        native = original_type[4:]
        if column_oriented and native in _NATIVE_OLAP_OVERRIDES:
            return _NATIVE_OLAP_OVERRIDES[native]
        if native == "Decimal":
            return "Decimal(22,9)"
        return native
    row, olap = _YT_TO_YDB.get(data_type, ("Json", None))
    return (olap or row) if column_oriented else row


def _struct_decl(cols: list[tuple[str, str, bool]]) -> str:
    """``Struct<`c`:Type?>`` member list; ``?`` marks optional (NOT
    required) columns, matching the templates' ``.Optional``."""
    members = ",\n        ".join(
        f"`{name}`:{typ}{'' if required else '?'}" for name, typ, required in cols
    )
    return f"Struct<\n        {members}\n    >"


def insert_query(path: str, cols: list[tuple[str, str, bool]]) -> str:
    """``insertTemplate`` (sink.go:56-70): declared List<Struct> batch
    upserted via AS_TABLE — one server-side bulk per request."""
    names = ", ".join(f"`{n}`" for n, _, _ in cols)
    return (
        "--!syntax_v1\n"
        f"DECLARE $batch AS List<{_struct_decl(cols)}>;\n"
        f"UPSERT INTO `{path}` ({names})\n"
        f"SELECT {names} FROM AS_TABLE($batch)"
    )


def delete_query(path: str, key_cols: list[tuple[str, str, bool]]) -> str:
    """``deleteTemplate`` (sink.go:72-82): keys-equality delete with the
    key tuple declared as a Struct parameter."""
    conds = "\n".join(
        f"    and `{n}` = $batch.`{n}`" for n, _, _ in key_cols
    )
    return (
        "--!syntax_v1\n"
        f"DECLARE $batch AS {_struct_decl(key_cols)};\n"
        f"DELETE FROM `{path}`\nWHERE 1=1\n{conds}"
    )


def create_table_query(
    path: str,
    cols: list[tuple[str, str, bool]],
    keys: list[str],
    shard_count: int = 0,
    column_oriented: bool = False,
    compression: str = "off",
) -> str:
    """``createTableQueryTemplate`` (sink.go:88-123): row tables
    partition uniformly by key (or auto-partition by size); column
    (OLAP) tables hash-partition and STORE = COLUMN. Key columns of an
    OLAP table are NOT NULL by contract (``isPrimaryKey``)."""
    keyset = set(keys)
    col_lines = []
    for name, typ, required in cols:
        not_null = " NOT NULL" if (column_oriented and name in keyset) or required else ""
        col_lines.append(f"    `{name}` {typ}{not_null},")
    key_list = ", ".join(f"`{k}`" for k in keys)
    lines = ["--!syntax_v1", f"CREATE TABLE `{path}` ("]
    lines.extend(col_lines)
    lines.append(f"    PRIMARY KEY ({key_list})")
    if not column_oriented:
        lines.append(f'    , FAMILY default (COMPRESSION = "{compression}")')
    lines.append(")")
    if column_oriented:
        lines.append(f"PARTITION BY HASH({key_list})")
    with_opts = []
    if column_oriented:
        with_opts.append("STORE = COLUMN")
        if shard_count > 0:
            with_opts.append(
                f"AUTO_PARTITIONING_MIN_PARTITIONS_COUNT = {shard_count}"
            )
    elif shard_count > 0:
        with_opts.append(f"UNIFORM_PARTITIONS = {shard_count}")
    else:
        with_opts.append("AUTO_PARTITIONING_BY_SIZE = ENABLED")
    lines.append("WITH (\n    " + ",\n    ".join(with_opts) + "\n)")
    return "\n".join(lines)


def split_to_chunks(
    sizes: list[int],
    max_size: int = WRITE_BATCH_MAX_SIZE,
    max_len: int = WRITE_BATCH_MAX_LEN,
) -> list[tuple[int, int]]:
    """``splitToChunks`` (sink.go:713-729): contiguous [start, end)
    spans cut when a span reaches ``max_size`` bytes or ``max_len``
    rows — bounded RPC requests regardless of row width."""
    out: list[tuple[int, int]] = []
    acc = 0
    left = 0
    for right, s in enumerate(sizes):
        acc += s
        if acc >= max_size or right - left + 1 >= max_len:
            out.append((left, right + 1))
            acc = 0
            left = right + 1
    if left < len(sizes):
        out.append((left, len(sizes)))
    return out


def _default_executor(*_args, **_kwargs):
    raise NotImplementedError(
        "no YDB transport in this environment: install the `ydb` Python "
        "SDK and pass executor=ydb_sdk_executor(endpoint, database) — "
        "the YQL/batch planning is transport-independent"
    )


def spark_cols(df_schema: T.StructType, column_oriented: bool) -> list[tuple[str, str, bool]]:
    """(name, yql_type, required) triples from a Spark schema via the
    stored ColSchema metadata (originalType / required survive in
    StructField.metadata)."""
    from transferia_spark.schema.colschema import ColSchema

    out = []
    for f in df_schema.fields:
        if f.name in _SYSTEM_COLS:
            continue
        cs = ColSchema.from_struct_field(f)
        out.append(
            (
                f.name,
                ydb_type(cs.data_type, cs.original_type, column_oriented),
                cs.required,
            )
        )
    return out


@register_sink
class YdbSink(Sink):
    """Upsert/delete batch apply into YDB tables.

    ``executor(yql: str, rows: list[dict]) -> None`` is the injectable
    transport (tests record; production wires the ``ydb`` SDK's
    ``table.execute``). Planning runs in Spark: collapse nets the batch
    per key (PK-changing updates already rewritten delete+insert), rows
    partition by YDB table, and each executor-side partition cuts
    RPC-bounded chunks.
    """

    TYPE = "ydb"

    def __init__(
        self,
        database: str,
        endpoint: str = "",
        path_prefix: str = "",
        shard_count: int = 0,
        column_oriented: bool = False,
        cleanup: CleanupPolicy = CleanupPolicy.DROP,
        executor: Callable[[str, list[dict]], None] | None = None,
    ):
        self.database = database
        self.endpoint = endpoint
        self.path_prefix = path_prefix
        self.shard_count = shard_count
        self.column_oriented = column_oriented
        self.cleanup_policy = cleanup
        self.executor = executor or _default_executor

    # ----------------------------------------------------------- paths

    def table_path(self, table: TableID) -> str:
        parts = [self.database]
        if self.path_prefix:
            parts.append(self.path_prefix)
        parts.append(table.fqtn().replace(".", "/"))
        return posixpath.join(*parts)

    # --------------------------------------------------------- cleanup

    def cleanup(self, table: TableID, policy: CleanupPolicy) -> None:
        """Truncate is drop (Push: sink.go:631 — "Truncate - implemented
        as drop"); Disabled skips."""
        if policy == CleanupPolicy.DISABLED:
            return
        self.executor(f"DROP TABLE `{self.table_path(table)}`", [])

    # ----------------------------------------------------------- write

    def create_table(self, table: TableID, df_schema: T.StructType, keys: list[str]) -> None:
        cols = spark_cols(df_schema, self.column_oriented)
        self.executor(
            create_table_query(
                self.table_path(table),
                cols,
                keys,
                shard_count=self.shard_count,
                column_oriented=self.column_oriented,
            ),
            [],
        )

    def write(self, df: DataFrame, table: TableID) -> None:
        """Snapshot: every row upserts (idempotent re-runs)."""
        self._push_upserts(df, table)

    def write_cdc(self, batch: DataFrame, table: TableID, keys: list[str]) -> None:
        """Collapse the micro-batch (delete+insert rewrite for PK
        changes happens inside collapse), then apply net deletes as
        keys-equality DELETEs and the rest as one bulk UPSERT."""
        net = collapse(batch, keys)
        deletes = net.filter(F.col(OP_COL) == OP_DELETE).select(*keys)
        upserts = net.filter(F.col(OP_COL) != OP_DELETE).drop(
            *[c for c in _SYSTEM_COLS if c in net.columns]
        )
        self._push_deletes(deletes, table, keys)
        self._push_upserts(upserts, table)

    # ------------------------------------------------------- transport

    def _push_upserts(self, df: DataFrame, table: TableID) -> None:
        cols = spark_cols(df.schema, self.column_oriented)
        if not cols:
            return
        yql = insert_query(self.table_path(table), cols)
        names = [n for n, _, _ in cols]
        executor = self.executor
        df = df.select(*names)

        def per_partition(rows: Iterable) -> None:
            batch = [r.asDict(recursive=True) for r in rows]
            if not batch:
                return
            sizes = [sum(len(str(v)) for v in r.values()) for r in batch]
            for lo, hi in split_to_chunks(sizes):
                executor(yql, batch[lo:hi])

        df.foreachPartition(per_partition)

    def _push_deletes(self, df: DataFrame, table: TableID, keys: list[str]) -> None:
        key_cols = [c for c in spark_cols(df.schema, self.column_oriented) if c[0] in keys]
        if not key_cols:
            return
        yql = delete_query(self.table_path(table), key_cols)
        executor = self.executor

        def per_partition(rows: Iterable) -> None:
            batch = [r.asDict(recursive=True) for r in rows]
            if batch:
                executor(yql, batch)

        df.foreachPartition(per_partition)


__all__ = [
    "YdbSink",
    "ydb_type",
    "insert_query",
    "delete_query",
    "create_table_query",
    "split_to_chunks",
    "spark_cols",
    "WRITE_BATCH_MAX_LEN",
    "WRITE_BATCH_MAX_SIZE",
]
