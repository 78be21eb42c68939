"""JDBC upsert sink.

≈ the reference's PostgreSQL sink (``pkg/providers/postgres/sink.go``:
``INSERT ... ON CONFLICT DO UPDATE`` per batch; MySQL ``REPLACE`` in
``pkg/providers/mysql/sink.go``). Plain appends go through Spark's JDBC
writer (parallel per partition); upserts need dialect SQL executed per
partition over a DB-API connection — the connection factory is
injectable so tests can use an in-memory engine and production can use
psycopg/mysql drivers.

Delivery: at-least-once + idempotent upsert (the reference's contract,
docs/concepts/replication-techniques.md:9-12) — task retries re-run the
same idempotent statements.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from transferia_spark.cdc.changeitem import OP_COL, OP_DELETE
from transferia_spark.cdc.collapse import collapse
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, Sink, register_sink


def quote_ident(dialect: str, ident: str) -> str:
    """Quote one identifier per dialect; reject control chars outright.

    Values are parameterized everywhere, but identifiers come from
    config/schema and must be quoted too — a hostile or merely unusual
    column name must not break out of the statement (ADVICE r1).
    """
    if not ident or any(ord(ch) < 0x20 for ch in ident):
        raise ValueError(f"invalid SQL identifier {ident!r}")
    if dialect == "mysql":
        return "`" + ident.replace("`", "``") + "`"
    return '"' + ident.replace('"', '""') + '"'


def quote_table(dialect: str, table: TableID) -> str:
    parts = [p for p in (table.namespace, table.name) if p]
    return ".".join(quote_ident(dialect, p) for p in parts)


def upsert_sql(dialect: str, table: str, cols: list[str], keys: list[str]) -> str:
    """``table`` is already dialect-quoted (quote_table); cols/keys are raw."""
    q = lambda c: quote_ident(dialect, c)  # noqa: E731
    collist = ", ".join(q(c) for c in cols)
    ph = ", ".join(["%s"] * len(cols))
    if dialect == "postgres":
        updates = ", ".join(f"{q(c)} = EXCLUDED.{q(c)}" for c in cols if c not in keys)
        conflict = ", ".join(q(k) for k in keys)
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({ph}) "
            f"ON CONFLICT ({conflict}) DO UPDATE SET {updates}"
        )
    if dialect == "mysql":
        updates = ", ".join(f"{q(c)} = VALUES({q(c)})" for c in cols if c not in keys)
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({ph}) "
            f"ON DUPLICATE KEY UPDATE {updates}"
        )
    if dialect == "sqlite":
        updates = ", ".join(f"{q(c)} = excluded.{q(c)}" for c in cols if c not in keys)
        conflict = ", ".join(q(k) for k in keys)
        ph = ", ".join(["?"] * len(cols))
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({ph}) "
            f"ON CONFLICT ({conflict}) DO UPDATE SET {updates}"
        )
    raise ValueError(f"no upsert dialect {dialect!r}")


def delete_sql(dialect: str, table: str, keys: list[str]) -> str:
    ph = "?" if dialect == "sqlite" else "%s"
    cond = " AND ".join(f"{quote_ident(dialect, k)} = {ph}" for k in keys)
    return f"DELETE FROM {table} WHERE {cond}"


@register_sink
class JdbcSink(Sink):
    TYPE = "jdbc_upsert"

    def __init__(
        self,
        connect: Callable[[], object],
        dialect: str = "postgres",
        batch_size: int = 1000,
    ):
        """``connect`` returns a DB-API connection (created inside each
        task — connections never cross the serialization boundary)."""
        self.connect = connect
        self.dialect = dialect
        self.batch_size = batch_size

    def cleanup(self, table: TableID, policy: CleanupPolicy) -> None:
        if policy == CleanupPolicy.DISABLED:
            return
        conn = self.connect()
        cur = conn.cursor()
        tname = quote_table(self.dialect, table)
        if policy == CleanupPolicy.DROP:
            cur.execute(f"DROP TABLE IF EXISTS {tname}")
        elif policy == CleanupPolicy.TRUNCATE:
            cur.execute(f"DELETE FROM {tname}")
        conn.commit()
        conn.close()

    def write(self, df: DataFrame, table: TableID) -> None:
        self._apply(df, table, keys=None)

    def write_cdc(
        self,
        batch: DataFrame,
        table: TableID,
        keys: list[str],
        toast_aware: bool | None = None,
    ) -> None:
        """``toast_aware=None`` auto-detects partial-row markers on the
        batch; pass True/False to force (exposed per ADVICE r1 — the
        fold must not be unconditional)."""
        net = collapse(batch, keys, toast_aware=toast_aware)
        self._apply(net, table, keys=keys)

    def _apply(self, df: DataFrame, table: TableID, keys: list[str] | None) -> None:
        connect, dialect, batch_size = self.connect, self.dialect, self.batch_size
        tname = quote_table(dialect, table)
        cols = [c for c in df.columns if c not in (OP_COL, "_lsn", "_counter")]
        has_op = OP_COL in df.columns

        def per_partition(rows):
            conn = connect()
            cur = conn.cursor()
            ups = upsert_sql(dialect, tname, cols, keys) if keys else (
                f"INSERT INTO {tname} "
                f"({', '.join(quote_ident(dialect, c) for c in cols)}) VALUES "
                f"({', '.join(['?' if dialect == 'sqlite' else '%s'] * len(cols))})"
            )
            dels = delete_sql(dialect, tname, keys) if keys else None
            buf_u, buf_d = [], []

            def flush():
                if buf_u:
                    cur.executemany(ups, buf_u)
                    buf_u.clear()
                if buf_d:
                    cur.executemany(dels, buf_d)
                    buf_d.clear()

            for row in rows:
                if has_op and keys and row[OP_COL] == OP_DELETE:
                    buf_d.append(tuple(row[k] for k in keys))
                else:
                    buf_u.append(tuple(row[c] for c in cols))
                if len(buf_u) + len(buf_d) >= batch_size:
                    flush()
            flush()
            conn.commit()
            conn.close()

        df.foreachPartition(per_partition)
