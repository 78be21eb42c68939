"""Greenplum gpfdist parallel-load sink.

≈ transferia/transferia ``pkg/providers/greenplum/gpfdist_sink.go`` +
``gpfdist_table_sink.go`` + ``ddl_operations.go``:
- data flows into Greenplum through gpfdist: segments pull rows in
  parallel from gpfdist servers via a READABLE EXTERNAL TABLE —
  the only bulk path that engages every segment at once;
- the load is transactional: rows land in a temporary table first;
  DoneTableLoad commits by ``INSERT INTO target(cols) SELECT cols
  FROM tmp`` then drops the temp table (``processDoneTableLoad:107``,
  ``InsertFromSelectQuery:160``, ``DropTableQuery:166``) — generated
  columns are excluded from the column list
  (``InsertQueryColumns:146``);
- cleanup policy maps to DROP/TRUNCATE of the target.

Spark-first split of responsibilities:
- Spark writes each partition as a gpfdist TEXT-format part file
  (tab-separated, ``\\N`` nulls, ``\\``/tab/newline escaped) into the
  staging directory — planned as ONE Catalyst ``concat_ws`` column, so
  serialization is JVM-side and parallel;
- gpfdist servers (deployment infrastructure, pointed at the staging
  dir) serve those parts to the segments;
- the DDL/commit sequence runs through an injectable SQL executor
  (psycopg/JDBC in production; a recorder in tests — no Greenplum in
  this environment).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import COUNTER_COL, LSN_COL, OP_COL
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, Sink, register_sink

_SYSTEM_COLS = (OP_COL, LSN_COL, COUNTER_COL, "_commit_ts", "_tx_id", "_before", "_batch")


def pg_name(table: TableID) -> str:
    ns = table.namespace or "public"
    return f'"{ns}"."{table.name}"'


def tmp_name(table: TableID) -> str:
    # UNQUALIFIED on purpose: temporary relations live only in
    # pg_temp — `CREATE TEMPORARY TABLE "public"."x"` is an error in
    # PG/Greenplum ("cannot create temporary relation in non-temporary
    # schema"). The namespace is folded into the name for uniqueness.
    ns = table.namespace or "public"
    return f'"tmp_{ns}_{table.name}"'


def ext_name(table: TableID) -> str:
    ns = table.namespace or "public"
    return f'"{ns}"."ext_{table.name}"'


def readable_external_table_ddl(
    table: TableID, columns: list[tuple[str, str]], locations: list[str]
) -> str:
    """READABLE EXTERNAL TABLE over gpfdist endpoints — the load-side
    twin of the storage's WRITABLE DDL; TEXT format with ``\\N`` nulls,
    matching the part files Spark writes."""
    cols = ", ".join(f'"{n}" {t}' for n, t in columns)
    locs = ", ".join(f"'{u}'" for u in locations)
    return (
        f"CREATE READABLE EXTERNAL TABLE {ext_name(table)} ({cols}) "
        f"LOCATION ({locs}) "
        f"FORMAT 'TEXT' (DELIMITER E'\\t' NULL E'\\\\N')"
    )


def insert_from_select(dst: str, src: str, columns: list[str]) -> str:
    """≈ ``InsertFromSelectQuery`` (ddl_operations.go:160)."""
    cols = ", ".join(f'"{c}"' for c in columns)
    return f"INSERT INTO {dst}({cols}) SELECT {cols} FROM {src}"


def gpfdist_text_line(df: DataFrame, cols: list[str]) -> F.Column:
    """One TEXT-format line per row as a single Catalyst column:
    backslash, tab, and newline escaped; NULL → ``\\N``."""
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        s = F.regexp_replace(s, r"\\", r"\\\\")
        s = F.regexp_replace(s, "\t", r"\\t")
        s = F.regexp_replace(s, "\n", r"\\n")
        parts.append(F.coalesce(s, F.lit(r"\N")))
    return F.concat_ws("\t", *parts)


@register_sink
class GreenplumGpfdistSink(Sink):
    """Stage part files → external-table load → transactional swap."""

    TYPE = "greenplum_gpfdist"

    def __init__(
        self,
        staging_dir: str,
        gpfdist_urls: list[str] | None = None,
        sql_executor: Callable[[str], None] | None = None,
        generated_cols: list[str] | None = None,
    ):
        self.staging_dir = staging_dir
        self.gpfdist_urls = gpfdist_urls or ["gpfdist://localhost:8080"]
        self.sql = sql_executor or (lambda q: (_ for _ in ()).throw(
            NotImplementedError(
                "greenplum sink needs a SQL executor (psycopg/JDBC "
                "connection to the master); inject via sql_executor"
            )
        ))
        self.generated_cols = set(generated_cols or ())

    def _data_cols(self, df: DataFrame) -> list[str]:
        return [
            c for c in df.columns
            if c not in _SYSTEM_COLS and c not in self.generated_cols
        ]

    def stage(self, df: DataFrame, table: TableID) -> str:
        """Write the partitioned TEXT part files gpfdist will serve."""
        cols = self._data_cols(df)
        path = f"{self.staging_dir}/{table.name}"
        df.select(gpfdist_text_line(df, cols).alias("value")).write.mode(
            "overwrite"
        ).text(path)
        return path

    def write(self, df: DataFrame, table: TableID) -> None:
        cols = self._data_cols(df)
        col_types = [
            (f.name, _pg_type(f.dataType.simpleString()))
            for f in df.schema.fields
            if f.name in cols
        ]
        self.stage(df, table)
        locations = [
            f"{u.rstrip('/')}/{table.name}/*" for u in self.gpfdist_urls
        ]
        target, tmp, ext = pg_name(table), tmp_name(table), ext_name(table)
        self.sql(f"DROP EXTERNAL TABLE IF EXISTS {ext}")
        self.sql(readable_external_table_ddl(table, col_types, locations))
        self.sql(
            f"CREATE TEMPORARY TABLE {tmp} AS SELECT * FROM {target} LIMIT 0"
        )
        self.sql(insert_from_select(tmp, ext, cols))
        # commit swap: one transactional insert into the target
        self.sql("BEGIN")
        self.sql(insert_from_select(target, tmp, cols))
        self.sql(f"DROP TABLE IF EXISTS {tmp}")
        self.sql("COMMIT")
        self.sql(f"DROP EXTERNAL TABLE IF EXISTS {ext}")

    def cleanup(self, table: TableID, policy: CleanupPolicy) -> None:
        if policy == CleanupPolicy.DISABLED:
            return
        if policy == CleanupPolicy.DROP:
            self.sql(f"DROP TABLE IF EXISTS {pg_name(table)}")
        else:
            self.sql(f"TRUNCATE TABLE {pg_name(table)}")


def _pg_type(simple: str) -> str:
    return {
        "bigint": "bigint", "int": "integer", "smallint": "smallint",
        "tinyint": "smallint", "double": "double precision", "float": "real",
        "string": "text", "boolean": "boolean", "date": "date",
        "timestamp": "timestamp", "binary": "bytea",
    }.get(simple, "text" if not simple.startswith("decimal") else simple)


__all__ = [
    "GreenplumGpfdistSink",
    "readable_external_table_ddl",
    "insert_from_select",
    "gpfdist_text_line",
]
