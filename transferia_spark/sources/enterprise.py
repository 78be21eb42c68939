"""Oracle and Greenplum snapshot sources (JDBC-dialect variants).

≈ transferia/transferia:

- Oracle: ``pkg/providers/oracle/provider/sharding_storage.go:149``
  (``ShardTable`` splits a table into disjoint ROWID intervals built
  from extent metadata — "no full-scan, no ORA_HASH computation",
  :23) and ``pkg/providers/oracle/schema/column.go:253-258`` (ROWID
  columns are selected as ``ROWIDTOCHAR(c)`` server-side). Flashback
  consistency (``AS OF SCN``) is the Begin/EndSnapshot analog.
- Greenplum: ``pkg/providers/greenplum/storage.go`` reads per segment
  (each worker drains one segment), with gpfdist parallel unload
  (``gpfdist_storage.go``) as the fast path. The Spark analog keeps
  the same decomposition: one JDBC partition per segment via
  ``gp_segment_id = i`` predicates; the gpfdist external-table DDL is
  generated for deployments that run gpfdist servers next to
  executors.

No Oracle/Greenplum server exists in this container: predicate and
ROWID-interval generation, select-list rewriting, and DDL assembly are
pure functions covered by unit tests; the read itself is the standard
``spark.read.jdbc`` connector call.

Scale: each predicate is one Spark input partition — a 1000-executor
cluster opens 1000 server-side cursors over non-overlapping physical
ranges (Oracle: extent-aligned ROWID intervals, Greenplum: segments),
which is the same parallel-unload strategy as the reference with
Spark's scheduler in place of the coordinator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from transferia_spark.schema.colschema import TableID
from transferia_spark.sources.base import Source, register_source

_B64 = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"


def _b64_fixed(value: int, width: int) -> str:
    """Oracle's base-64 alphabet, fixed-width big-endian 6-bit groups."""
    out = []
    for i in range(width - 1, -1, -1):
        out.append(_B64[(value >> (6 * i)) & 63])
    return "".join(out)


def encode_rowid(data_object_id: int, rel_file: int, block: int, row: int) -> str:
    """Extended ROWID, the public 18-char ``OOOOOOFFFBBBBBBRRR`` form:
    6 chars data-object id, 3 chars relative file number, 6 chars
    block, 3 chars row slot — what ``DBMS_ROWID.ROWID_CREATE``
    produces and ``ROWIDTOCHAR`` prints."""
    return (
        _b64_fixed(data_object_id, 6)
        + _b64_fixed(rel_file, 3)
        + _b64_fixed(block, 6)
        + _b64_fixed(row, 3)
    )


MAX_ROW_SLOT = (1 << 16) - 1  # row component is 16 bits


def rowid_range_predicates(
    data_object_id: int,
    extents: list[tuple[int, int, int]],
    blocks_per_shard: int,
) -> list[str]:
    """Disjoint ROWID-interval predicates from extent metadata
    (``sharding_storage.go:149``; extents come from ``DBA_EXTENTS``:
    (relative_fno, block_id, blocks) rows).

    Each predicate covers ``blocks_per_shard`` blocks of one extent —
    extent-aligned so every interval maps to a physical region and the
    scans never overlap or full-scan.
    """
    preds: list[str] = []
    for rel_file, block_id, blocks in extents:
        lo = block_id
        end = block_id + blocks
        while lo < end:
            hi = min(lo + blocks_per_shard, end)
            lo_rowid = encode_rowid(data_object_id, rel_file, lo, 0)
            hi_rowid = encode_rowid(data_object_id, rel_file, hi - 1, MAX_ROW_SLOT)
            preds.append(
                f"ROWID BETWEEN CHARTOROWID('{lo_rowid}') "
                f"AND CHARTOROWID('{hi_rowid}')"
            )
            lo = hi
    return preds


def ora_hash_predicates(n_shards: int) -> list[str]:
    """Metadata-free fallback sharding: ``ORA_HASH(ROWID, N-1) = i``.
    Each shard full-scans but filters server-side — the shape the
    reference explicitly avoids when extent metadata is readable
    (sharding_storage.go:23); kept for when DBA_EXTENTS is not
    grantable."""
    return [f"ORA_HASH(ROWID, {n_shards - 1}) = {i}" for i in range(n_shards)]


def oracle_select_list(columns: list[tuple[str, str]]) -> str:
    """Select list with ROWID/UROWID columns rewritten to
    ``ROWIDTOCHAR(c) AS c`` (column.go:253-258 — keeps the driver on
    the plain-VARCHAR path)."""
    parts = []
    for name, typ in columns:
        if typ.upper() in ("ROWID", "UROWID"):
            parts.append(f'ROWIDTOCHAR("{name}") AS "{name}"')
        else:
            parts.append(f'"{name}"')
    return ", ".join(parts)


@register_source
class OracleSnapshotSource(Source):
    """Sharded, optionally flashback-consistent Oracle snapshot read."""

    TYPE = "oracle"

    def __init__(
        self,
        url: str,
        user: str = "",
        password: str = "",
        tables: list[str] | None = None,
        flashback_scn: int | None = None,
        fetch_size: int = 10_000,
    ):
        self.url = url
        self.user = user
        self.password = password
        self.tables = tables or []
        self.flashback_scn = flashback_scn
        self.fetch_size = fetch_size

    def table_list(self, spark: SparkSession) -> list[TableID]:
        return [TableID(*t.split(".", 1)) if "." in t else TableID("", t) for t in self.tables]

    def dbtable(
        self,
        table: str,
        columns: list[tuple[str, str]] | None = None,
        where: str | None = None,
    ) -> str:
        """The ``dbtable`` subquery: select-list rewrite + AS OF SCN +
        pushdown filter, assembled server-side."""
        select = oracle_select_list(columns) if columns else "*"
        flashback = (
            f" AS OF SCN {self.flashback_scn}" if self.flashback_scn is not None else ""
        )
        q = f"(SELECT {select} FROM {table}{flashback}"
        if where:
            q += f" WHERE {where}"
        return q + ")"

    def load_table(
        self,
        spark: SparkSession,
        table: TableID,
        where: str | None = None,
        columns: list[tuple[str, str]] | None = None,
        predicates: list[str] | None = None,
    ) -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.dbtable(table.name, columns, where))
            .option("user", self.user)
            .option("password", self.password)
            .option("driver", "oracle.jdbc.OracleDriver")
            .option("fetchsize", str(self.fetch_size))
        )
        if predicates:
            return (
                spark.read.jdbc(
                    url=self.url,
                    table=self.dbtable(table.name, columns, where),
                    predicates=predicates,
                    properties={
                        "user": self.user,
                        "password": self.password,
                        "driver": "oracle.jdbc.OracleDriver",
                        "fetchsize": str(self.fetch_size),
                    },
                )
            )
        return reader.load()


def gp_segment_predicates(n_segments: int) -> list[str]:
    """One predicate per Greenplum segment; each Spark partition drains
    exactly one segment through the master — the reference's
    per-segment worker decomposition (storage.go: one chunk per
    segment)."""
    return [f"gp_segment_id = {i}" for i in range(n_segments)]


def gpfdist_external_table_ddl(
    table: str,
    columns: list[tuple[str, str]],
    locations: list[str],
    fmt: str = "TEXT",
) -> str:
    """DDL for the gpfdist parallel-unload path
    (``gpfdist_storage.go`` / ``gpfdist_table_sink.go``): a WRITABLE
    external table fanning segment output to gpfdist endpoints running
    beside the Spark executors, which then read the landed files with
    the normal file source."""
    cols = ", ".join(f'"{n}" {t}' for n, t in columns)
    locs = ", ".join(f"'{u}'" for u in locations)
    return (
        f'CREATE WRITABLE EXTERNAL TABLE "{table}__unload" ({cols}) '
        f"LOCATION ({locs}) FORMAT '{fmt}'"
    )


@register_source
class GreenplumSnapshotSource(Source):
    """Segment-parallel Greenplum snapshot read."""

    TYPE = "greenplum"

    def __init__(
        self,
        url: str,
        user: str = "",
        password: str = "",
        tables: list[str] | None = None,
        n_segments: int = 1,
        fetch_size: int = 10_000,
    ):
        self.url = url
        self.user = user
        self.password = password
        self.tables = tables or []
        self.n_segments = n_segments
        self.fetch_size = fetch_size

    def table_list(self, spark: SparkSession) -> list[TableID]:
        return [TableID(*t.split(".", 1)) if "." in t else TableID("", t) for t in self.tables]

    def load_table(
        self, spark: SparkSession, table: TableID, where: str | None = None
    ) -> DataFrame:
        preds = gp_segment_predicates(self.n_segments)
        if where:
            preds = [f"({p}) AND ({where})" for p in preds]
        return spark.read.jdbc(
            url=self.url,
            table=table.name,
            predicates=preds,
            properties={
                "user": self.user,
                "password": self.password,
                "driver": "org.postgresql.Driver",
                "fetchsize": str(self.fetch_size),
            },
        )


__all__ = [
    "OracleSnapshotSource",
    "GreenplumSnapshotSource",
    "encode_rowid",
    "rowid_range_predicates",
    "ora_hash_predicates",
    "oracle_select_list",
    "gp_segment_predicates",
    "gpfdist_external_table_ddl",
]
