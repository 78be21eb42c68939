"""ChangeItem-as-DataFrame: column conventions for CDC streams.

The reference's universal unit is the ChangeItem
(``pkg/abstract/changeitem/change_item.go:27-80`` in
transferia/transferia): kind (insert/update/delete), LSN, commit time,
counter-within-tx, the row values, and the old key pre-image. In Spark
the natural representation is a DataFrame where the payload columns are
the table's columns and the change-log metadata rides in reserved
``_``-prefixed columns (Debezium-style):

=============  ====================================================
column         meaning
=============  ====================================================
``_op``        'i' | 'u' | 'd'  (insert / update / delete)
``_lsn``       long — source log sequence number
``_counter``   int — position within the transaction
``_commit_ts`` timestamp — source commit time
``_tx_id``     string — optional transaction id
``_before``    struct — pre-image (old PK values at minimum)
=============  ====================================================

Ordering contract: events for one key are totally ordered by
``(_lsn, _counter)`` — the same guarantee parsequeue's ordered ack gives
the reference (``pkg/parsequeue/parsequeue.go``). Global order across
keys is never required, which is what makes the model shard-able to
1000 executors: ``repartition(pk)`` + ``sortWithinPartitions(_lsn,
_counter)`` reproduces every guarantee the reference relies on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OP_COL = "_op"
LSN_COL = "_lsn"
COUNTER_COL = "_counter"
COMMIT_TS_COL = "_commit_ts"
TX_COL = "_tx_id"
BEFORE_COL = "_before"

META_COLS = (OP_COL, LSN_COL, COUNTER_COL, COMMIT_TS_COL, TX_COL, BEFORE_COL)

OP_INSERT = "i"
OP_UPDATE = "u"
OP_DELETE = "d"
# control kinds (``changeitem/kind.go:9-45``) — these never reach row
# pipelines in the Spark engine; job structure replaces them. Kept for
# sink protocols that need explicit table-load brackets.
OP_TRUNCATE = "truncate"
OP_DDL = "ddl"


def payload_columns(df: DataFrame) -> list[str]:
    """The table's real columns (everything that isn't CDC metadata)."""
    return [c for c in df.columns if c not in META_COLS]


def seq_column() -> Column:
    """Total per-key order: (lsn, counter) packed into one sortable struct."""
    return F.struct(F.col(LSN_COL), F.col(COUNTER_COL))


def as_inserts(df: DataFrame, lsn_start: int = 0) -> DataFrame:
    """Wrap a snapshot DataFrame as an insert-only change stream."""
    return (
        df.withColumn(OP_COL, F.lit(OP_INSERT))
        .withColumn(LSN_COL, F.lit(lsn_start).cast("long"))
        .withColumn(COUNTER_COL, F.lit(0))
    )


def keys_changed(df: DataFrame, keys: list[str]) -> Column:
    """Did an UPDATE move the primary key (``change_item.go:237-286``)?

    True when ``_before`` carries a key value differing from the new row.
    Such updates must apply as delete-old-key + insert-new-key.
    """
    cond = F.lit(False)
    for k in keys:
        old = F.col(f"{BEFORE_COL}.{k}")
        cond = cond | (old.isNotNull() & (old != F.col(k)))
    return (F.col(OP_COL) == OP_UPDATE) & cond


def is_toasted(df: DataFrame, keys: list[str]) -> Column:
    """Update carrying only a column subset (PG TOAST,
    ``change_item.go:297-311``). Convention: absent columns are NULL and
    a ``_toasted`` boolean marks partial rows; sinks must merge
    column-wise instead of replacing the row."""
    if "_toasted" in df.columns:
        return F.col("_toasted")
    return F.lit(False)


def split_rows_and_controls(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """≈ middleware NonRowSeparator (``middlewares/nonrow_separator.go``)."""
    is_row = F.col(OP_COL).isin([OP_INSERT, OP_UPDATE, OP_DELETE])
    return df.filter(is_row), df.filter(~is_row)
