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
# Partial-row (PG TOAST) markers. ``_toasted`` is a row-level boolean:
# on flagged rows a NULL payload value means "column absent" (carried
# from the previous version), NOT an explicit SET col = NULL. When a
# source can express both, it should emit ``_present`` instead — an
# array<string> of the column names actually carried by the row — which
# lets a partial row also contain a genuine NULL. The reference keeps
# the same distinction via per-item ColumnNames
# (``change_item_collapse.go`` compareColumns: absent-by-name vs
# present-with-NULL).
TOASTED_COL = "_toasted"
PRESENT_COL = "_present"
# Removal marker: an array<string> of column names the event REMOVED
# from the document (Mongo ``updateDescription.removedFields`` /
# ``$unset``). Removed columns must ALSO appear in ``_present`` — a
# removal is a carried write (it beats an older ``$set`` in the
# collapse fold) — with a NULL value; ``_removed`` is what lets a
# document sink emit a true ``$unset`` instead of an explicit null
# (≈ ``write_models.go makeUpdateModel:23-47``). Relational sinks may
# ignore it: there, removed ≡ SET col = NULL.
REMOVED_COL = "_removed"

META_COLS = (
    OP_COL,
    LSN_COL,
    COUNTER_COL,
    COMMIT_TS_COL,
    TX_COL,
    BEFORE_COL,
    TOASTED_COL,
    PRESENT_COL,
    REMOVED_COL,
)

#: every name the ChangeItem pipeline reserves END-TO-END: the meta
#: columns plus collapse's net-output columns. Readers reject payload
#: columns using any of these — a reserved-looking payload column
#: would either break the reader's tuple arity or die later in
#: collapse/merge/sinks with a confusing analysis error (code-review
#: r14: loud-at-the-source beats both).
RESERVED_NAMES = frozenset(META_COLS) | frozenset(
    {"_present_net", "_removed_net", "_full_net"}
)

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
    ``change_item.go:297-311``). A row is partial when the ``_toasted``
    boolean flags it or a ``_present`` column-name list is attached;
    sinks must merge such rows column-wise instead of replacing."""
    if PRESENT_COL in df.columns:
        return F.col(PRESENT_COL).isNotNull()
    if TOASTED_COL in df.columns:
        return F.coalesce(F.col(TOASTED_COL), F.lit(False))
    return F.lit(False)


def has_partial_rows(df: DataFrame) -> bool:
    """Does this frame declare a partial-row marker at all? Collapse and
    merge only do column-wise folding when the source marks partial rows
    — otherwise NULL always means NULL (ADVICE r1: last-non-null folding
    without a marker silently kept stale values on UPDATE ... SET col =
    NULL)."""
    return TOASTED_COL in df.columns or PRESENT_COL in df.columns


def column_present(df: DataFrame, c: str) -> Column:
    """Is payload column ``c`` actually carried by this row (vs absent
    from a partial/TOAST row)? Full rows carry every column, including
    genuine NULLs."""
    if PRESENT_COL in df.columns:
        return F.col(PRESENT_COL).isNull() | F.array_contains(
            F.col(PRESENT_COL), F.lit(c)
        )
    if TOASTED_COL in df.columns:
        # NULL-means-absent convention on flagged rows only: a _toasted
        # row cannot express SET col = NULL (use _present for that).
        return ~F.coalesce(F.col(TOASTED_COL), F.lit(False)) | F.col(c).isNotNull()
    return F.lit(True)


def split_rows_and_controls(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """≈ middleware NonRowSeparator (``middlewares/nonrow_separator.go``)."""
    is_row = F.col(OP_COL).isin([OP_INSERT, OP_UPDATE, OP_DELETE])
    return df.filter(is_row), df.filter(~is_row)
