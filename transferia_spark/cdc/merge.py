"""MERGE/upsert apply: collapse a CDC batch and apply it to a target.

The reference applies batches at sinks with per-PK upsert/delete
semantics (PG ``INSERT ... ON CONFLICT DO UPDATE`` in
``pkg/providers/postgres/sink.go``; ClickHouse collapse in
``pkg/providers/clickhouse/sink_shard.go:183``). Without a
transactional table format on the classpath (Delta/Iceberg), the
engine expresses MERGE as the standard anti-join + union plan — which
is exactly what those formats compile MERGE into anyway:

    target ⟕anti changed-keys  ∪  collapsed-upserts

Both sides shuffle on the key once; with AQE the small batch side
broadcasts. Idempotent by construction: re-applying the same batch
yields the same table (the at-least-once + idempotent-apply contract of
``docs/concepts/replication-techniques.md:9-12``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import (
    COUNTER_COL,
    LSN_COL,
    OP_COL,
    OP_DELETE,
    payload_columns,
)
from transferia_spark.cdc.collapse import collapse


def merge_batch(
    target: DataFrame,
    batch: DataFrame,
    keys: list[str],
    toast_aware: bool = True,
) -> DataFrame:
    """Return the new target content after applying one CDC batch.

    ``batch`` is a ChangeItem DataFrame (``_op``/``_lsn``/``_counter``
    columns). TOAST partial updates merge column-wise against the
    current target row (coalesce new-over-old).
    """
    net = collapse(batch, keys, toast_aware=toast_aware)
    cols = list(target.columns)
    ttypes = {f.name: f.dataType for f in target.schema.fields}
    upserts = net.filter(F.col(OP_COL) != OP_DELETE)
    has = set(upserts.columns)  # batch may carry only a column subset

    if toast_aware:
        # column-wise merge: new value wins when present, else keep old
        t = target.alias("t")
        u = upserts.alias("u")
        cond = None
        for k in keys:
            c = F.col(f"t.{k}") == F.col(f"u.{k}")
            cond = c if cond is None else cond & c
        merged_existing = t.join(u, cond, "inner").select(
            *[F.col(f"u.{k}").alias(k) for k in keys],
            *[
                (
                    F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")) if c in has else F.col(f"t.{c}")
                ).alias(c)
                for c in cols
                if c not in keys
            ],
        )
        new_keys = u.join(t, cond, "left_anti").select(
            *[F.col(c) for c in keys],
            *[
                (F.col(c) if c in has else F.lit(None).cast(ttypes[c])).alias(c)
                for c in cols
                if c not in keys
            ],
        )
        applied = merged_existing.unionByName(new_keys)
    else:
        applied = upserts.select(
            *[
                (F.col(c) if c in has else F.lit(None).cast(ttypes[c])).alias(c)
                for c in cols
            ]
        )

    touched = net.select(*keys)
    untouched = target.join(touched, keys, "left_anti")
    return untouched.unionByName(applied.select(*cols))


def apply_changelog(
    target: DataFrame, changelog: DataFrame, keys: list[str], toast_aware: bool = True
) -> DataFrame:
    """Apply a whole change log (possibly spanning many 'batches') in one
    pass — correctness is batch-size independent because collapse orders
    by (_lsn, _counter) globally per key."""
    return merge_batch(target, changelog, keys, toast_aware=toast_aware)


def snapshot_plus_changelog(
    snapshot: DataFrame, changelog: DataFrame, keys: list[str]
) -> DataFrame:
    """Consistent snapshot→replication handoff: drop changelog events at
    or below the snapshot LSN watermark per key, then apply the rest
    (SURVEY §7 hard-part 2: dedup overlap by (pk, lsn))."""
    if LSN_COL in snapshot.columns:
        wm = snapshot.groupBy(*keys).agg(F.max(LSN_COL).alias("_snap_lsn"))
        fresh = (
            changelog.join(wm, keys, "left")
            .filter(F.col("_snap_lsn").isNull() | (F.col(LSN_COL) > F.col("_snap_lsn")))
            .drop("_snap_lsn")
        )
        base = snapshot.drop(LSN_COL, COUNTER_COL, OP_COL)
    else:
        fresh = changelog
        base = snapshot
    return apply_changelog(base, fresh, keys)
