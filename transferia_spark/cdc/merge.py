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
    has_partial_rows,
)
from transferia_spark.cdc.collapse import PRESENT_NET_COL, collapse


def merge_batch(
    target: DataFrame,
    batch: DataFrame,
    keys: list[str],
    toast_aware: bool | None = None,
) -> DataFrame:
    """Return the new target content after applying one CDC batch.

    ``batch`` is a ChangeItem DataFrame (``_op``/``_lsn``/``_counter``
    columns). Partial (TOAST) rows merge column-wise against the current
    target row: a column absent from every event for the key keeps the
    target's value, while a carried NULL genuinely overwrites — the
    distinction rides on collapse's per-key presence struct, not on
    value NULL-ness (ADVICE r1). ``toast_aware=None`` auto-detects from
    the batch's partial-row markers.
    """
    if toast_aware is None:
        toast_aware = has_partial_rows(batch)
    marked = has_partial_rows(batch)
    net = collapse(
        batch, keys, toast_aware=toast_aware, with_presence=toast_aware and marked
    )
    cols = list(target.columns)
    has = set(net.columns)  # batch may carry only a column subset
    presence = PRESENT_NET_COL in net.columns

    # Single full-outer join — the changelog is scanned & aggregated once
    # (a 3-way union of inner/anti/anti joins recomputes the aggregation
    # per branch and tripled wall-clock at sf0.1). The small side
    # broadcasts under AQE; at 100 TB both sides shuffle on the key once.
    t = target.alias("t")
    u = net.alias("u")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}"))
        cond = c if cond is None else cond & c
    joined = t.join(u, cond, "full_outer")
    matched = F.col(f"u.{OP_COL}").isNotNull()
    deleted = matched & (F.col(f"u.{OP_COL}") == OP_DELETE)

    def _merged(c: str):
        if c in keys:
            return F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c)
        if c not in has:
            return F.col(f"t.{c}").alias(c)
        if presence:
            # carried columns (incl. genuine NULLs) win; absent keep old
            return (
                F.when(
                    matched & F.col(f"u.{PRESENT_NET_COL}.{c}"), F.col(f"u.{c}")
                )
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        if toast_aware:
            # legacy no-marker fold: non-null wins, NULL keeps old
            return (
                F.when(matched, F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        return F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)

    return joined.filter(~deleted).select(*[_merged(c) for c in cols])


def merge_batch_clustered(
    target: DataFrame,
    batch: DataFrame,
    keys: list[str],
    cluster_col: str,
    cluster_expr,
    n_out: int,
    toast_aware: bool | None = None,
) -> DataFrame:
    """:func:`merge_batch` re-expressed as a ONE-EXCHANGE plan for
    bucket-clustered writers (r10, the CDC fixed-cost squeeze).

    The join formulation shuffles the target twice per merge: once on
    the key for the full-outer join, then again on the bucket for the
    one-file-per-bucket write. But the bucket IS a function of the key,
    so both frames union first, take ONE ``repartition(n_out,
    cluster)`` exchange, and the per-key pairing happens in a
    ``groupBy(cluster, *keys)`` hash aggregate that Catalyst proves
    needs no further exchange (HashPartitioning(cluster) ⊆ the required
    clustering — verified in the plan test). Output stays partitioned
    by the cluster column: the caller writes sorted bucket files with
    no additional shuffle. groupBy's NULL-keys-group-together matches
    the join's eqNullSafe semantics; per-column TOAST/presence rules
    are identical to :func:`merge_batch`'s ``_merged``.

    ``cluster_expr(df) -> Column`` computes the cluster id from the key
    columns; target rows are unique per key (table invariant), so
    ``first(ignorenulls)`` pairs the ≤1 target row with the ≤1
    collapsed net row exactly like the join did.
    """
    from pyspark.sql import types as T

    if toast_aware is None:
        toast_aware = has_partial_rows(batch)
    marked = has_partial_rows(batch)
    net = collapse(
        batch, keys, toast_aware=toast_aware,
        with_presence=toast_aware and marked,
    )
    cols = list(target.columns)
    has = set(net.columns)
    presence = PRESENT_NET_COL in net.columns

    t_payload = [c for c in cols if c not in keys]
    u_payload = [c for c in net.columns if c not in keys]
    t_struct = T.StructType(
        [f for f in target.schema.fields if f.name in t_payload]
    )
    u_struct = T.StructType(
        [f for f in net.schema.fields if f.name in u_payload]
    )

    t_tag = target.select(
        *[F.col(k) for k in keys],
        (F.struct(*[F.col(c) for c in t_payload]) if t_payload
         else F.struct(F.lit(0).alias("_z"))).alias("_t"),
        F.lit(None).cast(
            u_struct if u_struct.fields else
            T.StructType([T.StructField("_z", T.IntegerType())])
        ).alias("_u"),
    )
    u_tag = net.select(
        *[F.col(k) for k in keys],
        F.lit(None).cast(
            t_struct if t_struct.fields else
            T.StructType([T.StructField("_z", T.IntegerType())])
        ).alias("_t"),
        (F.struct(*[F.col(c) for c in u_payload]) if u_payload
         else F.struct(F.lit(0).alias("_z"))).alias("_u"),
    )
    un = t_tag.unionByName(u_tag)
    un = un.withColumn(cluster_col, cluster_expr(un)).repartition(
        max(1, n_out), F.col(cluster_col)
    )
    agg = un.groupBy(cluster_col, *keys).agg(
        F.first("_t", ignorenulls=True).alias("_t"),
        F.first("_u", ignorenulls=True).alias("_u"),
    )
    matched = F.col("_u").isNotNull()
    deleted = matched & (F.col(f"_u.{OP_COL}") == OP_DELETE)

    def _merged(c: str):
        if c not in has:
            return F.col(f"_t.{c}").alias(c)
        if presence:
            return (
                F.when(
                    matched & F.col(f"_u.{PRESENT_NET_COL}.{c}"),
                    F.col(f"_u.{c}"),
                )
                .otherwise(F.col(f"_t.{c}"))
                .alias(c)
            )
        if toast_aware:
            return (
                F.when(
                    matched,
                    F.coalesce(F.col(f"_u.{c}"), F.col(f"_t.{c}")),
                )
                .otherwise(F.col(f"_t.{c}"))
                .alias(c)
            )
        return (
            F.when(matched, F.col(f"_u.{c}"))
            .otherwise(F.col(f"_t.{c}"))
            .alias(c)
        )

    return agg.filter(~deleted).select(
        F.col(cluster_col),
        *[F.col(c) if c in keys else _merged(c) for c in cols],
    )


def apply_changelog(
    target: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    toast_aware: bool | None = None,
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
