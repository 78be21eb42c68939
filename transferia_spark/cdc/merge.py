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
from transferia_spark.cdc.exprcache import cached_exprs


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
    def build():
        cols = list(target.columns)
        has = set(net.columns)  # batch may carry only a column subset
        presence = PRESENT_NET_COL in net.columns

        cond = None
        for k in keys:
            c = F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}"))
            cond = c if cond is None else cond & c
        matched = F.col(f"u.{OP_COL}").isNotNull()
        deleted = matched & (F.col(f"u.{OP_COL}") == OP_DELETE)

        def _merged(c: str):
            if c in keys:
                return F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c)
            if c not in has:
                return F.col(f"t.{c}").alias(c)
            if presence:
                # carried columns (incl. genuine NULLs) win; absent
                # keep old
                return (
                    F.when(
                        matched & F.col(f"u.{PRESENT_NET_COL}.{c}"),
                        F.col(f"u.{c}"),
                    )
                    .otherwise(F.col(f"t.{c}"))
                    .alias(c)
                )
            if toast_aware:
                # legacy no-marker fold: non-null wins, NULL keeps old
                return (
                    F.when(
                        matched, F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}"))
                    )
                    .otherwise(F.col(f"t.{c}"))
                    .alias(c)
                )
            return (
                F.when(matched, F.col(f"u.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )

        return cond, deleted, tuple(_merged(c) for c in cols)

    # expression trees memoized across micro-batches (see exprcache)
    mb_key = (
        # keyed on the BATCH schema: net's schema is a pure function of
        # it and asking net would force a per-batch analysis round trip
        "mb", target.schema.json(), batch.schema.json(),
        tuple(keys), bool(toast_aware), marked,
    )
    cond, deleted, merged = cached_exprs(mb_key, build)

    from transferia_spark.cdc.exprcache import fast_select

    # Single full-outer join — the changelog is scanned & aggregated once
    # (a 3-way union of inner/anti/anti joins recomputes the aggregation
    # per branch and tripled wall-clock at sf0.1). The small side
    # broadcasts under AQE; at 100 TB both sides shuffle on the key once.
    joined = target.alias("t").join(net.alias("u"), cond, "full_outer")
    return fast_select(joined.filter(~deleted), merged, mb_key + ("f",))


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
    bucket-clustered writers (r10; r11 fuses the collapse in too).

    The join formulation shuffles the batch twice per merge: once on
    the key for collapse's groupBy, then again (with the target) for
    the pairing/write. But collapse and pairing group by the SAME key,
    and the bucket is a function of the key — so the raw (pk-change-
    normalized) batch unions with the target directly, takes ONE
    ``repartition(n_out, cluster)`` exchange, and a single
    ``groupBy(cluster, *keys)`` hash aggregate does BOTH the collapse
    fold (max_by over the events' (_lsn, _counter), exactly
    :func:`transferia_spark.cdc.collapse.collapse`'s aggregates — the
    batch-row indicator rides on ``_op IS NOT NULL``, and ``max_by``
    ignores NULL orderings, so target rows never win a fold) and the
    target pairing (``first(_t, ignorenulls)``; target rows are unique
    per key). Catalyst proves the aggregate needs no further exchange
    (HashPartitioning(cluster) ⊆ the required clustering — plan test),
    and the output stays partitioned by the cluster column for the
    sorted bucket write. groupBy's NULL-keys-group-together matches the
    join's eqNullSafe; per-column TOAST/presence rules are identical to
    :func:`merge_batch`'s ``_merged`` (Hypothesis equivalence test).
    The whole expression set is memoized across micro-batches
    (exprcache; ~0.4 s of py4j calls per merge otherwise, r11 profile).
    """
    from pyspark.sql import types as T

    from transferia_spark.cdc.changeitem import (
        OP_INSERT,
        OP_UPDATE,
        column_present,
        payload_columns,
    )
    from transferia_spark.cdc.collapse import normalize_pk_changes

    if toast_aware is None:
        toast_aware = has_partial_rows(batch)
    marked = has_partial_rows(batch)
    target_sj = target.schema.json()
    batch_sj = batch.schema.json()
    # delete(old key)+insert(new key) rewriting is a narrow map
    # (explode) — no shuffle
    nb = normalize_pk_changes(batch, keys)

    def build():
        cols = list(target.columns)
        nb_types = {f.name: f.dataType for f in nb.schema.fields}
        flats = [c for c in nb.columns if c not in keys]
        t_payload = [c for c in cols if c not in keys]
        t_struct = T.StructType(
            [f for f in target.schema.fields if f.name in t_payload]
        )
        t_sel = (
            *[F.col(k) for k in keys],
            (F.struct(*[F.col(c) for c in t_payload]) if t_payload
             else F.struct(F.lit(0).alias("_z"))).alias("_t"),
            *[F.lit(None).cast(nb_types[c]).alias(c) for c in flats],
        )
        u_sel = (
            *[F.col(k) for k in keys],
            F.lit(None).cast(
                t_struct if t_struct.fields else
                T.StructType([T.StructField("_z", T.IntegerType())])
            ).alias("_t"),
            *[F.col(c) for c in flats],
        )

        is_b = F.col(OP_COL).isNotNull()  # batch-row indicator
        seq = F.when(is_b, F.struct(F.col(LSN_COL), F.col(COUNTER_COL)))
        payload = [c for c in payload_columns(nb) if c not in keys]
        pay_set = set(payload)
        presence = toast_aware and marked
        aggs = [
            F.first("_t", ignorenulls=True).alias("_t"),
            F.max_by(F.col(OP_COL), seq).alias("_last_op"),
        ]
        if OP_COL in cols:
            aggs.append(F.min_by(F.col(OP_COL), seq).alias("_first_op"))
        for c in cols:
            if c in (LSN_COL, COUNTER_COL) and c not in keys:
                # a target carrying CDC meta folds them like collapse:
                # max over the batch's events
                aggs.append(
                    F.max(F.when(is_b, F.col(c))).alias(f"_n_{c}")
                )
        for c in payload:
            # carried-ness per column — collapse()'s exact rules,
            # evaluated pre-aggregation on the union frame (target
            # rows excluded via the is_b gate / NULL seq)
            if toast_aware and marked:
                carried = is_b & column_present(nb, c)
            elif toast_aware:
                carried = is_b & F.col(c).isNotNull()
            else:
                carried = is_b
            aggs.append(
                F.max_by(F.col(c), F.when(carried, seq)).alias(f"_n_{c}")
            )
            if presence:
                aggs.append(
                    F.max(F.when(carried, F.lit(True))).alias(f"_has_{c}")
                )

        matched = F.col("_last_op").isNotNull()
        deleted = matched & (F.col("_last_op") == OP_DELETE)

        def _merged(c: str):
            if c == OP_COL:
                final_op = (
                    F.when(F.col("_last_op") == OP_DELETE, OP_DELETE)
                    .when(F.col("_first_op") == OP_INSERT, OP_INSERT)
                    .otherwise(OP_UPDATE)
                )
                return (
                    F.when(matched, final_op)
                    .otherwise(F.col(f"_t.{c}"))
                    .alias(c)
                )
            if c in (LSN_COL, COUNTER_COL):
                return (
                    F.when(matched, F.col(f"_n_{c}"))
                    .otherwise(F.col(f"_t.{c}"))
                    .alias(c)
                )
            if c not in pay_set:
                return F.col(f"_t.{c}").alias(c)
            v = F.col(f"_n_{c}")
            if presence:
                return (
                    F.when(
                        matched
                        & F.coalesce(F.col(f"_has_{c}"), F.lit(False)),
                        v,
                    )
                    .otherwise(F.col(f"_t.{c}"))
                    .alias(c)
                )
            if toast_aware:
                return (
                    F.when(matched, F.coalesce(v, F.col(f"_t.{c}")))
                    .otherwise(F.col(f"_t.{c}"))
                    .alias(c)
                )
            return F.when(matched, v).otherwise(F.col(f"_t.{c}")).alias(c)

        final = (
            F.col(cluster_col),
            *[F.col(c) if c in keys else _merged(c) for c in cols],
        )
        return t_sel, u_sel, tuple(aggs), deleted, final

    key = (
        "mbc", target_sj, batch_sj,
        tuple(keys), cluster_col, bool(toast_aware), marked,
    )
    t_sel, u_sel, aggs, deleted, final = cached_exprs(key, build)

    # jseq-cached ops: one gateway call per select/agg instead of one
    # per COLUMN (py4j list conversion, profiled r12)
    from transferia_spark.cdc.exprcache import (
        fast_group_agg,
        fast_select,
    )

    un = fast_select(target, t_sel, key + ("t",)).unionByName(
        fast_select(nb, u_sel, key + ("u",))
    )
    un = un.withColumn(cluster_col, cluster_expr(un)).repartition(
        max(1, n_out), F.col(cluster_col)
    )
    gcols = cached_exprs(
        key + ("gcols",),
        lambda: [F.col(cluster_col)] + [F.col(k) for k in keys],
    )
    agg = fast_group_agg(un, gcols, list(aggs), key + ("agg",))
    return fast_select(agg.filter(~deleted), final, key + ("f",))


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
