"""Stream-stream and stream-static joins with bounded state.

The reference never joins streams (its replication path is per-table;
enrichment happens at the sink store). A training-data/analytics
pipeline does: click-to-purchase attribution, event-to-session
stitching, CDC-stream enrichment against a dimension snapshot. These
helpers encode the two shapes that stay O(watermark window) in state:

- ``interval_join``: both sides watermarked, and the join condition
  carries an explicit event-time interval (``right.ts`` within
  ``[left.ts - before, left.ts + after]``). The time bound is what
  lets Spark expire state — an unbounded-condition stream-stream join
  grows state forever and is refused for outer joins.
- ``enrich_static``: stream ⋈ batch dimension. No state at all: each
  micro-batch hash-joins against the (broadcast if small) static side;
  the dimension frame is re-resolved per batch when built from a
  versioned table, which is how slowly-changing dims stay current.

Both work identically on batch frames (no watermarks applied) — the
oracle path the correctness gate uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    before: str = "0 seconds",
    after: str = "1 hour",
    late_threshold: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join: match right rows whose ``right_ts``
    lies in ``[left_ts - before, left_ts + after]`` for equal keys.

    State bound: with both sides watermarked at ``late_threshold``,
    Spark retains only rows inside watermark + interval — the 100 TB/day
    stream shape. Key columns are taken from the LEFT side names; the
    right frame must carry the same names (alias upstream).
    """
    # fail fast on non-key name collisions: the rename-back below would
    # otherwise silently produce duplicate column names (ADVICE r3 —
    # the docstring pushed de-confliction to the caller, but the
    # failure mode was silent)
    clash = (set(right.columns) - set(on)) & set(left.columns)
    if clash:
        raise ValueError(
            f"interval_join: non-key right columns {sorted(clash)} collide "
            "with left columns — alias them upstream"
        )
    if left.isStreaming:
        left = left.withWatermark(left_ts, late_threshold)
    if right.isStreaming:
        right = right.withWatermark(right_ts, late_threshold)
    r = right.select(
        *[F.col(c).alias(f"_r_{c}") for c in right.columns]
    )
    cond = F.lit(True)
    for k in on:
        cond = cond & (F.col(k) == F.col(f"_r_{k}"))
    lt, rt = F.col(left_ts), F.col(f"_r_{right_ts}")
    cond = (
        cond
        & (rt >= lt - F.expr(f"INTERVAL {before}"))
        & (rt <= lt + F.expr(f"INTERVAL {after}"))
    )
    out = left.join(r, cond, how)
    # drop the duplicated key columns; restore right-side names (the
    # caller must de-conflict non-key names upstream)
    out = out.drop(*[f"_r_{k}" for k in on])
    for c in right.columns:
        if c not in on:
            out = out.withColumnRenamed(f"_r_{c}", c)
    return out


def enrich_static(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    broadcast_dim: bool = True,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join (stateless; per-micro-batch)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    within: str = "10 minutes",
) -> DataFrame:
    """Effectively-once delivery on top of an at-least-once source:
    drop repeated keys within the watermark window
    (``dropDuplicatesWithinWatermark`` — state expires with the
    watermark, unlike plain ``dropDuplicates`` whose state grows
    forever on a stream). The reference reaches the same contract via
    idempotent upsert at the sink (replication-techniques.md); this is
    the in-flight variant for APPEND-shaped sinks (files, queues) where
    no upsert key exists downstream.

    On a batch frame this is plain ``dropDuplicates(keys)`` — the
    oracle path.
    """
    if not stream.isStreaming:
        return stream.dropDuplicates(keys)
    if ts_col is None:
        raise ValueError("streaming dedup needs an event-time column")
    return stream.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
        keys
    )
