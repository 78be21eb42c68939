"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The reference has no session operator (its stateful surface is the
CDC bufferer); this is the canonical example of the one Spark
primitive the rest of the engine never needs — arbitrary per-key state
with timeouts — included because a training-data/event pipeline wants
it (user sessions, request traces, conversation threads) and because
SURVEY §2.8 marks ``applyInPandasWithState`` as the custom-stateful
escape hatch.

Semantics: events group by ``key_col``; a session closes when no event
arrives within ``gap`` seconds of the last one (event time). Closed
sessions are emitted with start/end/count/sum. State per key is O(1)
(the open session's aggregates — never the events), so state-store
size is #active-keys, not #events.

Scale notes: state shards across executors by ``key_col`` hash
(``spark.sql.shuffle.partitions`` state partitions); processing-time
timeout finalizes idle sessions even when a key goes silent — without
it, state for dead keys would grow forever. The same fold, expressed
in batch as a window/lag pipeline, is the oracle path
(``sessionize_batch``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "key long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"


def make_sessionizer(gap_seconds: int, idle_timeout_ms: int = 60_000):
    """Build the applyInPandasWithState function for a gap threshold."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        gap_us = gap_seconds * 1_000_000
        if state.hasTimedOut:
            (start, last, n, total) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # ns → µs
        vals = rows["value"].astype("float64")
        # Interval-merge sweep (r4 verdict: batch↔stream parity for
        # very-late events): the open session is ONE interval item among
        # the batch's unit-interval events; sweep all items in start
        # order and chain adjacent items whose gap is ≤ the threshold.
        # Every cluster but the LAST in time closes and emits — so a
        # straggler a full gap before the open session's start becomes
        # its own earlier CLOSED session (what the globally-sorted batch
        # fold produces) instead of dragging the open session's start
        # downward, while gap-joining lates still merge in (distance ≤
        # gap, or inside the interval). Pinned contract: an event later
        # than its session's CLOSE (the session already emitted) starts
        # a new session — stream output then REFINES the batch sessions
        # (tests/test_sessionize.py property).
        items = [(int(t), int(t), 1, float(v)) for t, v in zip(ts_us, vals)]
        if state.exists:
            items.append(tuple(state.get))
        items.sort(key=lambda it: (it[0], it[1]))
        out = []
        cs, cl, cn, ct = items[0]
        for s, last_i, n_i, v_i in items[1:]:
            if s - cl <= gap_us:  # chains (or sits inside the cluster)
                cl, cn, ct = max(cl, last_i), cn + n_i, ct + v_i
            else:
                out.append((cs, cl, cn, ct))
                cs, cl, cn, ct = s, last_i, n_i, v_i
        state.update((int(cs), int(cl), int(cn), float(ct)))
        state.setTimeoutDuration(idle_timeout_ms)
        if out:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in out],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in out],
                    "n_events": [n for _, _, n, _ in out],
                    "total_value": [t for _, _, _, t in out],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    gap_seconds: int,
    idle_timeout_ms: int = 60_000,
) -> DataFrame:
    """Streaming gap sessionization; emits CLOSED sessions only."""
    keyed = events.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        make_sessionizer(gap_seconds, idle_timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    gap_seconds: int,
    exact_sum: bool = False,
) -> DataFrame:
    """Batch form of the same fold — the correctness oracle: a new
    session starts where the gap from the previous event exceeds the
    threshold (lag + running sum of boundaries = session id).
    ``exact_sum`` folds values through DECIMAL(18,2) (emitting DOUBLE)
    so cross-engine compares are order-independent."""
    keyed = events.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    w = Window.partitionBy("key").orderBy("ts")
    # NTZ timestamps reject a direct double cast; hop through TIMESTAMP
    # (UTC session zone → deterministic epoch seconds either way)
    secs = F.col("ts").cast("timestamp").cast("double")
    gap = secs - F.lag(secs).over(w)
    boundary = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    with_sess = keyed.withColumn(
        "_sess",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    total = (
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
        if exact_sum
        else F.sum("value")
    )
    return (
        with_sess.groupBy("key", "_sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            total.alias("total_value"),
        )
        .drop("_sess")
    )


__all__ = ["sessionize_stream", "sessionize_batch", "make_sessionizer"]
