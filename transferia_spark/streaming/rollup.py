"""Windowed streaming aggregation with watermarks (late-data policy).

The batch shape of this rollup is ``events_hourly_rollup`` in the
query inventory; this is its continuous form. Watermarking bounds
state: events later than ``late_threshold`` behind the max observed
event time are dropped and their windows finalized — Spark's built-in
answer to the reference's bufferer flush intervals for time-bucketed
sinks.

Scale notes: state lives in the executor state store partitioned by
(window, group key) — set `spark.sql.shuffle.partitions` to size
state shards; append output mode emits each window exactly once on
finalization, which is what downstream idempotent writers want.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    stream: DataFrame,
    ts_col: str,
    window_duration: str,
    group_cols: list[str],
    aggs: dict[str, Column],
    late_threshold: str = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) windowed aggregation.

    ``aggs``: output column name → aggregate Column (over the stream's
    columns). Works identically on batch DataFrames (no watermark
    applied) — the correctness oracle path.
    """
    if stream.isStreaming:
        stream = stream.withWatermark(ts_col, late_threshold)
    win = F.window(F.col(ts_col), window_duration, slide)
    out = stream.groupBy(win.alias("w"), *[F.col(c) for c in group_cols]).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *group_cols,
        *aggs.keys(),
    )
