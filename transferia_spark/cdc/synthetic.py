"""Deterministic synthetic change streams derived from the ``events``
test table — used by the correctness queries and the canon-sequence
tests (the driver's testdata has no native CDC feed, so we derive one
the oracle can reproduce in pure SQL).

Mapping: ``signup``→insert, ``error``→delete, everything else→update;
``event_id`` is the LSN (globally unique, monotone), key is ``user_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import COUNTER_COL, LSN_COL, OP_COL

# SQL fragment shared verbatim with DuckDB oracles
OP_CASE_SQL = (
    "CASE WHEN event_type = 'signup' THEN 'i' "
    "WHEN event_type = 'error' THEN 'd' ELSE 'u' END"
)


def events_changelog(events: DataFrame, key: str = "user_id", value: str = "value") -> DataFrame:
    """events → ChangeItem DataFrame keyed on ``key`` with one payload
    column ``value``."""
    return events.select(
        F.col("user_id").alias(key),
        F.col("value").alias(value),
        F.expr(OP_CASE_SQL).alias(OP_COL),
        F.col("event_id").alias(LSN_COL),
        F.lit(0).alias(COUNTER_COL),
    )
