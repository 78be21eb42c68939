"""Incremental (cursor-based) snapshots.

≈ ``IncrementalStorage`` (``pkg/abstract/storage.go:354-357``,
``pkg/providers/postgres/incremental_storage.go`` in
transferia/transferia): each run reads ``WHERE cursor_col > last_state``
and commits the new max as state — delta snapshots by a monotone column.

State lives in a small JSON file (stand-in for the coordinator's state
store; on a cluster this would be a table or object-store key — the
interface is the same).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class IncrementalState:
    path: str

    def get(self, table: str) -> str | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f).get(table)

    def set(self, table: str, cursor: str) -> None:
        data = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                data = json.load(f)
        data[table] = cursor
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, self.path)


def incremental_read(
    df: DataFrame, cursor_col: str, state: IncrementalState, table: str
) -> tuple[DataFrame, str | None]:
    """Filter to rows past the stored cursor; returns (delta, new_cursor).

    Caller commits ``new_cursor`` via ``state.set`` only after the sink
    write succeeds — the same commit-after-delivery ordering the
    reference uses (``updateIncrementalState``, load_snapshot.go:228).
    """
    last = state.get(table)
    delta = df.filter(F.col(cursor_col) > F.lit(last)) if last is not None else df
    row = delta.agg(F.max(cursor_col).alias("m")).collect()[0]
    new_cursor = row["m"]
    return delta, (str(new_cursor) if new_cursor is not None else last)
