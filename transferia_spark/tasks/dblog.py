"""DBLog-style chunked snapshot interleaved with CDC.

≈ ``pkg/dblog/signal_table.go:32-35`` + ``incremental_iterator.go:61``
in transferia/transferia (itself the Netflix DBLog algorithm): to
snapshot a huge table WITHOUT a long-lived consistent-read transaction
while CDC is flowing, read the table in key-ordered chunks; around each
chunk read, record low/high watermarks in the CDC stream; any key that
changed between the watermarks is dropped from the chunk (the CDC event
is newer and will be applied anyway).

Spark formulation: the chunk is a key-range scan (pushdown predicate);
"changed between watermarks" is an anti-join of the chunk against the
CDC events with ``low_lsn < _lsn <= high_lsn``. There is no signal
table — LSN watermarks come from the CDC frame itself (checkpointed
offsets), which is the same information the signal-table round-trip
exists to obtain.

Scale: each chunk is an independent bounded scan + broadcast-able
anti-join (events-in-window side is small by construction: it is one
chunk interval's worth of changes); chunks parallelize freely because
correctness never depends on chunk order — the final CDC apply wins on
every overlapping key.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import LSN_COL
from transferia_spark.cdc.merge import apply_changelog


def chunk_ranges(
    df: DataFrame, key: str, chunk_size: int
) -> list[tuple[object, object]]:
    """Key-range chunk bounds via approximate quantiles (one pass;
    ≈ the reference's chunk iterator walking the PK index)."""
    n = df.count()
    if n == 0:
        return []
    chunks = max(1, (n + chunk_size - 1) // chunk_size)
    if chunks == 1:
        return [(None, None)]
    probs = [i / chunks for i in range(1, chunks)]
    qs = df.approxQuantile(key, probs, 0.01)
    bounds = [None, *qs, None]
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def snapshot_chunks(
    table: DataFrame,
    cdc: DataFrame,
    key: str,
    chunk_size: int = 100_000,
) -> Iterator[DataFrame]:
    """Yield per-chunk snapshot frames with changed-in-window keys
    dropped (the DBLog watermark rule).

    ``cdc`` carries ``_lsn``; the window for a chunk is (min, max) lsn
    observed at chunk read time — here the full CDC frame the caller
    passes, which in a live run is the slice between the low/high
    watermark offsets of that chunk's trigger."""
    for lo, hi in chunk_ranges(table, key, chunk_size):
        chunk = table
        if lo is not None:
            chunk = chunk.filter(F.col(key) > F.lit(lo))
        if hi is not None:
            chunk = chunk.filter(F.col(key) <= F.lit(hi))
        changed = cdc.select(key).distinct()
        yield chunk.join(changed, on=key, how="left_anti")


def chunked_snapshot_with_cdc(
    table: DataFrame,
    cdc: DataFrame,
    keys: list[str],
    chunk_size: int = 100_000,
) -> DataFrame:
    """Full DBLog flow: union the watermark-filtered chunks, then apply
    the CDC log on top — every key lands exactly once with its newest
    value (chunk value if untouched, CDC value if changed)."""
    key = keys[0]
    parts = list(snapshot_chunks(table, cdc, key, chunk_size))
    if not parts:
        base = table.limit(0)
    else:
        base = parts[0]
        for p in parts[1:]:
            base = base.unionByName(p)
    live = cdc
    if LSN_COL not in cdc.columns:
        live = cdc.withColumn(LSN_COL, F.lit(0))
    return apply_changelog(base, live, keys)
