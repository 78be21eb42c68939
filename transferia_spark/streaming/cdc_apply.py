"""CDC apply path: foreachBatch → collapse → MERGE into a target table.

≈ the reference's replication sink pipeline (``sink_factory.go:97-197``
middleware order, PG sink upsert-by-PK, ClickHouse collapse): each
micro-batch is collapsed per key (``change_item_collapse.go``
semantics) and merged into the target with insert/update/delete +
TOAST partial-update handling.

Delivery contract (mirrors ``docs/concepts/replication-techniques.md``):
at-least-once delivery from the checkpointed source + idempotent MERGE
apply — re-processing a batch yields the same table state. Exactly-once
table swaps come from writing each new version to a fresh directory and
atomically repointing (the poor man's Delta commit; swap-level atomicity
is filesystem rename).

Scale notes: the merge joins target ⟗ batch on the key — batch side is
small per trigger and broadcasts under AQE; the target side shuffle is
avoided entirely when the target is bucketed by key on disk. Ordering:
within a micro-batch, collapse orders by (_lsn, _counter) per key;
across batches, checkpointed source order per partition — the same
per-key ordering guarantee the reference gets from parsequeue ordered
ack.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from transferia_spark.cdc.merge import merge_batch


class ConcurrentWriteError(RuntimeError):
    """A second writer raced the single-writer ParquetTable commit."""


class ParquetTable:
    """A versioned parquet-backed table with atomic swap.

    Layout: ``root/_v{n}/`` holds version n; ``root/_CURRENT`` names the
    live version. Readers read the named version; the writer prepares
    version n+1 in a fresh directory then atomically rewrites the
    pointer. Single-writer (one streaming query) by design — the same
    constraint the reference's per-transfer sink has.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def version(self) -> int:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def exists(self) -> bool:
        return self.version() >= 0

    def read(self, version: int | None = None) -> DataFrame:
        """Read the live version, or time-travel to an older retained
        one (``version=``). Retention is ``keep=2`` at write time — the
        window in which a consumer can pin the pre-batch snapshot for
        reprocessing/debugging, the same contract Delta's
        ``versionAsOf`` offers (bounded by VACUUM)."""
        v = self.version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"no current version in {self.root}")
        path = os.path.join(self.root, f"_v{v}")
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"version {v} not retained in {self.root} (gc keeps 2)"
            )
        return self.spark.read.parquet(path)

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """Write version+1 and atomically flip ``_CURRENT``.

        Single-writer is ENFORCED, not just documented (ADVICE r3: a
        compaction racing a streaming sink had both compute version()+1
        and one commit silently won, losing a batch): an O_EXCL
        advisory lock file brackets the write+flip, and a
        compare-and-swap check rejects the flip if ``_CURRENT`` moved
        under us — concurrent writers fail loudly with
        ``ConcurrentWriteError``."""
        base = self.version()
        lock = os.path.join(self.root, "_LOCK")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ConcurrentWriteError(
                f"another writer holds {lock}; ParquetTable is "
                "single-writer — serialize compact_table with the "
                "streaming sink (remove the stale lock only after a "
                "crashed writer)"
            ) from None
        try:
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            new_v = base + 1
            path = os.path.join(self.root, f"_v{new_v}")
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(path)
            if self.version() != base:  # CAS: pointer moved under us
                raise ConcurrentWriteError(
                    f"_CURRENT advanced past v{base} during overwrite of "
                    f"{self.root}; dropping v{new_v} instead of losing "
                    "the concurrent commit"
                )
            tmp = self._pointer + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(new_v))
            os.replace(tmp, self._pointer)  # atomic pointer swap
            self._gc(keep=2)
            return new_v
        finally:
            try:
                os.remove(lock)
            except FileNotFoundError:
                pass

    def _gc(self, keep: int) -> None:
        v = self.version()
        for name in os.listdir(self.root):
            if name.startswith("_v") and int(name[2:]) <= v - keep:
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)


class CdcApplySink:
    """foreachBatch sink: MERGE each micro-batch into a ParquetTable.

    Use with ``writeStream.foreachBatch(sink)``; idempotent per batch.
    ``max_retries`` re-attempts transient failures before surfacing the
    error to the streaming engine (≈ ``middlewares/retrier.go:17`` —
    fatal errors propagate immediately, Spark restarts the query from
    the checkpoint).
    """

    def __init__(
        self,
        table: ParquetTable,
        keys: list[str],
        toast_aware: bool | None = None,
        max_retries: int = 2,
    ):
        self.table = table
        self.keys = keys
        self.toast_aware = toast_aware
        self.max_retries = max_retries
        self.batches_applied = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        last_err: Exception | None = None
        for _ in range(self.max_retries + 1):
            try:
                self._apply(batch_df)
                self.batches_applied += 1
                return
            except FileNotFoundError:
                raise  # fatal: misconfigured target
            except Exception as e:  # transient (fs hiccup, OOM retry)
                last_err = e
        raise last_err

    def _apply(self, batch_df: DataFrame) -> None:
        if self.table.exists():
            target = self.table.read()
        else:
            target = batch_df.sparkSession.createDataFrame(
                [], self._target_schema(batch_df)
            )
        merged = merge_batch(
            target, batch_df, self.keys, toast_aware=self.toast_aware
        )
        # safe read-while-write: merged lazily reads _v{n} and the
        # overwrite streams into the fresh _v{n+1} directory; the
        # pointer swap happens only after the write commits
        self.table.overwrite(merged)

    def _target_schema(self, batch_df: DataFrame):
        from transferia_spark.cdc.changeitem import META_COLS

        keep = [f for f in batch_df.schema.fields if f.name not in META_COLS]
        from pyspark.sql import types as T

        return T.StructType(keep)
