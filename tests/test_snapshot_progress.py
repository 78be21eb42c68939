"""Snapshot resume via per-table/per-part progress
(≈ snapshot_table_progress_tracker.go: a failed multi-table load must
not restart from zero)."""

from __future__ import annotations

import os

import pytest

from transferia_spark.plans.transfer import TransferSpec, activate
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy
from transferia_spark.sinks.files import FileSink
from transferia_spark.sources.files import FileSource
from transferia_spark.tasks.progress import SnapshotProgress


def test_progress_store_tables_and_parts(tmp_path):
    p = SnapshotProgress(str(tmp_path / "prog.json"), operation_id="op1")
    assert not p.table_done("a")
    p.mark_table("a", rows=10)
    assert p.table_done("a") and not p.table_done("b")

    p.mark_part("b", "part-0")
    p.mark_part("b", "part-2")
    assert p.part_done("b", "part-0") and not p.part_done("b", "part-1")
    assert p.pending_parts("b", ["part-0", "part-1", "part-2", "part-3"]) == [
        "part-1", "part-3",
    ]
    # table completion is independent of part records
    assert not p.table_done("b")

    # operations are isolated
    other = SnapshotProgress(str(tmp_path / "prog.json"), operation_id="op2")
    assert not other.table_done("a")
    p.clear()
    assert not p.table_done("a")
    assert other._load() is not None  # file survives clear of one op


class _FlakySink(FileSink):
    """Fails the write of a named table once, then heals — simulating
    a snapshot dying partway through the table list."""

    def __init__(self, path, fail_table):
        super().__init__(path=path, format="parquet")
        self.fail_table = fail_table
        self.writes: list[str] = []

    def write(self, df, table):
        if table.name == self.fail_table:
            raise RuntimeError(f"injected failure on {table.name}")
        self.writes.append(table.name)
        super().write(df, table)


def test_activate_resumes_from_completed_tables(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    progress = SnapshotProgress(str(tmp_path / "progress.json"), operation_id="xfer-1")

    def spec(sink):
        return TransferSpec(
            src=FileSource(path=sf_dir, format="parquet",
                           tables=["nation", "region"]),
            dst=sink,
            cleanup=CleanupPolicy.DISABLED,
            progress=progress,
        )

    flaky = _FlakySink(out, fail_table="region")
    with pytest.raises(RuntimeError, match="injected"):
        activate(spark, spec(flaky))
    assert flaky.writes == ["nation"]          # nation committed before the crash
    assert progress.table_done("nation") and not progress.table_done("region")

    healed = _FlakySink(out, fail_table="<none>")
    written = activate(spark, spec(healed))
    assert healed.writes == ["region"]         # nation NOT re-read or re-written
    assert written["nation"] == -2             # reported as resumed-skip
    assert spark.read.parquet(os.path.join(out, "region")).count() == 5
    assert spark.read.parquet(os.path.join(out, "nation")).count() == 25
