"""Bucket-scoped CDC merge (streaming/bucketed_table.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import COUNTER_COL, LSN_COL, OP_COL
from transferia_spark.cdc.merge import merge_batch
from transferia_spark.streaming.bucketed_table import (
    BUCKET_COL,
    BucketedCdcApplySink,
    BucketedParquetTable,
)

CH_SCHEMA = (
    f"id long, v string, {OP_COL} string, {LSN_COL} long, {COUNTER_COL} long"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


@pytest.fixture()
def table(spark, tmp_path):
    return BucketedParquetTable(
        spark, str(tmp_path / "bt"), keys=["id"], n_buckets=8
    )


def test_merge_sequence_matches_full_table_merge(spark, table):
    b1 = _batch(spark, [(i, f"a{i}", "i", 1, i) for i in range(50)])
    b2 = _batch(
        spark,
        [(3, "updated", "u", 2, 0), (7, None, "d", 2, 1), (100, "new", "i", 2, 2)],
    )
    table.merge(b1)
    table.merge(b2)
    got = {(r.id, r.v) for r in table.read().collect()}

    ref = merge_batch(
        merge_batch(
            spark.createDataFrame([], "id long, v string"), b1, ["id"]
        ),
        b2,
        ["id"],
    )
    want = {(r.id, r.v) for r in ref.collect()}
    assert got == want
    assert (100, "new") in got and (3, "updated") in got
    assert all(i != 7 for i, _ in got)


def test_merge_rewrites_only_touched_buckets(spark, table):
    table.merge(_batch(spark, [(i, f"a{i}", "i", 1, i) for i in range(50)]))
    v1 = table.version()
    table.merge(_batch(spark, [(3, "up", "u", 2, 0)]))
    v2 = table.version()
    assert v2 == v1 + 1
    new_dirs = os.listdir(os.path.join(table.root, f"_v{v2}"))
    bucket_dirs = [d for d in new_dirs if d.startswith(f"{BUCKET_COL}=")]
    assert len(bucket_dirs) == 1  # only key 3's bucket rewrote
    # manifest still references v1 dirs for untouched buckets
    m = table.manifest()
    assert sorted(set(m.values())) == [v1, v2]
    assert table.read().count() == 50


def test_delete_can_empty_a_bucket(spark, table):
    table.merge(_batch(spark, [(1, "x", "i", 1, 0)]))
    table.merge(_batch(spark, [(1, None, "d", 2, 0)]))
    with pytest.raises(FileNotFoundError):
        table.read()  # the only bucket emptied → nothing to read


def test_gc_keeps_live_versions_across_window(spark, table):
    for lsn in range(5):
        table.merge(_batch(spark, [(1, f"v{lsn}", "u" if lsn else "i", lsn + 1, 0)]))
        table.merge(_batch(spark, [(2, f"w{lsn}", "u" if lsn else "i", lsn + 1, 0)]))
    # after many versions, the live manifest must still resolve fully
    rows = {(r.id, r.v) for r in table.read().collect()}
    assert rows == {(1, "v4"), (2, "w4")}


def test_sink_applies_batches(spark, table):
    sink = BucketedCdcApplySink(table)
    sink(_batch(spark, [(1, "a", "i", 1, 0), (2, "b", "i", 1, 1)]), 0)
    sink(_batch(spark, [(2, "b2", "u", 2, 0)]), 1)
    assert sink.batches_applied == 2
    assert {(r.id, r.v) for r in table.read().collect()} == {
        (1, "a"),
        (2, "b2"),
    }


def test_overwrite_then_merge(spark, table):
    snap = spark.createDataFrame(
        [(i, f"s{i}") for i in range(20)], "id long, v string"
    )
    table.overwrite(snap)
    assert table.read().count() == 20
    table.merge(_batch(spark, [(5, "changed", "u", 10, 0)]))
    got = {r.id: r.v for r in table.read().collect()}
    assert got[5] == "changed" and len(got) == 20


def test_bucket_assignment_stable_under_repartition(spark, table):
    b = _batch(spark, [(i, f"a{i}", "i", 1, i) for i in range(30)])
    table.merge(b.repartition(7))
    assert table.read().count() == 30
    col = table._bucket_of()
    a = {r[0] for r in b.select(col).distinct().collect()}
    c = {r[0] for r in b.repartition(3).select(col).distinct().collect()}
    assert a == c  # content-derived, retry/partitioning independent
