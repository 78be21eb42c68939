"""Structured Streaming: file-source CDC replication end-to-end,
watermarked rollups, idempotent apply, checkpoint resume."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.cdc.changeitem import COUNTER_COL, LSN_COL, OP_COL
from transferia_spark.operators import Transformation, build
from transferia_spark.streaming import (
    CdcApplySink,
    ParquetTable,
    ReplicationPipeline,
    file_stream,
    windowed_rollup,
)

CDC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField(OP_COL, T.StringType()),
        T.StructField(LSN_COL, T.LongType()),
        T.StructField(COUNTER_COL, T.LongType()),
    ]
)


def _write_batch(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, f"{name}.json"))


def _run_pipeline(spark, src, table_root, ckpt, transformation=None):
    table = ParquetTable(spark, table_root)
    sink = CdcApplySink(table, keys=["id"])
    pipe = ReplicationPipeline(
        stream=file_stream(spark, src, CDC_SCHEMA, fmt="json"),
        sink=sink,
        transformation=transformation,
        checkpoint_dir=ckpt,
    )
    pipe.run_available()
    return table, sink


def test_cdc_file_replication_end_to_end(spark, tmp_path):
    src = str(tmp_path / "incoming")
    _write_batch(
        src,
        "b0",
        [
            {"id": 1, "name": "a", "amount": 1.0, OP_COL: "i", LSN_COL: 1, COUNTER_COL: 0},
            {"id": 2, "name": "b", "amount": 2.0, OP_COL: "i", LSN_COL: 2, COUNTER_COL: 0},
            {"id": 1, "name": "a2", "amount": 1.5, OP_COL: "u", LSN_COL: 3, COUNTER_COL: 0},
        ],
    )
    table, sink = _run_pipeline(
        spark, src, str(tmp_path / "table"), str(tmp_path / "ckpt")
    )
    rows = {r.id: r for r in table.read().collect()}
    assert sink.batches_applied >= 1
    assert rows[1].name == "a2" and rows[1].amount == 1.5
    assert rows[2].name == "b"


def test_cdc_resume_from_checkpoint_applies_only_new(spark, tmp_path):
    src = str(tmp_path / "incoming")
    _write_batch(
        src,
        "b0",
        [{"id": 1, "name": "x", "amount": 0.0, OP_COL: "i", LSN_COL: 1, COUNTER_COL: 0}],
    )
    roots = (str(tmp_path / "table"), str(tmp_path / "ckpt"))
    table, _ = _run_pipeline(spark, src, *roots)
    v1 = table.version()

    # second run with NEW file only: delete id 1, insert id 3
    _write_batch(
        src,
        "b1",
        [
            {"id": 1, "name": None, "amount": None, OP_COL: "d", LSN_COL: 5, COUNTER_COL: 0},
            {"id": 3, "name": "z", "amount": 3.0, OP_COL: "i", LSN_COL: 6, COUNTER_COL: 0},
        ],
    )
    table, _ = _run_pipeline(spark, src, *roots)
    assert table.version() > v1
    ids = sorted(r.id for r in table.read().collect())
    assert ids == [3]  # id 1 deleted, only the new insert remains


def test_cdc_with_transform_chain(spark, tmp_path):
    src = str(tmp_path / "incoming")
    _write_batch(
        src,
        "b0",
        [
            {"id": 1, "name": "keep", "amount": 10.0, OP_COL: "i", LSN_COL: 1, COUNTER_COL: 0},
            {"id": 2, "name": "keep", "amount": -5.0, OP_COL: "i", LSN_COL: 2, COUNTER_COL: 0},
        ],
    )
    chain = Transformation().add(build("filter_rows", filters=["amount > 0"]))
    table, _ = _run_pipeline(
        spark, src, str(tmp_path / "table"), str(tmp_path / "ckpt"), chain
    )
    ids = sorted(r.id for r in table.read().collect())
    assert ids == [1]


def test_apply_is_idempotent(spark, tmp_path):
    table = ParquetTable(spark, str(tmp_path / "t"))
    sink = CdcApplySink(table, keys=["id"])
    batch = spark.createDataFrame(
        [(1, "a", 1.0, "i", 1, 0), (2, "b", 2.0, "i", 2, 0)], CDC_SCHEMA
    )
    sink(batch, 0)
    first = sorted(map(tuple, table.read().collect()))
    sink(batch, 0)  # replay the same batch
    second = sorted(map(tuple, table.read().collect()))
    assert first == second


def test_windowed_rollup_batch_parity(spark, sf_dir):
    from transferia_spark.session import load_tables

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    out = windowed_rollup(
        ev,
        ts_col="ts",
        window_duration="1 hour",
        group_cols=["event_type"],
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
    )
    got = out.agg(F.sum("n")).collect()[0][0]
    assert got == ev.count()
    assert out.columns == ["window_start", "window_end", "event_type", "n", "total"]


def test_windowed_rollup_streaming_with_watermark(spark, tmp_path):
    """Drive the rollup through an actual streaming query (file source,
    availableNow) and check window contents."""
    src = str(tmp_path / "ev")
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("k", T.StringType()),
         T.StructField("v", T.LongType())]
    )
    _write_batch(
        src,
        "e0",
        [
            {"ts": "2026-01-01T00:10:00", "k": "a", "v": 1},
            {"ts": "2026-01-01T00:20:00", "k": "a", "v": 2},
            {"ts": "2026-01-01T01:10:00", "k": "a", "v": 4},
        ],
    )
    stream = file_stream(spark, src, schema, fmt="json")
    rolled = windowed_rollup(
        stream, "ts", "1 hour", ["k"], {"n": F.count(F.lit(1)), "s": F.sum("v")}
    )
    got = []

    def sink(df, bid):
        got.extend(df.collect())

    q = (
        rolled.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    by_window = {(r.window_start.hour, r.k): (r.n, r.s) for r in got}
    assert by_window[(0, "a")] == (2, 3)
    assert by_window[(1, "a")] == (1, 4)


def test_parquet_table_gc_keeps_recent_versions(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    df = spark.range(3)
    for _ in range(4):
        t.overwrite(spark.range(3))
    assert t.version() == 3
    dirs = sorted(d for d in os.listdir(str(tmp_path / "t")) if d.startswith("_v"))
    assert dirs == ["_v2", "_v3"]  # older versions collected
    assert t.read().count() == 3
    _ = df
