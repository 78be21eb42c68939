"""Gap sessionization: the applyInPandasWithState streaming operator
vs its batch window/lag oracle."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.streaming.readers import file_stream
from transferia_spark.streaming.sessionize import sessionize_batch, sessionize_stream

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

EVENTS = [
    # key 1: two sessions separated by a 2h gap; second stays open
    {"user_id": 1, "ts": "2026-01-01T00:00:00", "value": 1.0},
    {"user_id": 1, "ts": "2026-01-01T00:10:00", "value": 2.0},
    {"user_id": 1, "ts": "2026-01-01T02:30:00", "value": 4.0},
    # key 2: single open session
    {"user_id": 2, "ts": "2026-01-01T00:05:00", "value": 8.0},
]


def _write(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(dirpath, f"{name}.json"))


def test_batch_sessionize_fold(spark):
    df = spark.createDataFrame(
        [(r["user_id"], r["ts"].replace("T", " "), r["value"]) for r in EVENTS],
        ["user_id", "ts_s", "value"],
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    out = sessionize_batch(df, "user_id", "ts", "value", gap_seconds=3600)
    rows = {(r.key, r.session_start.isoformat()): r for r in out.collect()}
    assert len(rows) == 3
    s1 = rows[(1, "2026-01-01T00:00:00")]
    assert s1.n_events == 2 and s1.total_value == 3.0
    assert s1.session_end.isoformat() == "2026-01-01T00:10:00"
    s2 = rows[(1, "2026-01-01T02:30:00")]
    assert s2.n_events == 1 and s2.total_value == 4.0
    assert rows[(2, "2026-01-01T00:05:00")].total_value == 8.0


def test_stream_sessionize_emits_closed_then_timed_out_sessions(spark, tmp_path):
    """Key 1's first session closes from the in-batch gap; the two
    still-open sessions are flushed by the processing-time idle timeout
    on a later microbatch."""
    import time

    src = str(tmp_path / "ev")
    _write(src, "b0", EVENTS)
    stream = file_stream(spark, src, SCHEMA, fmt="json")
    sessions = sessionize_stream(
        stream, "user_id", "ts", "value", gap_seconds=3600, idle_timeout_ms=2000
    )
    got = []

    def sink(df, bid):
        got.extend(df.collect())

    q = (
        sessions.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 120
    while len(got) < 3 and time.time() < deadline:
        time.sleep(1)
    q.stop()
    by_start = {(r.key, r.session_start.isoformat()): r for r in got}
    assert len(by_start) == 3, got
    s1 = by_start[(1, "2026-01-01T00:00:00")]
    assert s1.n_events == 2 and s1.total_value == 3.0
    assert s1.session_end.isoformat() == "2026-01-01T00:10:00"
    assert by_start[(1, "2026-01-01T02:30:00")].n_events == 1
    assert by_start[(2, "2026-01-01T00:05:00")].total_value == 8.0
