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


def test_late_event_does_not_regress_open_session_bounds():
    """A cross-batch late event (timestamp <= the open session's last)
    joins the session without shrinking session_end or blocking the
    gap check; an earlier-than-start straggler extends start downward."""
    import pandas as pd

    from transferia_spark.streaming.sessionize import make_sessionizer

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self._v, self.exists = None, False

        def setTimeoutDuration(self, ms):
            pass

    fn = make_sessionizer(gap_seconds=10)
    state = FakeState()

    def batch(ts_seconds, values):
        return pd.DataFrame(
            {"ts": pd.to_datetime(ts_seconds, unit="s"), "value": values}
        )

    # batch 1: events at t=100 and t=105 open a session
    list(fn((1,), iter([batch([100, 105], [1.0, 1.0])]), state))
    start, last, n, total = state.get
    assert (start, last, n) == (100_000_000, 105_000_000, 2)

    # batch 2: a LATE event at t=98 — session_end must stay 105,
    # start extends to 98, count/total grow
    list(fn((1,), iter([batch([98], [1.0])]), state))
    start, last, n, total = state.get
    assert (start, last, n, total) == (98_000_000, 105_000_000, 3, 3.0)

    # the gap check still measures from the true end: t=114 (within
    # 10s of 105) continues the session; t=130 closes it
    list(fn((1,), iter([batch([114], [1.0])]), state))
    out = list(fn((1,), iter([batch([130], [1.0])]), state))
    (emitted,) = out
    assert emitted["session_start"].iloc[0] == pd.Timestamp(98, unit="s")
    assert emitted["session_end"].iloc[0] == pd.Timestamp(114, unit="s")
    assert emitted["n_events"].iloc[0] == 4
