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


class _FakeState:
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


def _drive(batches, gap_seconds):
    """Replay event batches through the sessionizer fold; returns the
    emitted sessions plus the final open state flushed — in µs tuples
    (start, end, n, total)."""
    import pandas as pd

    from transferia_spark.streaming.sessionize import make_sessionizer

    fn = make_sessionizer(gap_seconds=gap_seconds)
    state = _FakeState()
    out = []
    for b in batches:
        if not b:
            continue
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime([t for t, _ in b], unit="s"),
             "value": [v for _, v in b]}
        )
        for emitted in fn((1,), iter([pdf]), state):
            out.extend(
                (
                    int(r.session_start.timestamp() * 1e6),
                    int(r.session_end.timestamp() * 1e6),
                    int(r.n_events),
                    float(r.total_value),
                )
                for r in emitted.itertuples()
            )
    if state.exists:
        out.append(tuple(state.get))
    return sorted(out)


def _oracle(events, gap_seconds):
    """The globally-sorted batch fold — the spec sessionize_batch
    implements in Spark."""
    gap_us = gap_seconds * 1_000_000
    out = []
    cur = None
    for t, v in sorted(events):
        t_us = t * 1_000_000
        if cur is None:
            cur = [t_us, t_us, 1, float(v)]
        elif t_us - cur[1] > gap_us:
            out.append(tuple(cur))
            cur = [t_us, t_us, 1, float(v)]
        else:
            cur[1], cur[2], cur[3] = t_us, cur[2] + 1, cur[3] + float(v)
    if cur is not None:
        out.append(tuple(cur))
    return sorted(out)


def test_far_early_straggler_splits_into_own_closed_session():
    """r4 verdict: an event a full gap BEFORE the open session's start
    must close as its own earlier session (batch parity), not drag the
    open session's start downward."""
    gap = 10
    batches = [[(100, 1.0), (105, 1.0)], [(50, 2.0)]]
    assert _drive(batches, gap) == _oracle([(100, 1.0), (105, 1.0), (50, 2.0)], gap)
    # chained stragglers below start form ONE earlier session together
    batches = [[(100, 1.0)], [(50, 1.0), (55, 1.0), (58, 1.0)]]
    got = _drive(batches, gap)
    assert got == _oracle([(100, 1.0), (50, 1.0), (55, 1.0), (58, 1.0)], gap)
    # a straggler chain that reaches the open session merges into it
    batches = [[(100, 1.0)], [(85, 1.0), (93, 1.0)]]
    assert got != []  # sanity
    assert _drive(batches, gap) == _oracle([(100, 1.0), (85, 1.0), (93, 1.0)], gap)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _events_st = st.lists(
        st.tuples(st.integers(min_value=0, max_value=400),
                  st.just(1.0)),
        min_size=1, max_size=25, unique_by=lambda e: e[0],
    )

    @settings(max_examples=60, deadline=None)
    @given(events=_events_st, data=st.data())
    def test_property_ordered_splits_exact_parity(events, data):
        """Cutting the ts-sorted event sequence into arbitrary
        consecutive batches (any boundaries, even mid-session) must
        reproduce the batch fold EXACTLY."""
        ordered = sorted(events)
        cuts = data.draw(
            st.lists(st.integers(0, len(ordered)), max_size=4),
            label="cuts",
        )
        bounds = sorted({0, len(ordered), *cuts})
        batches = [ordered[a:b] for a, b in zip(bounds, bounds[1:])]
        assert _drive(batches, 10) == _oracle(events, 10)

    @settings(max_examples=60, deadline=None)
    @given(events=_events_st, data=st.data())
    def test_property_arbitrary_splits_refine_batch_sessions(events, data):
        """Pinned contract for lates beyond a closed session: under
        ARBITRARY batch assignment (any event in any batch — lateness
        beyond the gap included) the stream output REFINES the batch
        sessions: each stream session nests inside exactly one oracle
        session and per-oracle-session event counts and totals add up.
        (Exact equality is impossible once a session has closed — the
        reference drops such rows entirely; refining keeps them.)"""
        batch_of = data.draw(
            st.lists(st.integers(0, 3), min_size=len(events),
                     max_size=len(events)),
            label="batch_of",
        )
        batches = [[], [], [], []]
        for e, b in zip(events, batch_of):
            batches[b].append(e)
        got = _drive(batches, 10)
        oracle = _oracle(events, 10)
        assert sum(s[2] for s in got) == len(events)
        for s, e, n, tot in got:
            homes = [o for o in oracle if o[0] <= s and e <= o[1]]
            assert len(homes) == 1, (got, oracle)
        for o in oracle:
            inside = [g for g in got if o[0] <= g[0] and g[1] <= o[1]]
            assert sum(g[2] for g in inside) == o[2]
            assert abs(sum(g[3] for g in inside) - o[3]) < 1e-6

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
