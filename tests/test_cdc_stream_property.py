"""Property tests for the direct CDC stream readers' offset algebra
(streaming/cdc_sources.py): however the event log is split into files
and however Spark cuts micro-batches, every event is delivered EXACTLY
once and in replayable (offset) order. This is the reader-level analog
of the collapse batch-boundary invariance property (test_cdc_property) —
the r3 round showed per-query oracles cannot see invariant-level bugs,
so the invariants get their own hypothesis suites.

The readers' read()/partitions()/latestOffset() are pure Python over
files, so these tests drive them directly without a Spark session —
hundreds of examples in seconds.
"""

from __future__ import annotations

import json
import os

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from transferia_spark.cdc.envelopes import MYSQL_FILE_OFFSET
from transferia_spark.streaming.cdc_sources import (
    BinlogJsonStreamReader,
    ChangeStreamJsonStreamReader,
)

BINLOG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.StringType()),
        T.StructField("_op", T.StringType()),
        T.StructField("_lsn", T.LongType()),
        T.StructField("_counter", T.IntegerType()),
        T.StructField("_table", T.StringType()),
        T.StructField("_before", T.StringType()),
        T.StructField("_present", T.StringType()),
    ]
)

CS_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.IntegerType()),
        T.StructField("v", T.StringType()),
        T.StructField("_op", T.StringType()),
        T.StructField("_lsn", T.LongType()),
        T.StructField("_counter", T.IntegerType()),
        T.StructField("_table", T.StringType()),
        T.StructField("_present", T.StringType()),
    ]
)


def _write_files(dirpath: str, files: list[list[dict]]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    for name in os.listdir(dirpath):
        os.remove(os.path.join(dirpath, name))
    for i, events in enumerate(files):
        with open(os.path.join(dirpath, f"{i:03d}.jsonl"), "w") as f:
            for e in events:
                f.write(json.dumps(e) + "\n")


def _drain(reader, start: dict, end: dict) -> list[tuple]:
    rows: list[tuple] = []
    for p in reader.partitions(start, end):
        rows.extend(reader._read_tuples(p))
    return rows


# --------------------------------------------------------------- binlog

# a log of row events with strictly increasing binlog positions across
# 1-2 binlog files (file rotation included in the property)
binlog_events = st.lists(
    st.tuples(
        st.integers(0, 3),                     # key
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(1, 2),                     # binlog file index
    ),
    min_size=1,
    max_size=20,
).map(
    lambda raw: [
        {
            "action": op,
            "log_file": f"binlog.{fidx:06d}",
            # positions strictly increase within a file; sorting by
            # (fidx, i) keeps the log LSN-monotonic as real binlogs are
            "log_pos": 10 + i,
            "row_idx": 0,
            "after": None if op == "delete" else {"id": k, "v": f"v{i}"},
            "before": {"id": k, "v": "old"} if op != "insert" else None,
        }
        for i, (k, op, fidx) in enumerate(sorted(raw, key=lambda t: t[2]))
    ]
)


@settings(max_examples=200, deadline=None)
@given(
    events=binlog_events,
    cuts=st.lists(st.integers(0, 19), max_size=3),
    batch_cuts=st.lists(st.integers(0, 19), max_size=2),
)
def test_binlog_exactly_once_under_any_file_and_batch_split(
    tmp_path_factory, events, cuts, batch_cuts
):
    tmp = str(tmp_path_factory.mktemp("binlog"))
    reader = BinlogJsonStreamReader(BINLOG_SCHEMA, {"path": tmp})

    # split the log into files at arbitrary boundaries
    bounds = sorted({c for c in cuts if c < len(events)})
    files, prev = [], 0
    for b in bounds:
        if b > prev:
            files.append(events[prev:b])
            prev = b
    files.append(events[prev:])
    _write_files(tmp, [f for f in files if f])

    all_lsns = [
        int(e["log_file"].split(".")[1]) * MYSQL_FILE_OFFSET + e["log_pos"]
        for e in events
    ]
    # micro-batch boundaries: arbitrary intermediate offsets
    mids = sorted(
        {all_lsns[c] for c in batch_cuts if c < len(events)} | {max(all_lsns)}
    )
    offsets = [{"lsn": 0}] + [{"lsn": m} for m in mids]

    delivered: list[tuple] = []
    for lo, hi in zip(offsets, offsets[1:]):
        delivered.extend(_drain(reader, lo, hi))
    # final catch-up batch to latestOffset
    delivered.extend(_drain(reader, offsets[-1], reader.latestOffset()))

    # exactly once: every event delivered once, in a replayable order
    got = sorted((r[3], r[4]) for r in delivered)  # (_lsn, _counter)
    assert got == sorted((l, 0) for l in all_lsns)
    assert len(delivered) == len(events)


# ---------------------------------------------------------- change stream

cs_events = st.lists(
    st.tuples(
        st.integers(0, 3),                     # _id
        st.sampled_from(["insert", "update", "replace", "delete"]),
        st.integers(1, 4),                     # clusterTime
    ),
    min_size=1,
    max_size=20,
).map(
    lambda raw: [
        {
            "operationType": op,
            "clusterTime": ct,
            "order": i,  # unique per event → total order with ct
            "documentKey": {"_id": k},
            "fullDocument": None
            if op == "delete"
            else {"_id": k, "v": f"v{i}"},
        }
        for i, (k, op, ct) in enumerate(sorted(raw, key=lambda t: t[2]))
    ]
)


@settings(max_examples=200, deadline=None)
@given(
    events=cs_events,
    cuts=st.lists(st.integers(0, 19), max_size=3),
    batch_cuts=st.lists(st.integers(0, 19), max_size=2),
)
def test_change_stream_exactly_once_under_any_split(
    tmp_path_factory, events, cuts, batch_cuts
):
    tmp = str(tmp_path_factory.mktemp("cs"))
    reader = ChangeStreamJsonStreamReader(CS_SCHEMA, {"path": tmp})

    bounds = sorted({c for c in cuts if c < len(events)})
    files, prev = [], 0
    for b in bounds:
        if b > prev:
            files.append(events[prev:b])
            prev = b
    files.append(events[prev:])
    _write_files(tmp, [f for f in files if f])

    positions = [(e["clusterTime"], e["order"]) for e in events]
    mids = sorted(
        {positions[c] for c in batch_cuts if c < len(events)}
        | {max(positions)}
    )
    offsets = [{"ts": 0, "order": -1}] + [
        {"ts": t, "order": o} for t, o in mids
    ]

    delivered: list[tuple] = []
    for lo, hi in zip(offsets, offsets[1:]):
        delivered.extend(_drain(reader, lo, hi))
    delivered.extend(_drain(reader, offsets[-1], reader.latestOffset()))

    got = sorted((r[3], r[4]) for r in delivered)  # (_lsn=_ts, _counter)
    assert got == sorted(positions)
    assert len(delivered) == len(events)
