"""Schema-drift probes beyond add-column (r7 verdict items 7+8): a
retyping DDL must be LOUD in every capture format (widening-only
evolution cannot express it), a dropped column stays a readable
nullable hole, and the probe scan is incremental — a drift restart
re-reads only NEW capture files, not the whole history."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from transferia_spark.streaming.cdc_sources import (
    probe_binlog_schema,
    probe_change_stream_schema,
    probe_stream_schema,
)
from transferia_spark.streaming.schema_drift import (
    json_kind_compatible,
    probe_scan_cache,
)
from transferia_spark.streaming.wal_source import probe_wal_schema

DDL = "id long, v string, x double"


def _write(path: str, name: str, lines: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, "." + name)
    with open(tmp, "w") as f:
        for ln in lines:
            f.write(json.dumps(ln) + "\n")
    os.replace(tmp, os.path.join(path, name))


def _w2j(**cols):
    return {"action": "U", "lsn": 5,
            "columns": [{"name": k, "value": v} for k, v in cols.items()]}


def _binlog(**cols):
    return {"action": "update", "log_file": "b.2", "log_pos": 9,
            "schema": "shop", "table": "items", "after": dict(cols)}


def _mongo(**cols):
    return {"operationType": "update", "fullDocument": dict(cols)}


def test_json_kind_compatibility_matrix():
    ok = json_kind_compatible
    assert ok(T.LongType(), 5) and ok(T.DoubleType(), 5)
    assert ok(T.DoubleType(), 5.5) and ok(T.DecimalType(10, 2), "12.50")
    assert ok(T.StringType(), "a") and ok(T.TimestampType(), "2024-01-01")
    assert ok(T.BooleanType(), True) and ok(T.StringType(), True)
    assert not ok(T.LongType(), "abc")       # numeric -> text retype
    assert not ok(T.StringType(), 7)         # text -> numeric retype
    assert not ok(T.DoubleType(), "1,5")     # double -> text retype
    assert not ok(T.LongType(), True)        # bool is not an int here
    assert ok(T.BooleanType(), 1) and ok(T.BooleanType(), 0)  # tinyint(1)
    assert not ok(T.BooleanType(), 5)        # genuinely not a boolean
    assert ok(T.StringType(), {"nested": 1})  # out of the check's scope


@pytest.mark.parametrize(
    "probe,ev",
    [
        (probe_wal_schema, _w2j),
        (probe_binlog_schema, _binlog),
        (probe_change_stream_schema, _mongo),
    ],
    ids=["waljson", "binlog", "mongostream"],
)
def test_retype_is_loud_in_every_format(spark, tmp_path, probe, ev):
    """Declared bigint now streaming text (ALTER ... TYPE text): the
    probe must raise naming the column, not evolve silently and leave
    every later row dead-lettering."""
    path = str(tmp_path / "cap")
    _write(path, "000.jsonl", [ev(id=1, v="a", x=2.5)])
    st = probe(path, DDL)  # compatible history: fine
    assert [f.name for f in st.fields] == ["id", "v", "x"]
    _write(path, "001.jsonl", [ev(id="no-longer-a-number", v="b")])
    with pytest.raises(ValueError, match="'id'"):
        probe(path, DDL)


def test_drop_column_stays_readable_hole(spark, tmp_path):
    """A dropped column simply stops arriving: the evolved schema keeps
    it nullable (history stays readable) and the probe neither raises
    nor removes it — the widening-only contract, now pinned."""
    path = str(tmp_path / "cap")
    _write(path, "000.jsonl", [_w2j(id=1, x=2.5)])  # v never arrives
    st = probe_wal_schema(path, DDL)
    assert [(f.name, f.nullable) for f in st.fields] == [
        ("id", True), ("v", True), ("x", True),
    ]


def test_add_column_still_appends_nullable(spark, tmp_path):
    path = str(tmp_path / "cap")
    _write(path, "000.jsonl", [_w2j(id=1, v="a", w_new=7)])
    st = probe_stream_schema("waljson", path, DDL)
    assert st.fields[-1].name == "w_new"
    assert isinstance(st.fields[-1].dataType, T.LongType)
    assert st.fields[-1].nullable


def test_probe_scan_is_incremental(spark, tmp_path):
    """r7 verdict item 8: capture files already probed are NOT re-read
    on the next drift restart. Proven behaviorally: replacing an
    already-scanned file with same-size different content changes
    nothing; a NEW file is picked up."""
    path = str(tmp_path / "cap")
    _write(path, "000.jsonl", [_w2j(id=1, v="a", w_new=7)])
    st = probe_wal_schema(path, DDL)
    assert st.fields[-1].name == "w_new"
    # same-identity (name, size, mtime) replacement introducing another
    # column: skipped — mtime restored because identity now includes it
    # (a fresh mtime means a RECREATED file, a new capture epoch)
    fpath = os.path.join(path, "000.jsonl")
    st0 = os.stat(fpath)
    original = open(fpath).read()
    doctored = original.replace("w_new", "q_new")
    assert len(doctored) == len(original)
    with open(fpath, "w") as f:
        f.write(doctored)
    os.utime(fpath, ns=(st0.st_atime_ns, st0.st_mtime_ns))
    st = probe_wal_schema(path, DDL)
    names = [f.name for f in st.fields]
    assert "w_new" in names and "q_new" not in names
    # a NEW capture file IS scanned
    _write(path, "001.jsonl", [_w2j(id=2, z_new="text")])
    st = probe_wal_schema(path, DDL)
    assert [f.name for f in st.fields][-2:] == ["w_new", "z_new"]
    cache = probe_scan_cache("waljson", path)
    assert set(cache.scanned) == {"000.jsonl", "001.jsonl"}


def test_grown_file_is_rescanned(spark, tmp_path):
    """Size change (the only mutation the atomic writers can't rule
    out) forces a rescan of that file."""
    path = str(tmp_path / "cap")
    _write(path, "000.jsonl", [_w2j(id=1, v="a")])
    probe_wal_schema(path, DDL)
    with open(os.path.join(path, "000.jsonl"), "a") as f:
        f.write(json.dumps(_w2j(id=2, grown=1.5)) + "\n")
    st = probe_wal_schema(path, DDL)
    assert st.fields[-1].name == "grown"


def test_string_encoded_numerics_are_not_retypes():
    """ADVICE r8: wal2json emits NaN/±Infinity (and numerics under
    common options) as JSON strings — a healthy double column carrying
    'NaN' must not stop the transfer as a retyping DDL."""
    ok = json_kind_compatible
    assert ok(T.DoubleType(), "NaN")
    assert ok(T.DoubleType(), "Infinity") and ok(T.DoubleType(), "-Infinity")
    assert ok(T.DoubleType(), "1.5") and ok(T.FloatType(), "2.25e-3")
    assert ok(T.LongType(), "42")  # numeric-as-string option
    assert not ok(T.DoubleType(), "abc")   # a genuine retype stays loud
    assert not ok(T.LongType(), "not-a-number")
    # ADVICE r9: the NaN/Infinity rationale is FLOAT-specific — an
    # int-declared column whose stream now carries a float-looking or
    # non-finite string IS a retype and must be flagged
    assert not ok(T.LongType(), "12.5")
    assert not ok(T.IntegerType(), "NaN")
    assert not ok(T.LongType(), "Infinity")
    assert ok(T.IntegerType(), "7")


def test_epoch_reset_rescans_every_file_same_probe(tmp_path):
    """ADVICE r9: when the FIRST file's recreation triggers the epoch
    reset, files later in the listing must still be scanned in the SAME
    probe cycle (the old code broke out of the ident loop, leaving them
    ident-less and skipped for one trigger)."""
    path = str(tmp_path / "cap")
    _write(path, "000.jsonl", [_w2j(id=1, v="a")])
    _write(path, "001.jsonl", [_w2j(id=2, v="b")])
    probe_wal_schema(path, DDL)
    # wipe + re-seed BOTH files (same names/sizes, new identities);
    # the new column arrives only in the LATER file
    for name, evs in (
        ("000.jsonl", [_w2j(id=1, v="a")]),
        ("001.jsonl", [_w2j(id=2, v="b", zz=9)]),
    ):
        os.remove(os.path.join(path, name))
        _write(path, name, evs)
    st = probe_wal_schema(path, DDL)
    assert st.fields[-1].name == "zz"  # detected THIS cycle, not next


def test_recreated_capture_file_starts_fresh_epoch(tmp_path):
    """ADVICE r8: deactivate + re-activate in the same supervisor
    process with a wiped capture dir — a recreated file of identical
    name and size must be rescanned, and samples from the previous
    epoch must not survive into the new one."""
    path = str(tmp_path / "cap")
    # epoch 1: q_new arrives as a NUMBER (4 serialized chars: 1234)
    _write(path, "000.jsonl", [_w2j(id=1, v="a", q_new=1234)])
    st = probe_wal_schema(path, DDL)
    assert isinstance(st.fields[-1].dataType, T.LongType)
    # wipe and re-seed: same name, same size, q_new now a STRING
    # ("ab" quoted is also 4 chars)
    size1 = os.path.getsize(os.path.join(path, "000.jsonl"))
    os.remove(os.path.join(path, "000.jsonl"))
    _write(path, "000.jsonl", [_w2j(id=1, v="a", q_new="ab")])
    assert os.path.getsize(os.path.join(path, "000.jsonl")) == size1
    st = probe_wal_schema(path, DDL)
    assert isinstance(st.fields[-1].dataType, T.StringType)
    # the epoch reset also dropped the stale numeric sample entirely
    cache = probe_scan_cache("waljson", path)
    assert cache.samples["q_new"] == "ab"
