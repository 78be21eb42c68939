"""Pure-Python Delta log replay (sources/delta_log.py): snapshot
resolution, time travel, partitions, checkpoints, unsupported-feature
gates. Tables are hand-authored to the public protocol — no delta-spark
anywhere."""

from __future__ import annotations

import json
import os

import pytest

from transferia_spark.schema.colschema import TableID
from transferia_spark.sources.base import build_source
from transferia_spark.sources.delta_log import read_snapshot

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_parquet(spark, path: str, rows, schema="id long, v string"):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    names = [f.split()[0] for f in schema.split(", ")]
    table = pa.table({n: [r[i] for r in rows] for i, n in enumerate(names)})
    pq.write_table(table, path)


def _commit(table_path: str, version: int, actions: list[dict]) -> None:
    log = os.path.join(table_path, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _meta(partition_cols=()):
    return {
        "metaData": {
            "id": "t-1",
            "schemaString": SCHEMA_STRING,
            "partitionColumns": list(partition_cols),
            "configuration": {},
            "format": {"provider": "parquet", "options": {}},
        }
    }


def _protocol(v=1, feats=None):
    p = {"minReaderVersion": v, "minWriterVersion": 2}
    if feats is not None:
        p["readerFeatures"] = feats
    return {"protocol": p}


def _add(path, part=None):
    a = {"path": path, "dataChange": True, "size": 1, "modificationTime": 0,
         "partitionValues": part or {}}
    return {"add": a}


@pytest.fixture()
def table(spark, tmp_path):
    """v0: files a,b. v1: remove a, add c."""
    root = str(tmp_path / "dt")
    _write_parquet(spark, os.path.join(root, "a.parquet"), [(1, "a1"), (2, "a2")])
    _write_parquet(spark, os.path.join(root, "b.parquet"), [(3, "b1")])
    _write_parquet(spark, os.path.join(root, "c.parquet"), [(4, "c1")])
    _commit(root, 0, [_protocol(), _meta(), _add("a.parquet"), _add("b.parquet")])
    _commit(root, 1, [{"remove": {"path": "a.parquet", "dataChange": True}},
                      _add("c.parquet")])
    return root


def test_snapshot_replay_and_time_travel(spark, table):
    snap1 = read_snapshot(table)
    assert snap1.version == 1 and snap1.paths == ["b.parquet", "c.parquet"]
    snap0 = read_snapshot(table, version=0)
    assert snap0.paths == ["a.parquet", "b.parquet"]
    with pytest.raises(ValueError, match="out of range"):
        read_snapshot(table, version=7)

    src = build_source("delta", path=table)
    rows = {(r.id, r.v) for r in
            src.load_table(spark, TableID("", "dt")).collect()}
    assert rows == {(3, "b1"), (4, "c1")}  # a removed, c added
    rows0 = {(r.id, r.v) for r in
             build_source("delta", path=table, version=0)
             .load_table(spark, TableID("", "dt")).collect()}
    assert rows0 == {(1, "a1"), (2, "a2"), (3, "b1")}


def test_partitioned_table_recovers_partition_column(spark, tmp_path):
    root = str(tmp_path / "pt")
    _write_parquet(spark, os.path.join(root, "p=1", "x.parquet"),
                   [(1,)], schema="id long")
    _write_parquet(spark, os.path.join(root, "p=2", "y.parquet"),
                   [(2,)], schema="id long")
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "p", "type": "integer", "nullable": True, "metadata": {}},
        ],
    })
    meta = {"metaData": {"id": "t-2", "schemaString": schema,
                         "partitionColumns": ["p"], "configuration": {},
                         "format": {"provider": "parquet", "options": {}}}}
    _commit(root, 0, [_protocol(), meta,
                      _add("p=1/x.parquet", {"p": "1"}),
                      _add("p=2/y.parquet", {"p": "2"})])
    df = build_source("delta", path=root).load_table(spark, TableID("", "pt"))
    assert df.columns == ["id", "p"]
    assert {(r.id, r.p) for r in df.collect()} == {(1, 1), (2, 2)}
    assert dict(df.dtypes)["p"] == "int"  # declared type, not discovery's


def test_checkpoint_replay(spark, tmp_path):
    """A classic checkpoint parquet summarizes v0-v1; replay starts
    after it and applies only later commits."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "ck")
    _write_parquet(spark, os.path.join(root, "b.parquet"), [(3, "b1")])
    _write_parquet(spark, os.path.join(root, "d.parquet"), [(5, "d1")])
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    # checkpoint at v1: metaData + protocol + the net add of b
    # checkpoint rows: empty structs don't round-trip through parquet,
    # so optional empty maps (configuration/partitionValues) are absent
    # — exactly how real checkpoints type them (map<string,string>)
    md = {k: v for k, v in _meta()["metaData"].items()
          if k not in ("configuration", "format")}
    ck = pa.table({
        "metaData": [md, None, None],
        "protocol": [None, {"minReaderVersion": 1}, None],
        "add": [None, None, {"path": "b.parquet", "dataChange": True}],
        "remove": pa.array([None, None, None],
                           type=pa.struct([("path", pa.string())])),
    })
    pq.write_table(ck, os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    # dummy empty commits v0/v1 (present but superseded by checkpoint)
    _commit(root, 0, [_protocol(), _meta()])
    _commit(root, 1, [])
    _commit(root, 2, [_add("d.parquet")])
    snap = read_snapshot(root)
    assert snap.version == 2 and snap.paths == ["b.parquet", "d.parquet"]
    rows = {(r.id, r.v) for r in
            build_source("delta", path=root)
            .load_table(spark, TableID("", "ck")).collect()}
    assert rows == {(3, "b1"), (5, "d1")}


def _ckpt_table(i, adds, with_meta=False, with_proto=False):
    """One multi-part checkpoint part file as a pyarrow table."""
    import pyarrow as pa

    md = {k: v for k, v in _meta()["metaData"].items()
          if k not in ("configuration", "format")}
    n = max(len(adds), 1)
    return pa.table({
        "metaData": pa.array(
            [md if with_meta and j == 0 else None for j in range(n)],
            type=pa.struct([("id", pa.string()),
                            ("schemaString", pa.string()),
                            ("partitionColumns", pa.list_(pa.string()))])),
        "protocol": pa.array(
            [{"minReaderVersion": 1} if with_proto and j == 0 else None
             for j in range(n)],
            type=pa.struct([("minReaderVersion", pa.int32())])),
        "add": pa.array(
            [{"path": p, "dataChange": True} for p in adds] or [None],
            type=pa.struct([("path", pa.string()),
                            ("dataChange", pa.bool_())])),
        "remove": pa.array([None] * n,
                           type=pa.struct([("path", pa.string())])),
    })


def test_multipart_checkpoint_and_vacuumed_commits(spark, tmp_path):
    """ADVICE r4: multi-part checkpoints ({v}.checkpoint.{i}.{n}.parquet)
    + _last_checkpoint are honored, and a table whose pre-checkpoint JSON
    commits were vacuumed still loads."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "mp")
    _write_parquet(spark, os.path.join(root, "b.parquet"), [(3, "b1")])
    _write_parquet(spark, os.path.join(root, "c.parquet"), [(4, "c1")])
    _write_parquet(spark, os.path.join(root, "d.parquet"), [(5, "d1")])
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    # multi-part checkpoint at v1 split over 2 parts; commits 0..1 vacuumed
    pq.write_table(_ckpt_table(1, ["b.parquet"], with_meta=True,
                               with_proto=True),
                   os.path.join(log, f"{1:020d}.checkpoint."
                                     f"{1:010d}.{2:010d}.parquet"))
    pq.write_table(_ckpt_table(2, ["c.parquet"]),
                   os.path.join(log, f"{1:020d}.checkpoint."
                                     f"{2:010d}.{2:010d}.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": 1, "size": 4, "parts": 2}))
    _commit(root, 2, [_add("d.parquet")])

    snap = read_snapshot(root)
    assert snap.version == 2
    assert snap.paths == ["b.parquet", "c.parquet", "d.parquet"]
    rows = {(r.id, r.v) for r in
            build_source("delta", path=root)
            .load_table(spark, TableID("", "mp")).collect()}
    assert rows == {(3, "b1"), (4, "c1"), (5, "d1")}


def test_incomplete_multipart_checkpoint_is_ignored(spark, tmp_path):
    """A checkpoint missing one of its parts must not be used; with the
    JSON commits also vacuumed the error is loud, not a partial read."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "inc")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    pq.write_table(_ckpt_table(1, ["b.parquet"], with_meta=True),
                   os.path.join(log, f"{1:020d}.checkpoint."
                                     f"{1:010d}.{2:010d}.parquet"))
    _commit(root, 2, [_add("d.parquet")])
    with pytest.raises(FileNotFoundError, match="no complete checkpoint"):
        read_snapshot(root)


def test_unsupported_features_raise(spark, tmp_path):
    root = str(tmp_path / "uf")
    _commit(root, 0, [
        _protocol(v=3, feats=["deletionVectors"]), _meta()])
    with pytest.raises(NotImplementedError, match="deletionVectors"):
        read_snapshot(root)

    root2 = str(tmp_path / "cm")
    meta = _meta()
    meta["metaData"]["configuration"] = {"delta.columnMapping.mode": "name"}
    _commit(root2, 0, [_protocol(), meta])
    with pytest.raises(NotImplementedError, match="columnMapping"):
        read_snapshot(root2)

    # deletion vector on an add action gates too
    root3 = str(tmp_path / "dv")
    bad = _add("x.parquet")
    bad["add"]["deletionVector"] = {"storageType": "u"}
    _commit(root3, 0, [_protocol(), _meta(), bad])
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        read_snapshot(root3)


def test_all_commits_vacuumed_checkpoint_above_target_raises(spark, tmp_path):
    """ADVICE r5: every JSON commit vacuumed and the only complete
    checkpoint ABOVE the requested version → time travel to that
    version is unreplayable and must raise loudly (previously fell
    through to a misleading 'no metaData' error / empty snapshot)."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "vac")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    pq.write_table(
        _ckpt_table(0, ["b.parquet"], with_meta=True, with_proto=True),
        os.path.join(log, f"{2:020d}.checkpoint.parquet"),
    )
    # latest (v2, via the checkpoint) still reads fine
    assert read_snapshot(root).version == 2
    # v1 predates the checkpoint and has no commits left to replay
    with pytest.raises(FileNotFoundError, match="cannot replay"):
        read_snapshot(root, version=1)
