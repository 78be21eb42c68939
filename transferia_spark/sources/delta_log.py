"""Pure-Python Delta Lake transaction-log replay.

≈ ``pkg/providers/delta/`` in transferia/transferia, which likewise
implements its OWN reader of the public Delta log protocol
(``action/`` types, ``store/`` log store, checkpoints) instead of
depending on delta-spark. The protocol is an ordered sequence of JSON
commit files ``_delta_log/{version:020d}.json`` (plus optional parquet
checkpoints named in ``_last_checkpoint``), each a list of actions:

- ``metaData``  — table id, schemaString (Spark StructType JSON),
  partitionColumns, configuration
- ``protocol``  — minReaderVersion / readerFeatures the reader must
  understand
- ``add``       — a data file (path, partitionValues, dataChange)
- ``remove``    — tombstone for a previously added file

Snapshot state at version V = replay actions 0..V: last metaData wins,
adds insert into the active set keyed by path, removes delete. The
module resolves the active file set + schema, and ``DeltaSource`` feeds
those paths to the ordinary parquet reader with ``basePath`` so hive
partition directories resolve — Catalyst then does pruning/pushdown as
with any parquet scan.

Unsupported reader features (column mapping, deletion vectors) raise
``NotImplementedError`` naming the feature — never silently-wrong
reads.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

LOG_DIR = "_delta_log"

#: protocol versions/features this replayer understands: plain parquet
#: files addressed by path, no column mapping, no deletion vectors
MAX_READER_VERSION = 2
SUPPORTED_READER_FEATURES = {"timestampNtz", "v2Checkpoint"}


@dataclass
class DeltaSnapshot:
    version: int
    schema_json: dict | None
    partition_columns: list[str]
    files: dict[str, dict] = field(default_factory=dict)  # path -> add action
    configuration: dict = field(default_factory=dict)

    @property
    def paths(self) -> list[str]:
        return sorted(self.files)


def _commit_version(name: str) -> int | None:
    stem, ext = os.path.splitext(name)
    if ext == ".json" and stem.isdigit():
        return int(stem)
    return None


def _checkpoint_version(name: str) -> tuple[int, int, int] | None:
    """Recognize both public checkpoint namings (ADVICE r4):

    - classic single-file: ``{v:020d}.checkpoint.parquet`` → (v, 1, 1)
    - multi-part:          ``{v:020d}.checkpoint.{i:010d}.{n:010d}.parquet``
      → (v, i, n) with 1-based part index i of n
    """
    parts = name.split(".")
    if (
        len(parts) == 3
        and parts[0].isdigit()
        and parts[1] == "checkpoint"
        and parts[2] == "parquet"
    ):
        return int(parts[0]), 1, 1
    if (
        len(parts) == 5
        and parts[0].isdigit()
        and parts[1] == "checkpoint"
        and parts[2].isdigit()
        and parts[3].isdigit()
        and parts[4] == "parquet"
    ):
        return int(parts[0]), int(parts[2]), int(parts[3])
    return None


def _read_last_checkpoint(log_dir: str) -> tuple[int, int] | None:
    """Consult ``_last_checkpoint`` (JSON: version, optional parts).
    Returns (version, parts) or None when absent/corrupt (a stale or
    torn ``_last_checkpoint`` is recoverable by directory scan, per the
    protocol)."""
    try:
        with open(os.path.join(log_dir, "_last_checkpoint")) as f:
            d = json.loads(f.read())
        return int(d["version"]), int(d.get("parts") or 1)
    except (FileNotFoundError, ValueError, KeyError, TypeError):
        return None


def _check_protocol(action: dict) -> None:
    v = int(action.get("minReaderVersion", 1))
    feats = set(action.get("readerFeatures") or [])
    unsupported = feats - SUPPORTED_READER_FEATURES
    if v > MAX_READER_VERSION and unsupported:
        raise NotImplementedError(
            f"delta table needs reader version {v} with features "
            f"{sorted(unsupported)}; this replayer reads plain-parquet "
            "tables (no column mapping / deletion vectors) — use the "
            "delta-spark connector for these"
        )


def _apply(snap: DeltaSnapshot, action: dict) -> None:
    if "metaData" in action:
        md = action["metaData"]
        snap.schema_json = json.loads(md["schemaString"])
        snap.partition_columns = list(md.get("partitionColumns") or [])
        snap.configuration = dict(md.get("configuration") or {})
        if snap.configuration.get("delta.columnMapping.mode", "none") != "none":
            raise NotImplementedError(
                "delta.columnMapping.mode != none is not supported by the "
                "pure-Python replayer — use the delta-spark connector"
            )
    elif "protocol" in action:
        _check_protocol(action["protocol"])
    elif "add" in action:
        add = action["add"]
        if add.get("deletionVector"):
            raise NotImplementedError(
                "deletion vectors are not supported by the pure-Python "
                "replayer — use the delta-spark connector"
            )
        snap.files[add["path"]] = add
    elif "remove" in action:
        snap.files.pop(action["remove"]["path"], None)
    # commitInfo / txn / cdc / domainMetadata: no snapshot effect


def _read_checkpoint(path: str, snap: DeltaSnapshot) -> None:
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    cols = t.column_names
    for row in t.to_pylist():
        for key in ("metaData", "protocol", "add", "remove"):
            if key in cols and row.get(key) is not None:
                # checkpoint rows store schemaString etc. natively
                action = {key: row[key]}
                if key == "metaData" and isinstance(
                    row[key].get("schemaString"), str
                ):
                    pass  # same shape as JSON commits
                _apply(snap, action)


def read_snapshot(table_path: str, version: int | None = None) -> DeltaSnapshot:
    """Replay the log to ``version`` (default: latest). Starts from the
    newest eligible classic checkpoint when one exists (``_last_checkpoint``
    or directory scan), then applies the JSON commits after it."""
    log_dir = os.path.join(table_path, LOG_DIR)
    try:
        names = os.listdir(log_dir)
    except (FileNotFoundError, NotADirectoryError):
        raise FileNotFoundError(
            f"{table_path} has no {LOG_DIR}/ — not a Delta table"
        ) from None
    commits = sorted(
        (v, n) for n in names if (v := _commit_version(n)) is not None
    )
    # group checkpoint part-files by version: {version: {part_index: name}}
    ckpt_parts: dict[int, dict[int, str]] = {}
    ckpt_n: dict[int, int] = {}
    for n in names:
        if (cv := _checkpoint_version(n)) is not None:
            v, i, nparts = cv
            ckpt_parts.setdefault(v, {})[i] = n
            ckpt_n[v] = nparts
    # a checkpoint is usable only when every part is present
    complete_ckpts = sorted(
        v for v, parts in ckpt_parts.items() if len(parts) == ckpt_n[v]
    )
    if not commits and not complete_ckpts:
        raise FileNotFoundError(f"no commit files in {log_dir}")
    # pre-checkpoint JSON commits may have been vacuumed: the latest
    # version is the max over commits AND checkpoints
    latest = max(
        ([commits[-1][0]] if commits else [])
        + (complete_ckpts[-1:] if complete_ckpts else [])
    )
    target = latest if version is None else version
    if target > latest or target < 0:
        raise ValueError(
            f"version {target} out of range: table has commits 0..{latest}"
        )

    # prefer the _last_checkpoint pointer (protocol-recommended; avoids
    # a full directory dependence), validated against the files present;
    # fall back to the directory scan for eligible complete checkpoints
    eligible = [v for v in complete_ckpts if v <= target]
    ckpt_version: int | None = None
    lc = _read_last_checkpoint(log_dir)
    if lc is not None and lc[0] in eligible and len(ckpt_parts[lc[0]]) == lc[1]:
        ckpt_version = lc[0]
    elif eligible:
        ckpt_version = eligible[-1]

    snap = DeltaSnapshot(version=target, schema_json=None, partition_columns=[])
    start = 0
    if ckpt_version is not None:
        for i in sorted(ckpt_parts[ckpt_version]):
            _read_checkpoint(
                os.path.join(log_dir, ckpt_parts[ckpt_version][i]), snap
            )
        start = ckpt_version + 1
    elif not commits or commits[0][0] > 0:
        # no usable replay base: either the pre-checkpoint JSON commits
        # were vacuumed, or NO commits remain at all and the only
        # complete checkpoints sit above the requested version — an
        # empty snapshot here would silently misreport a readable table
        first = commits[0][0] if commits else target + 1
        raise FileNotFoundError(
            f"cannot replay to version {target}: commits before "
            f"{first} were removed and no complete checkpoint "
            f"≤ {target} exists in {log_dir}"
        )

    for v, name in commits:
        if v < start or v > target:
            continue
        with open(os.path.join(log_dir, name)) as f:
            for line in f:
                if line.strip():
                    _apply(snap, json.loads(line))
    if snap.schema_json is None:
        raise ValueError(f"no metaData action found in {log_dir}")
    return snap


__all__ = ["DeltaSnapshot", "read_snapshot", "LOG_DIR"]
