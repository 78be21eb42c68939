"""Mid-stream DDL / schema-drift handling.

≈ ``pkg/providers/postgres/publisher_replication.go:202`` in
transferia/transferia: on a relation-message change the reference
re-resolves the table schema in place and keeps pushing. Spark
Structured Streaming queries have a STATIC schema per run — the
Spark-native translation (SURVEY §7 hard part 1) is a supervisor loop:

  1. run the streaming query with the schema currently registered;
  2. a drift detector watches the source (here: the declared schema of
     arriving batches vs the registry);
  3. on drift: stop the query gracefully, evolve the registry
     (widening-only by default: new nullable columns append, removed
     columns stay nullable — history stays readable), and restart the
     query from its checkpoint with the new schema.

Checkpoint offsets make the restart seamless: no events are lost or
re-applied, exactly the contract the reference gets from slot LSNs.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


class SchemaRegistry:
    """Versioned table→schema store (file-backed, one JSON per table).

    ≈ the reference's re-resolved ``TableSchema`` kept on the
    replication worker; persisted so a restarted driver resumes with
    the schema the checkpoint was written under.
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _file(self, table: str) -> str:
        return os.path.join(self.path, f"{table}.json")

    def get(self, table: str) -> tuple[int, T.StructType] | None:
        try:
            with open(self._file(table)) as f:
                doc = json.load(f)
            return doc["version"], T.StructType.fromJson(doc["schema"])
        except FileNotFoundError:
            return None

    def put(self, table: str, schema: T.StructType) -> int:
        cur = self.get(table)
        version = (cur[0] + 1) if cur else 1
        tmp = self._file(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "schema": schema.jsonValue()}, f)
        os.replace(tmp, self._file(table))
        return version


def infer_json_type(v) -> T.DataType:
    """Spark type for a JSON-decoded value — shared by the per-format
    schema probes (binlog ``before``/``after`` dicts, wal2json
    ``columns`` arrays, change-stream documents)."""
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    return T.StringType()


def json_kind_compatible(declared: T.DataType, v) -> bool:
    """Can a JSON-decoded stream value inhabit the DECLARED column
    type? The check is deliberately coarse (a JSON number can feed any
    numeric width; strings feed string/temporal/binary/decimal) — it
    exists to catch RETYPING DDL (numeric column now streaming text,
    text column now streaming numbers), which widening-only evolution
    cannot express and which previously left the stream schema silently
    stale (r6 item 6 / r7 verdict item 7)."""
    if isinstance(v, bool):
        return isinstance(declared, (T.BooleanType, T.StringType))
    if isinstance(v, int):
        if isinstance(declared, T.BooleanType):
            # MySQL BOOLEAN is tinyint(1): the binlog decodes it as
            # 0/1 ints — a healthy stream, not a retype
            return v in (0, 1)
        return isinstance(
            declared,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
             T.FloatType, T.DoubleType, T.DecimalType),
        )
    if isinstance(v, float):
        return isinstance(
            declared, (T.FloatType, T.DoubleType, T.DecimalType)
        )
    if isinstance(v, str):
        if isinstance(
            declared,
            (T.StringType, T.CharType, T.VarcharType, T.DateType,
             T.TimestampType, T.TimestampNTZType, T.BinaryType,
             T.DecimalType),
        ):
            return True
        if isinstance(declared, (T.FloatType, T.DoubleType)):
            # real producers string-encode numerics: wal2json emits
            # NaN/±Infinity as JSON strings (JSON has no spelling for
            # them) and numeric values as strings under common options
            # — a healthy double column carrying 'NaN' must not be
            # flagged as a retyping DDL (ADVICE r8)
            try:
                float(v)
                return True
            except ValueError:
                return False
        if isinstance(
            declared,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        ):
            # integer columns accept only integer-parseable strings:
            # the NaN/Infinity rationale is float-specific, so an
            # int-declared column whose stream now carries '12.5' or
            # 'hello' IS a retype and must be flagged (ADVICE r9)
            try:
                int(v)
                return True
            except ValueError:
                return False
        return False
    return True  # nested/unknown kinds: out of the check's scope


class ProbeScanCache:
    """Incremental probe-scan state for one capture directory: the set
    of (file, size) already scanned and the LATEST non-null sample per
    column. Capture files are immutable once visible (the tailers write
    whole files atomically via os.replace), so a drift restart only
    scans NEW files instead of the whole history (r6 item 5 / r7
    verdict item 8); a same-name file whose size changed is rescanned.
    """

    def __init__(self):
        # basename -> (size, mtime_ns): size alone would let a transfer
        # deactivated and re-activated in the same supervisor process
        # (capture dir wiped, files recreated with identical names and
        # sizes) silently skip the recreated files (ADVICE r8)
        self.scanned: dict[str, tuple[int, int]] = {}
        self.samples: dict[str, object] = {}  # column -> latest sample


#: per-(probe-kind, capture-dir) caches, process-lifetime — drift
#: restarts happen in the supervisor's own process, so this bounds the
#: re-probe cost without any on-disk state
_probe_caches: dict[tuple[str, str], ProbeScanCache] = {}


def probe_scan_cache(kind: str, path: str) -> ProbeScanCache:
    key = (kind, os.path.abspath(path))
    return _probe_caches.setdefault(key, ProbeScanCache())


def incremental_probe(
    kind: str,
    path: str,
    files: list[str],
    base_ddl: str,
    extract,
) -> T.StructType:
    """Shared engine of the per-format schema probes: scan only files
    the cache hasn't seen, fold every observed (column, value) pair
    into the latest-sample map via ``extract(event) -> iterable of
    (column, value)``, then

    - APPEND columns absent from the declared schema (widening-only
      evolution, nullable), and
    - raise loudly when a DECLARED column's latest observed value is
      incompatible with its declared type — a retyping DDL that
      widening-only evolution cannot express must stop the transfer
      with a named column, not silently dead-letter every later row.

    Poison lines are skipped (they are already dead-lettered by the
    read path; a drift restart must not turn them fatal)."""
    import json as _json

    cache = probe_scan_cache(kind, path)
    # identify files by (size, mtime_ns), not size alone, and treat a
    # RECREATED file (same name, different identity) as a fresh capture
    # epoch: capture files are immutable once visible, so an identity
    # change means the directory was wiped and re-seeded (transfer
    # re-activated in the same supervisor process) — stale samples and
    # scan marks from the previous epoch must not trigger or mask the
    # retype check against the new schema (ADVICE r8). Plain deletions
    # (prune_committed) keep the cache: samples legitimately outlive
    # pruned files.
    idents: dict[str, tuple[int, int]] = {}
    for f in files:
        name = os.path.basename(f)
        try:
            st_f = os.stat(f)
        except OSError:
            continue
        idents[name] = (st_f.st_size, st_f.st_mtime_ns)
    # compute EVERY ident before acting on an epoch change: breaking at
    # the first recreated file would leave later files ident-less, so
    # they would be skipped for this probe cycle and their drift
    # detection delayed one trigger (ADVICE r9)
    if any(
        cache.scanned.get(name) not in (None, ident)
        for name, ident in idents.items()
    ):
        cache.scanned.clear()
        cache.samples.clear()
    for f in files:
        name = os.path.basename(f)
        ident = idents.get(name)
        if ident is None:
            continue
        if cache.scanned.get(name) == ident:
            continue
        with open(f) as fh:
            for line in fh:
                if not line.strip():
                    continue
                try:
                    ev = _json.loads(line)
                except ValueError:
                    continue
                if not isinstance(ev, dict):
                    continue
                for col, val in extract(ev):
                    if col and val is not None:
                        cache.samples[col] = val
        cache.scanned[name] = ident  # (size, mtime_ns) identity
    st = T._parse_datatype_string(base_ddl)
    declared = {f.name: f.dataType for f in st.fields}
    inferred: dict[str, T.DataType] = {}
    for k, v in cache.samples.items():
        if k in declared:
            if not json_kind_compatible(declared[k], v):
                raise ValueError(
                    f"incompatible drift on column {k!r}: declared "
                    f"{declared[k].simpleString()}, but the stream now "
                    f"carries {type(v).__name__} value {v!r} — a "
                    "retyping DDL cannot be expressed by widening-only "
                    "evolution; update the declared schema "
                    "(schema/schema_file) to the new type and "
                    "re-activate the transfer"
                )
        else:
            inferred[k] = infer_json_type(v)
    probed = T.StructType(
        list(st.fields)
        + [T.StructField(k, t, True) for k, t in sorted(inferred.items())]
    )
    return evolve(st, probed)


def evolve(old: T.StructType, new: T.StructType) -> T.StructType:
    """Widening-only merge: old column order is preserved (dropped
    columns become nullable holes the sink keeps), new columns append
    as nullable. Incompatible type changes raise — same fatal contract
    as the reference's strict type system."""
    by_name = {f.name: f for f in new.fields}
    out: list[T.StructField] = []
    for f in old.fields:
        n = by_name.pop(f.name, None)
        if n is None:
            out.append(T.StructField(f.name, f.dataType, True))
        elif n.dataType == f.dataType:
            out.append(T.StructField(f.name, f.dataType, f.nullable or n.nullable))
        else:
            raise ValueError(
                f"incompatible drift on {f.name}: {f.dataType} → {n.dataType}"
            )
    out.extend(T.StructField(f.name, f.dataType, True) for f in new.fields if f.name in by_name)
    return T.StructType(out)


def run_with_drift_handling(
    table: str,
    registry: SchemaRegistry,
    current_source_schema: Callable[[], T.StructType],
    start_query: Callable[[T.StructType], StreamingQuery],
    max_restarts: int = 10,
) -> int:
    """Supervisor: (re)start ``start_query(schema)`` until the source
    schema stops drifting; returns the number of restarts performed.

    ``current_source_schema`` probes the source's present schema (e.g.
    a parquet footer read, a registry lookup, a relation message); each
    pass runs the query to completion of available data
    (``availableNow`` trigger inside ``start_query``), then re-probes.
    A continuously-running deployment calls this in its own loop.
    """
    restarts = 0
    while True:
        probed = current_source_schema()
        stored = registry.get(table)
        if stored is None:
            registry.put(table, probed)
            schema = probed
        else:
            schema = evolve(stored[1], probed)
            if schema != stored[1]:
                registry.put(table, schema)
        q = start_query(schema)
        q.awaitTermination()
        if current_source_schema() == probed or restarts >= max_restarts:
            return restarts
        restarts += 1  # drift arrived while the query ran — go again
