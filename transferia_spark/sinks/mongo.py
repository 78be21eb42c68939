"""MongoDB sink: per-shard ordered bulk writes with distinct-id bulks.

≈ transferia/transferia ``pkg/providers/mongo/sink.go`` +
``sink_bulk_operations.go`` + ``bulk_splitter.go``:
- rows split into write shards by FNV-1a32(_id) so every event for a
  document stays on one shard in order
  (``shardOfDocumentID:sink_bulk_operations.go:84``, 16 shards);
- within a shard, bulks are cut whenever a bulk would contain the same
  ``_id`` twice (``bulkSplitter.Add``) — each bulk then has distinct
  ids, so MongoDB may apply it unordered (``bulkWrite`` sets
  ``Ordered(false)``); bulks of one shard apply sequentially to keep
  per-document event order;
- write models (``makeWriteModel:167``): insert/update → ReplaceOne
  (filter by ``_id``, upsert), delete → DeleteOne, partial
  change-stream patches → UpdateOne with ``$set``/``$unset``;
- snapshot Drop/Truncate → drop collection / delete-many;
- sharded target collections (r13 ≈ ``sharded_collection.go`` +
  ``shard_key.go`` + ``write_models.go:10``): the collection's shard
  key is read from ``config.collections`` once per table; replace
  filters carry the STORED shard-key values alongside ``_id`` (a
  mongos routes the upsert to one shard instead of broadcasting), the
  stored values come from one ``$in`` lookup per partition per batch,
  and an event that CHANGES a shard-key field is isolated in its own
  single-op bulk (``GetDocumentKey``'s ``updateKey`` contract) so the
  key-changing replace applies alone.

Spark-first: the document JSON, the ``_id``, and the FNV shard id are
planned as Catalyst expressions (reusing the byte-exact ``fnv1a32`` of
the ClickHouse sink); the batch repartitions on the shard id and sorts
within partitions by (shard, LSN, counter), so each executor walks its
shards' events in order and only assembles operation dicts. The actual
``pymongo`` apply is gated behind an import-try (no MongoDB in this
environment); tests inject a recording applier and cover the
splitter/shard/model planning for real.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import (
    COUNTER_COL,
    LSN_COL,
    OP_COL,
    OP_DELETE,
    PRESENT_COL,
    REMOVED_COL,
    TOASTED_COL,
    has_partial_rows,
)
from transferia_spark.cdc.collapse import (
    FULL_NET_COL,
    PRESENT_NET_COL,
    REMOVED_NET_COL,
    collapse,
)
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, Sink, register_sink
from transferia_spark.sinks.clickhouse import fnv1a32

WRITE_SHARDS = 16  # sinkWriteConcurrency in the reference
_SYSTEM_COLS = (
    OP_COL, LSN_COL, COUNTER_COL, "_commit_ts", "_tx_id", "_before",
    "_batch", PRESENT_COL, PRESENT_NET_COL, REMOVED_COL,
    REMOVED_NET_COL, FULL_NET_COL, TOASTED_COL,
)


# ------------------------------------------------ sharded collections


def get_value_by_path(doc, path: str):
    """Dotted-path lookup into nested dicts → (value, found)
    (≈ ``bson.go GetValueByPath:123``)."""
    val = doc
    for key in path.split("."):
        if not isinstance(val, dict) or key not in val:
            return None, False
        val = val[key]
    return val, True


def set_value_by_path(doc: dict, path: str, value) -> None:
    """Dotted-path set, creating intermediate dicts
    (≈ ``bson.go SetValueByPath:145``, dict-only shape)."""
    keys = path.split(".")
    cur = doc
    for key in keys[:-1]:
        nxt = cur.get(key)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[key] = nxt
        cur = nxt
    cur[keys[-1]] = value


def has_key_diff(left: dict, right: dict, keys: list[str]) -> bool:
    """True when any shard-key path differs between two key documents
    (≈ ``document.go hasDiff:144``)."""
    for key in keys:
        lv, lok = get_value_by_path(left, key)
        rv, rok = get_value_by_path(right, key)
        if lok and rok and lv != rv:
            return True
        if (not lok or not rok) and (lv is not None or rv is not None):
            return True
    return False


def _uses_id(path: str) -> bool:
    return path == "_id" or path.startswith("_id.")


class ShardKeyInfo:
    """A target collection's shard key (≈ ``shard_key.go
    ShardKeysInfo``): the ordered field paths plus the two shape
    flags the sink branches on."""

    def __init__(self, fields: list[str]):
        self.fields = list(fields)
        self.is_trivial = all(_uses_id(f) for f in self.fields)
        self.contains_id = any(_uses_id(f) for f in self.fields)

    def __repr__(self):
        return f"ShardKeyInfo({self.fields!r})"


def wire_shard_key_provider(uri: str, database: str,
                            collection: str) -> ShardKeyInfo | None:
    """Default shard-key lookup over the zero-dependency wire client:
    ``config.collections`` holds one doc per sharded collection keyed
    by its full name (≈ ``shard_key.go GetShardingKey:79``). Returns
    None for unsharded collections (no doc / no ``key``) — sharding
    disabled, `_id`-only filters. Lookup failures are downgraded to
    "unsharded" by the caller with a warning — the reference does the
    same (``newShardedCollectionSinkContext`` Debugf) because plain
    replica sets have no config.collections to ask."""
    from transferia_spark.streaming.mongo_wire import with_shared_adapter

    docs = with_shared_adapter(uri, lambda a: list(
        a["config"]["collections"].find(
            filter={"_id": f"{database}.{collection}"}, limit=1,
        )
    ))
    if not docs or not isinstance(docs[0].get("key"), dict):
        return None
    return ShardKeyInfo(list(docs[0]["key"].keys()))


def wire_doc_key_fetcher(uri: str, database: str, collection: str,
                         ids: list, fields: list[str]) -> list[dict]:
    """Default stored-key lookup (≈ ``sharded_collection.go
    Init:25``): one ``$in`` find over the batch's ids projecting only
    ``_id`` + the non-``_id`` shard-key paths — O(batch) per
    partition, never O(collection). The adapter is per-process memoized
    (one TCP+TLS+SCRAM dial per executor instead of one per partition
    per batch). Fetched values are normalized through
    ``bson_to_jsonable`` so (a) wire-plane wrapper types
    (ObjectId/Decimal128/datetime) never reach a pymongo filter they
    cannot BSON-encode, and (b) the stored-key cache keys render
    deterministically on both sides (advisor r13).

    VALUE-PLANE CONTRACT: this sink's whole document plane is
    JSON-rendered — planned docs/ids come from Spark ``to_json``, so
    documents THIS sink writes carry strings where the source had
    timestamps/binary, and jsonable-normalized filters compare equal
    to them (and to the planner's own key values in
    ``has_key_diff``). The known divergence: a PRE-EXISTING target
    document written by another tool with a BSON-native (date/Binary)
    non-``_id`` shard-key value won't match the string-typed filter —
    that heterogeneous-writer case needs a BSON-native value plane
    end-to-end, which the JSON planning contract deliberately trades
    away (documented, code-review r14)."""
    from transferia_spark.streaming.mongo_wire import (
        bson_to_jsonable,
        with_shared_adapter,
    )

    projection = {"_id": 1}
    for f in fields:
        if not _uses_id(f):
            projection[f] = 1
    docs = with_shared_adapter(uri, lambda a: list(
        a[database][collection].find(
            filter={"_id": {"$in": list(ids)}},
            projection=projection,
        )
    ))
    return [bson_to_jsonable(d) for d in docs]


def _id_cache_key(id_val) -> str:
    """Stable string form of a document ``_id`` for the stored-key
    cache — both sides (planned rows, fetched docs) normalize through
    it (≈ ``documentID.String``)."""
    return json.dumps(id_val, sort_keys=True, separators=(",", ":"),
                      default=str)


def plan_sharded_ops(rows, key_fields: list[str],
                     stored_keys: dict[str, dict],
                     max_ops: int = 1000,
                     pk_cols: list[str] | None = None,
                     ) -> dict[int, list[list[dict]]]:
    """The executor-side op planner for one partition of planned rows
    (``_id_json/_doc_json/_shard/_mop``-shaped, already sorted by
    (shard, lsn, counter)): builds replace/delete op dicts with
    shard-key-aware filters and cuts bulks per shard. ``key_fields``
    empty/None → the unsharded `_id`-only path. Returns
    {shard: [bulk, ...]} preserving per-shard op order.
    ≈ ``splitItemsToBulkOperations`` + ``makeWriteModel`` +
    ``GetDocumentKey``/``getResultDocumentKey``
    (sink_bulk_operations.go:22,167; sharded_collection.go:96,120)."""
    nontrivial = [f for f in (key_fields or []) if not _uses_id(f)]
    splitters: dict[int, BulkSplitter] = {}
    cache = stored_keys  # id cache key -> stored key document
    for row in rows:
        id_val = json.loads(row["_id_json"])["v"]
        ck = _id_cache_key(id_val)
        flt = {"_id": id_val}
        isolated = False
        if row["_mop"] == OP_DELETE:
            cache.pop(ck, None)  # delete uses the _id-only filter
            op = {"op": "delete", "filter": flt}
        else:
            doc = json.loads(row["_doc_json"])
            presence = (
                json.loads(row["_present_json"])
                if "_present_json" in row and row["_present_json"]
                else None
            )
            removed_net = (
                json.loads(row["_removed_json"])
                if "_removed_json" in row and row["_removed_json"]
                else {}
            )
            carried = (
                None if presence is None
                else {c for c, b in presence.items() if b}
            )
            # a frame without the full-image net bit (pre-r14 caller,
            # direct planner use) keeps the old full-image assumption
            full_net = (
                row[FULL_NET_COL] if FULL_NET_COL in row else None
            )
            if full_net is None:
                full_net = True
            # partial when any column is uncarried, OR any net write is
            # a removal (a removal can only come from a partial event —
            # full images carry every column and clear the bit in the
            # fold), OR the key's whole history is partial patches (an
            # all-carried patch chain is still not a full document):
            # replacing in any of these would wipe the target's
            # UNDECLARED fields a mongo document may carry outside the
            # probed schema — the reference's makeUpdateModel applies
            # $set/$unset for every partial update (write_models.go:23)
            partial = carried is not None and (
                any(not b for b in presence.values())
                or any(removed_net.get(c) for c in carried)
                or not full_net
            )
            if pk_cols is not None:
                # single-PK payload column becomes the document _id;
                # composite keys keep the struct id (MongoSink._push
                # contract, unchanged)
                if len(pk_cols) == 1 and pk_cols[0] in doc:
                    doc["_id"] = doc.pop(pk_cols[0])
                else:
                    doc["_id"] = id_val
            if key_fields:
                stored = cache.get(ck)
                if partial and stored is not None:
                    # partial update: the result key is the STORED key
                    # patched with the CARRIED key fields only
                    # (≈ getResultDocumentKey + CheckDiffByKeys,
                    # sharded_collection.go:120, schema.go:201).
                    # deepcopy: the default fetcher normalizes docs to
                    # JSON-safe values (r14), but an INJECTED fetcher
                    # may return BSON-native values json cannot carry
                    import copy as _copy

                    item_key = _copy.deepcopy(stored)
                    src = {"_id": id_val,
                           **{c: doc.get(c) for c in carried}}
                    for f in key_fields:
                        v, ok = get_value_by_path(src, f)
                        if ok or f.split(".", 1)[0] in carried:
                            set_value_by_path(item_key, f, v)
                else:
                    # full image (or unseen id): the item's own key
                    # values are the would-be stored key
                    item_key = {}
                    for f in key_fields:
                        v, ok = get_value_by_path(
                            {**doc, "_id": id_val}, f
                        )
                        if ok:
                            set_value_by_path(item_key, f, v)
                if stored is not None:
                    isolated = has_key_diff(stored, item_key,
                                            key_fields)
                    filter_key = stored
                    if isolated:
                        cache[ck] = item_key
                else:
                    filter_key = item_key
                    cache[ck] = item_key
                for f in nontrivial:
                    v, ok = get_value_by_path(filter_key, f)
                    if ok:
                        flt[f] = v  # mongos targets one shard
            if partial:
                # UpdateOne over the carried columns only — a replace
                # would wipe every uncarried field. A column the net
                # removal marker flags becomes a true ``$unset``
                # (≈ makeUpdateModel, write_models.go:23-47); a carried
                # column ABSENT from the null-dropping doc JSON is a
                # genuine SET col = NULL and patches explicit null.
                # planned() projects presence/removal to PAYLOAD
                # columns only, so system columns (_batch) can never
                # leak as spurious null patches (code-review r13 pass 2)
                patch = {}
                unset = []
                for c in sorted(carried):
                    if removed_net.get(c):
                        unset.append(c)
                    elif c in doc:
                        patch[c] = doc[c]
                    else:
                        patch[c] = None
                if not patch and not unset:
                    continue  # nothing carried: nothing to apply
                op = {"op": "update", "filter": flt}
                if patch:
                    op["set"] = patch
                if unset:
                    op["unset"] = unset
            else:
                op = {"op": "replace", "filter": flt, "doc": doc}
            if isolated:
                # marker for observability/tests; appliers ignore it
                op["_isolated"] = True
        splitters.setdefault(
            row["_shard"], BulkSplitter(max_ops)
        ).add(op, row["_id_json"], isolated=isolated)
    out = {s: sp.get() for s, sp in splitters.items()}
    return {s: bulks for s, bulks in out.items() if bulks}


class BulkSplitter:
    """≈ ``bulkSplitter``: append operations, cutting a new bulk when
    the current one already touches the operation's ``_id`` (or the op
    is isolated). Every emitted bulk has distinct ids → safe to apply
    unordered; the bulk sequence preserves per-id order."""

    def __init__(self, max_ops: int = 1000):
        self.bulks: list[list[dict]] = []
        self.current: list[dict] = []
        self.ids: set[str] = set()
        self.max_ops = max_ops

    def add(self, op: dict, id_str: str, isolated: bool = False) -> None:
        if id_str in self.ids or isolated or len(self.current) >= self.max_ops:
            self.flush()
        self.current.append(op)
        self.ids.add(id_str)
        if isolated:
            self.flush()

    def flush(self) -> None:
        if self.current:
            self.bulks.append(self.current)
            self.current = []
            self.ids = set()

    def get(self) -> list[list[dict]]:
        self.flush()
        return self.bulks


#: per-process pymongo client memo (the schema-registry ``client_for``
#: pattern): the applier factory runs once per partition per batch, and
#: a fresh MongoClient there is a fresh connection-pool handshake —
#: ~WRITE_SHARDS of them per batch per table (advisor/verdict r13).
#: MongoClient is thread-safe and pools internally, so sharing is safe.
_PYMONGO_CLIENTS: dict = {}


#: split write-command payloads below the server's 16MB BSON command
#: cap (pymongo splits by message size the same way; BulkSplitter only
#: caps op COUNT, never bytes — a bulk of wide documents must not
#: become one oversized command the server rejects permanently)
_WIRE_CMD_MAX_BYTES = 14 * 1024 * 1024


def _chunk_specs_by_size(specs: list[dict],
                         max_bytes: int | None = None):
    from transferia_spark.streaming.mongo_wire import encode_document

    if max_bytes is None:  # read the global at CALL time (testable)
        max_bytes = _WIRE_CMD_MAX_BYTES
    out, cur, size = [], [], 0
    for s in specs:
        sz = len(encode_document(s))
        if cur and size + sz > max_bytes:
            out.append(cur)
            cur, size = [], 0
        cur.append(s)
        size += sz
    if cur:
        out.append(cur)
    return out


def _check_write_reply(r: dict) -> None:
    """ok:1 replies still carry per-op failures (``writeErrors``) and
    durability failures (``writeConcernError`` — the write may roll
    back on an unacknowledged primary); both must fail the batch the
    way pymongo's bulk_write raises (code-review r14)."""
    from transferia_spark.streaming.mongo_wire import MongoServerError

    if r.get("writeErrors"):
        raise MongoServerError({"ok": 0, **r["writeErrors"][0]})
    if r.get("writeConcernError"):
        raise MongoServerError({"ok": 0, **r["writeConcernError"]})


def wire_applier(uri: str):
    """Zero-dependency applier over the wire client (no pymongo):
    each planned bulk becomes ``update``/``delete`` write commands
    (size-chunked under the 16MB command cap), unordered — safe
    because every bulk carries DISTINCT ids (the BulkSplitter
    contract), so updates before deletes within a bulk cannot reorder
    a single document's history. Semantics mirror
    ``pymongo_applier``/the reference's write models
    (``write_models.go:10-60``): replaces and partial patches upsert,
    deletes are single-document, ``cleanup`` maps to ``drop`` /
    delete-all. Against a replica set or mongos (unless the URI says
    ``retryWrites=false``) the commands carry ``lsid``/``txnNumber``
    (retryable writes — REQUIRED for shard-key-changing updates on
    mongos ≥4.2); the session id and per-chunk numbers are owned by
    THIS applier, so the shared adapter's evict-and-redial retry
    resends the SAME txnNumber and the server dedupes the replay
    instead of re-executing it. Rides the per-process shared adapter
    (one dial per executor)."""
    import itertools
    import uuid

    from transferia_spark.streaming.mongo_wire import (
        Binary,
        Int64,
        MongoServerError,
        with_shared_adapter,
    )

    lsid = {"id": Binary(uuid.uuid4().bytes, 4)}
    txn_numbers = itertools.count(1)

    def apply(database: str, collection: str,
              bulks: Iterable[list[dict]]) -> None:
        for bulk in bulks:
            updates, deletes = [], []
            drop = clear = False
            for op in bulk:
                if op["op"] == "replace":
                    updates.append({
                        "q": op["filter"], "u": op["doc"],
                        "upsert": True, "multi": False,
                    })
                elif op["op"] == "delete":
                    deletes.append({"q": op["filter"], "limit": 1})
                elif op["op"] == "cleanup":
                    if op.get("policy") == "drop":
                        drop = True
                    else:
                        clear = True
                else:  # partial update
                    u = {}
                    if op.get("set"):
                        u["$set"] = op["set"]
                    if op.get("unset"):
                        u["$unset"] = {k: "" for k in op["unset"]}
                    updates.append({
                        "q": op["filter"], "u": u,
                        "upsert": True, "multi": False,
                    })

            # chunk + number OUTSIDE the retried closure: a redial
            # replay re-sends identical (lsid, txnNumber) statements
            upd_chunks = [
                (c, next(txn_numbers))
                for c in _chunk_specs_by_size(updates)
            ]
            del_chunks = [
                (c, next(txn_numbers))
                for c in _chunk_specs_by_size(deletes)
            ]

            def run(a):
                session = (
                    {"lsid": lsid} if a.supports_retryable_writes()
                    else None
                )
                for chunk, tn in upd_chunks:
                    body = {"update": collection, "updates": chunk,
                            "ordered": False}
                    if session:
                        body.update(session, txnNumber=Int64(tn))
                    _check_write_reply(a.command(database, body))
                for chunk, tn in del_chunks:
                    body = {"delete": collection, "deletes": chunk,
                            "ordered": False}
                    if session:
                        body.update(session, txnNumber=Int64(tn))
                    _check_write_reply(a.command(database, body))
                if drop:
                    try:
                        _check_write_reply(
                            a.command(database, {"drop": collection})
                        )
                    except MongoServerError as e:
                        # dropping an absent collection is a no-op,
                        # matching pymongo's Collection.drop()
                        # (NamespaceNotFound — by code, not message)
                        if e.doc.get("code") != 26:
                            raise
                if clear:
                    # delete-all is a multi-statement (limit: 0) —
                    # retryable writes forbid those, so no session
                    _check_write_reply(a.command(database, {
                        "delete": collection,
                        "deletes": [{"q": {}, "limit": 0}],
                    }))

            with_shared_adapter(uri, run)

    return apply


def default_applier(uri: str):
    """pymongo when installed (connection pooling, retryable writes),
    else the zero-dependency wire applier — the sink works lib-free
    like the rest of the engine (r14; it used to raise)."""
    try:
        import pymongo  # noqa: F401
    except ImportError:
        return wire_applier(uri)
    return pymongo_applier(uri)


def pymongo_applier(uri: str):
    """Real applier (gated): returns a callable applying bulks to a
    collection via pymongo's BulkWrite, unordered per bulk."""
    try:
        import pymongo
    except ImportError as e:  # pragma: no cover - env gate
        raise NotImplementedError(
            "mongo sink transport needs the 'pymongo' package; install it "
            "or use wire_applier / inject one via applier_factory"
        ) from e

    client = _PYMONGO_CLIENTS.get(uri)
    if client is None:
        client = _PYMONGO_CLIENTS[uri] = pymongo.MongoClient(uri)

    def apply(database: str, collection: str, bulks: Iterable[list[dict]]) -> None:
        coll = client[database][collection]
        for bulk in bulks:
            models = []
            for op in bulk:
                if op["op"] == "replace":
                    models.append(
                        pymongo.ReplaceOne(op["filter"], op["doc"], upsert=True)
                    )
                elif op["op"] == "delete":
                    models.append(pymongo.DeleteOne(op["filter"]))
                elif op["op"] == "cleanup":
                    # sentinel emitted by MongoSink.cleanup: Drop drops
                    # the collection, Truncate empties it in place
                    if op.get("policy") == "drop":
                        coll.drop()
                    else:
                        coll.delete_many({})
                else:
                    update = {}
                    if op.get("set"):
                        update["$set"] = op["set"]
                    if op.get("unset"):
                        update["$unset"] = {k: "" for k in op["unset"]}
                    # upsert=True ≈ makeUpdateModel SetUpsert(true)
                    # (write_models.go:35): a partial patch for a
                    # document missing at the target creates the
                    # partial document (filter equality fields + $set)
                    # instead of silently no-opping
                    models.append(pymongo.UpdateOne(op["filter"], update, upsert=True))
            if models:
                coll.bulk_write(models, ordered=False)

    return apply


@register_sink
class MongoSink(Sink):
    """Sharded bulk-write MongoDB sink (collection per table)."""

    TYPE = "mongo"

    def __init__(
        self,
        uri: str = "",
        database: str = "",
        keys: list[str] | None = None,
        write_shards: int = WRITE_SHARDS,
        max_bulk_ops: int = 1000,
        applier_factory: Callable[[str], Callable] | None = None,
        shard_key_provider: Callable[..., ShardKeyInfo | None] | None = None,
        doc_key_fetcher: Callable[..., list[dict]] | None = None,
        sharded_upserts: bool = True,
        shard_key_ttl: float = 60.0,
    ):
        self.uri, self.database = uri, database
        self.keys = keys or ["_id"]
        self.write_shards = write_shards
        self.max_bulk_ops = max_bulk_ops
        self.applier_factory = applier_factory or default_applier
        # sharded-target support (≈ sharded_collection.go): the
        # provider reads config.collections once per table (driver
        # side, memoized); the fetcher runs per partition per batch
        self.shard_key_provider = shard_key_provider or wire_shard_key_provider
        self.doc_key_fetcher = doc_key_fetcher or wire_doc_key_fetcher
        # the default provider dials self.uri — pointless (and a
        # misleading warning) when the transport itself was injected
        # and no provider came with it
        self.sharded_upserts = sharded_upserts and not (
            applier_factory is not None and shard_key_provider is None
        )
        # TTL on the per-(db, collection) shard-key memo: the reference
        # rebuilds the sharded-collection context on every push
        # (newShardedCollectionSinkContext per bulk); a bounded TTL
        # keeps a collection sharded/resharded MID-transfer from riding
        # stale filters forever while still amortizing the
        # config.collections read across batches (advisor r13).
        # shard_key_ttl <= 0 re-reads every push.
        self.shard_key_ttl = shard_key_ttl
        self._shard_info_cache: dict[
            str, tuple[ShardKeyInfo | None, float]
        ] = {}

    def _shard_key_info(self, database: str,
                        collection: str) -> ShardKeyInfo | None:
        """Driver-side, once per (db, collection) per TTL window: the
        shard key from config.collections, or None when the target is
        not a sharded collection (also when sharded_upserts=False or
        the default provider is used with an applier-injected test
        double — there is no config db to ask)."""
        if not self.sharded_upserts:
            return None
        import time

        key = f"{database}.{collection}"
        hit = self._shard_info_cache.get(key)
        now = time.monotonic()
        if hit is not None and now - hit[1] < self.shard_key_ttl:
            return hit[0]
        try:
            info = self.shard_key_provider(self.uri, database, collection)
        except Exception as e:  # ≈ reference: debug-log + disable
            import logging

            logging.getLogger(__name__).warning(
                "cannot read shard key for %s (%s) — treating the "
                "target as unsharded; upserts filter on _id only",
                key, e,
            )
            info = None
        self._shard_info_cache[key] = (info, now)
        return info

    # -- planning ----------------------------------------------------

    def _id_column(self, df: DataFrame):
        """Document ``_id``: the single PK value, or a subdocument of
        the composite key columns (string form shards/filters)."""
        if len(self.keys) == 1 and self.keys[0] in df.columns:
            return F.col(self.keys[0])
        return F.struct(*[F.col(k) for k in self.keys])

    def planned(self, df: DataFrame) -> DataFrame:
        """(_id_json, _doc_json, _shard, _op?, _lsn, _counter) — every
        expensive transformation stays in Catalyst."""
        payload = [c for c in df.columns if c not in _SYSTEM_COLS]

        def _net_json(net_col: str):
            # per-column net bits from the presence-aware collapse,
            # projected to PAYLOAD columns only: the collapse struct
            # can name system columns (_batch rides outside META_COLS)
            # which must never become patch keys (code-review r13)
            if net_col not in df.columns:
                return F.lit(None).cast("string")
            fields = [
                f.name for f in df.schema[net_col].dataType.fields
                if f.name in payload
            ]
            return F.to_json(F.struct(
                *[F.col(f"{net_col}.{c}").alias(c) for c in fields]
            ))

        id_col = self._id_column(df)
        id_str = F.to_json(F.struct(id_col.alias("v")))
        cols = [
            id_str.alias("_id_json"),
            F.to_json(F.struct(*[F.col(c) for c in payload])).alias("_doc_json"),
            F.pmod(fnv1a32(id_str), F.lit(self.write_shards)).cast("int").alias("_shard"),
            (F.col(OP_COL) if OP_COL in df.columns else F.lit("i")).alias("_mop"),
            (F.col(LSN_COL) if LSN_COL in df.columns else F.lit(0)).alias("_mlsn"),
            (F.col(COUNTER_COL) if COUNTER_COL in df.columns else F.lit(0)).alias("_mctr"),
            # partial change-stream updates become UpdateOne ops
            # instead of replaces that would wipe uncarried fields;
            # net-removed columns become true $unset ops
            _net_json(PRESENT_NET_COL).alias("_present_json"),
            _net_json(REMOVED_NET_COL).alias("_removed_json"),
            # did any event for the key carry a full row image? An
            # all-partial history must stay on the update-patch path
            # even when every declared column happens to be carried —
            # replacing would wipe the target doc's undeclared fields
            # (code-review r14)
            (
                F.col(FULL_NET_COL)
                if FULL_NET_COL in df.columns
                else F.lit(None).cast("boolean")
            ).alias(FULL_NET_COL),
        ]
        return df.select(*cols)

    # -- delivery ----------------------------------------------------

    def _push(self, df: DataFrame, table: TableID) -> None:
        planned = (
            self.planned(df)
            .repartition(self.write_shards, F.col("_shard"))
            .sortWithinPartitions("_shard", "_mlsn", "_mctr")
        )
        database = self.database or table.namespace or "db"
        collection = table.name
        factory, uri, max_ops = self.applier_factory, self.uri, self.max_bulk_ops
        keys = self.keys
        info = self._shard_key_info(database, collection)
        key_fields = info.fields if info and not info.is_trivial else None
        fetcher = self.doc_key_fetcher

        def per_partition(rows):
            apply = factory(uri)
            stored: dict[str, dict] = {}
            if key_fields:
                # one bounded $in lookup for THIS partition's ids —
                # O(partition), runs on the executor that owns them
                rows = list(rows)
                ids = {}
                for row in rows:
                    v = json.loads(row["_id_json"])["v"]
                    ids[_id_cache_key(v)] = v
                if ids:
                    for doc in fetcher(uri, database, collection,
                                       list(ids.values()), key_fields):
                        stored[_id_cache_key(doc["_id"])] = doc
            by_shard = plan_sharded_ops(
                rows, key_fields, stored, max_ops, pk_cols=keys,
            )
            for _shard, bulks in sorted(by_shard.items()):
                apply(database, collection, bulks)

        planned.foreachPartition(per_partition)

    def write(self, df: DataFrame, table: TableID) -> None:
        self._push(df, table)

    def write_cdc(self, batch: DataFrame, table: TableID, keys: list[str]) -> None:
        """Collapse to net effect per key first (each id then appears
        once → single unordered bulk per shard), then push. Batches
        carrying a partial-row marker (mongo change-stream updates
        without a full image) collapse presence-aware, so uncarried
        columns become UpdateOne $set patches instead of replace-wiped
        fields (≈ makeUpdateModel, write_models.go:33)."""
        self.keys = keys
        self._push(
            collapse(batch, keys, with_presence=has_partial_rows(batch)),
            table,
        )

    def cleanup(self, table: TableID, policy: CleanupPolicy) -> None:
        if policy == CleanupPolicy.DISABLED:
            return
        apply = self.applier_factory(self.uri)
        database = self.database or table.namespace or "db"
        # both policies empty the collection; a real applier may
        # interpret drop vs delete-many — the planned op says which
        apply(database, table.name, [[{"op": "cleanup", "policy": policy.value}]])


__all__ = [
    "MongoSink",
    "BulkSplitter",
    "ShardKeyInfo",
    "default_applier",
    "get_value_by_path",
    "has_key_diff",
    "plan_sharded_ops",
    "pymongo_applier",
    "set_value_by_path",
    "wire_applier",
    "wire_doc_key_fetcher",
    "wire_shard_key_provider",
    "WRITE_SHARDS",
]
