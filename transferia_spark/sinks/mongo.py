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
- snapshot Drop/Truncate → drop collection / delete-many.

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

from transferia_spark.cdc.changeitem import COUNTER_COL, LSN_COL, OP_COL, OP_DELETE
from transferia_spark.cdc.collapse import collapse
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, Sink, register_sink
from transferia_spark.sinks.clickhouse import fnv1a32

WRITE_SHARDS = 16  # sinkWriteConcurrency in the reference
_SYSTEM_COLS = (OP_COL, LSN_COL, COUNTER_COL, "_commit_ts", "_tx_id", "_before", "_batch")


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


def pymongo_applier(uri: str):
    """Real applier (gated): returns a callable applying bulks to a
    collection via pymongo's BulkWrite, unordered per bulk."""
    try:
        import pymongo
    except ImportError as e:  # pragma: no cover - env gate
        raise NotImplementedError(
            "mongo sink transport needs the 'pymongo' package; install it "
            "or inject an applier via applier_factory"
        ) from e

    client = pymongo.MongoClient(uri)

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
                    models.append(pymongo.UpdateOne(op["filter"], update, upsert=False))
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
    ):
        self.uri, self.database = uri, database
        self.keys = keys or ["_id"]
        self.write_shards = write_shards
        self.max_bulk_ops = max_bulk_ops
        self.applier_factory = applier_factory or pymongo_applier

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
        id_col = self._id_column(df)
        id_str = F.to_json(F.struct(id_col.alias("v")))
        cols = [
            id_str.alias("_id_json"),
            F.to_json(F.struct(*[F.col(c) for c in payload])).alias("_doc_json"),
            F.pmod(fnv1a32(id_str), F.lit(self.write_shards)).cast("int").alias("_shard"),
            (F.col(OP_COL) if OP_COL in df.columns else F.lit("i")).alias("_mop"),
            (F.col(LSN_COL) if LSN_COL in df.columns else F.lit(0)).alias("_mlsn"),
            (F.col(COUNTER_COL) if COUNTER_COL in df.columns else F.lit(0)).alias("_mctr"),
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

        def per_partition(rows):
            apply = factory(uri)
            splitters: dict[int, BulkSplitter] = {}
            for row in rows:
                id_val = json.loads(row["_id_json"])["v"]
                flt = {"_id": id_val}
                if row["_mop"] == OP_DELETE:
                    op = {"op": "delete", "filter": flt}
                else:
                    doc = json.loads(row["_doc_json"])
                    if len(keys) == 1 and keys[0] in doc:
                        doc["_id"] = doc.pop(keys[0])
                    else:
                        doc["_id"] = id_val
                    op = {"op": "replace", "filter": flt, "doc": doc}
                splitters.setdefault(
                    row["_shard"], BulkSplitter(max_ops)
                ).add(op, row["_id_json"])
            for splitter in splitters.values():
                bulks = splitter.get()
                if bulks:
                    apply(database, collection, bulks)

        planned.foreachPartition(per_partition)

    def write(self, df: DataFrame, table: TableID) -> None:
        self._push(df, table)

    def write_cdc(self, batch: DataFrame, table: TableID, keys: list[str]) -> None:
        """Collapse to net effect per key first (each id then appears
        once → single unordered bulk per shard), then push."""
        self.keys = keys
        self._push(collapse(batch, keys), table)

    def cleanup(self, table: TableID, policy: CleanupPolicy) -> None:
        if policy == CleanupPolicy.DISABLED:
            return
        apply = self.applier_factory(self.uri)
        database = self.database or table.namespace or "db"
        # both policies empty the collection; a real applier may
        # interpret drop vs delete-many — the planned op says which
        apply(database, table.name, [[{"op": "cleanup", "policy": policy.value}]])


__all__ = ["MongoSink", "BulkSplitter", "pymongo_applier", "WRITE_SHARDS"]
