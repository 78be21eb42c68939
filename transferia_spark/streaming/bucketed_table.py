"""Hash-bucketed versioned parquet table: bucket-scoped CDC MERGE.

``ParquetTable`` + ``merge_batch`` rewrite the WHOLE table every
micro-batch — correct, but O(table) I/O per batch: a 100 TB target
cannot re-stream 100 TB every 333 ms. This table fixes the asymptotics
the way Delta/Iceberg/Hudi do, with a manifest instead of a log:

- rows hash into ``n_buckets`` by primary key
  (``pmod(xxhash64(keys), n))`` — the same PK-hash sharding the
  reference uses for parallel snapshots (``sharding_storage.go:195``)
- a MERGE touches only the buckets whose keys appear in the batch:
  read those buckets' current files, merge, write ONLY those buckets
  into the new version directory
- ``_manifest_v{n}.json`` maps every bucket to the version directory
  that last rewrote it; ``_CURRENT`` names the live manifest and flips
  atomically (``os.replace``), so readers always see a consistent
  bucket set and a crashed writer leaves the table untouched

Per-batch cost: O(|batch| + size of touched buckets), independent of
table size when key locality is decent. Worst case (a batch touching
every bucket) degrades to the full rewrite — no worse than before.
Single-writer, like ``ParquetTable``; size ``n_buckets`` so a bucket
(table_size / n_buckets) fits comfortably in one executor's scan
budget (~1 GB buckets → n_buckets = table_size_gb).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transferia_spark.cdc.merge import merge_batch

BUCKET_COL = "bkt"  # no leading underscore: `_…=3` dirs are invisible
# to Spark's file discovery (treated as metadata)


class BucketedParquetTable:
    """Versioned, PK-hash-bucketed parquet table with atomic manifest
    swap and bucket-scoped merges."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        keys: list[str],
        n_buckets: int = 64,
        retention: int = 2,
    ):
        """``retention`` is the number of trailing manifest versions kept
        on disk — it IS the reader lease: a reader that resolved manifest
        ``v`` may keep reading ``v``'s file paths while at most
        ``retention - 1`` further commits land. Size it to cover the
        longest concurrent read (a long scan overlapping a fast CDC
        writer needs a larger window); GC after each commit only drops
        version dirs no retained manifest references."""
        self.spark = spark
        self.root = root
        self.keys = keys
        self.n_buckets = n_buckets
        self.retention = max(1, retention)
        self._schema_json: dict | None = None
        os.makedirs(root, exist_ok=True)
        # the bucket function is part of the ON-DISK layout: reopening
        # with a different n_buckets would silently mis-bucket merges
        # (keys hash to manifest-absent buckets → lost updates), so the
        # stored metadata wins and a key mismatch is an error
        meta = self._load_meta()
        if meta is not None:
            if meta["keys"] != list(keys):
                raise ValueError(
                    f"table at {root} is keyed by {meta['keys']}, got {keys}"
                )
            self.n_buckets = int(meta["n_buckets"])
            self._schema_json = meta.get("schema")

    # ---------------------------------------------------------- layout

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "_meta.json")

    def _load_meta(self) -> dict | None:
        try:
            with open(self._meta_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _save_meta(self, schema) -> None:
        self._schema_json = json.loads(schema.json())
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "keys": list(self.keys),
                    "n_buckets": self.n_buckets,
                    "schema": self._schema_json,
                },
                f,
            )
        os.replace(tmp, self._meta_path)

    def _stored_schema(self):
        from pyspark.sql import types as T

        if self._schema_json is None:
            return None
        return T.StructType.fromJson(self._schema_json)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def version(self) -> int:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def exists(self) -> bool:
        return self.version() >= 0

    def _manifest_path(self, v: int) -> str:
        return os.path.join(self.root, f"_manifest_v{v}.json")

    def manifest(self, v: int | None = None) -> dict[int, int]:
        v = self.version() if v is None else v
        if v < 0:
            return {}
        with open(self._manifest_path(v)) as f:
            return {int(b): int(ver) for b, ver in json.load(f).items()}

    def _bucket_dir(self, ver: int, bucket: int) -> str:
        return os.path.join(self.root, f"_v{ver}", f"{BUCKET_COL}={bucket}")

    def _bucket_of(self) -> F.Column:
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in self.keys]), F.lit(self.n_buckets)
        ).cast("int")

    # ------------------------------------------------------------ read

    def read(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> DataFrame:
        """Read the current version, or a pinned ``version`` — valid as
        long as the pin is within the ``retention`` window (the reader
        lease): GC keeps every version dir referenced by the trailing
        ``retention`` manifests, so a reader holding manifest ``v`` sees
        stable paths while up to ``retention - 1`` commits land."""
        m = self.manifest(version)
        if not m and buckets is None:
            raise FileNotFoundError(f"no current version in {self.root}")
        wanted = sorted(m) if buckets is None else buckets
        paths = [
            self._bucket_dir(m[b], b)
            for b in wanted
            if b in m and os.path.isdir(self._bucket_dir(m[b], b))
        ]
        if not paths:
            # table exists but the wanted buckets hold no rows (e.g.
            # fully deleted) — an empty frame with the table schema,
            # matching ParquetTable's empty-after-delete behavior
            schema = self._stored_schema()
            if schema is not None:
                return self.spark.createDataFrame([], schema)
            raise FileNotFoundError(
                f"no data for buckets {wanted} in {self.root}"
            )
        return self.spark.read.parquet(*paths)

    def _read_or_empty(self, buckets: list[int], schema) -> DataFrame:
        try:
            return self.read(buckets)
        except FileNotFoundError:
            return self.spark.createDataFrame([], schema)

    # ----------------------------------------------------------- write

    def merge(self, batch: DataFrame, toast_aware: bool | None = None) -> int:
        """Apply one ChangeItem batch; rewrite only touched buckets."""
        from transferia_spark.cdc.changeitem import META_COLS
        from pyspark.sql import types as T

        stored = self._stored_schema()
        if stored is not None:
            # normalize key dtypes to the table's: xxhash64 is
            # TYPE-SENSITIVE, so an int batch key vs a bigint stored
            # key would compute `touched` buckets that disagree with
            # the buckets _commit assigns to the merged (widened) rows
            # — committed rows the manifest never points at
            types = {f.name: f.dataType for f in stored.fields}
            for k in self.keys:
                if k in types and batch.schema[k].dataType != types[k]:
                    batch = batch.withColumn(k, F.col(k).cast(types[k]))
        # the batch feeds two jobs (touched-bucket collect + the merge
        # write); persist so an upstream transformation chain isn't
        # recomputed per job
        batch = batch.persist()
        try:
            # touched buckets come from the AFTER-image keys AND from
            # the pre-image keys of PK-changing updates: collapse
            # rewrites those to delete(old)+insert(new), and the delete
            # lands in the OLD key's bucket — omitting it left the
            # stale row alive (caught by the binlog→pipeline
            # integration test)
            bucket_sources = batch.select(self._bucket_of().alias(BUCKET_COL))
            from transferia_spark.cdc.changeitem import BEFORE_COL

            if BEFORE_COL in batch.columns:
                types = (
                    {f.name: f.dataType for f in stored.fields}
                    if stored is not None
                    else {f.name: f.dataType for f in batch.schema.fields}
                )
                before_bucket = F.pmod(
                    F.xxhash64(
                        *[
                            F.col(f"{BEFORE_COL}.{k}").cast(types[k])
                            if k in types
                            else F.col(f"{BEFORE_COL}.{k}")
                            for k in self.keys
                        ]
                    ),
                    F.lit(self.n_buckets),
                ).cast("int")
                bucket_sources = bucket_sources.union(
                    batch.filter(F.col(BEFORE_COL).isNotNull()).select(
                        before_bucket.alias(BUCKET_COL)
                    )
                )
            touched = sorted(
                r[0]
                for r in bucket_sources.distinct().collect()
                # ≤ n_buckets small ints — bounded by design
            )
            if not touched:
                return self.version()
            # schema for empty/never-written buckets: the STORED table
            # schema (a column-subset TOAST batch must not narrow a
            # bucket's files relative to the rest of the table)
            data_schema = stored or T.StructType(
                [f for f in batch.schema.fields if f.name not in META_COLS]
            )
            target = self._read_or_empty(touched, data_schema)
            merged = merge_batch(
                target, batch, self.keys, toast_aware=toast_aware
            )
            return self._commit(merged, touched)
        finally:
            batch.unpersist()

    def overwrite(self, df: DataFrame) -> int:
        """Full rewrite (initial snapshot load): every bucket."""
        return self._commit(df, list(range(self.n_buckets)))

    def _commit(self, df: DataFrame, touched: list[int]) -> int:
        self._save_meta(df.schema)
        new_v = self.version() + 1
        path = os.path.join(self.root, f"_v{new_v}")
        (
            df.withColumn(BUCKET_COL, self._bucket_of())
            # align writers with buckets: a dynamic partitionBy write
            # from S shuffle partitions emits up to S×|touched| files
            # per version (file-commit overhead dominated the CDC bench
            # at small batches; at scale it is read amplification for
            # every later merge of the same bucket). One narrow
            # repartition on the bucket column makes it one file per
            # touched bucket per version — a bucket is sized to ~one
            # executor scan budget, so one writer per bucket is the
            # intended parallelism.
            .repartition(max(len(touched), 1), F.col(BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(path)
        )
        # a bucket whose rows were all deleted writes no dir; it still
        # moves to new_v in the manifest (read() tolerates the absence)
        m = self.manifest()
        for b in touched:
            m[b] = new_v
        tmp = self._manifest_path(new_v) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({str(b): v for b, v in m.items()}, f)
        os.replace(tmp, self._manifest_path(new_v))
        ptmp = self._pointer + ".tmp"
        with open(ptmp, "w") as f:
            f.write(str(new_v))
        os.replace(ptmp, self._pointer)  # atomic flip
        self._gc(keep=self.retention)
        return new_v

    def _gc(self, keep: int) -> None:
        """Drop version dirs no manifest in the retention window
        references, and manifests older than the window."""
        cur = self.version()
        live: set[int] = set()
        kept_manifests = [v for v in range(max(0, cur - keep + 1), cur + 1)]
        for v in kept_manifests:
            try:
                live.update(self.manifest(v).values())
                live.add(v)
            except FileNotFoundError:
                pass
        for name in os.listdir(self.root):
            if name.startswith("_v") and int(name[2:]) not in live:
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
            if name.startswith("_manifest_v"):
                mv = int(name[len("_manifest_v"):].split(".")[0])
                if mv not in kept_manifests:
                    os.remove(os.path.join(self.root, name))


class BucketedCdcApplySink:
    """foreachBatch sink over a ``BucketedParquetTable`` — the
    O(touched-buckets) counterpart of ``CdcApplySink``."""

    def __init__(
        self,
        table: BucketedParquetTable,
        toast_aware: bool | None = None,
        max_retries: int = 2,
    ):
        self.table = table
        self.toast_aware = toast_aware
        self.max_retries = max_retries
        self.batches_applied = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        last_err: Exception | None = None
        for _ in range(self.max_retries + 1):
            try:
                self.table.merge(batch_df, toast_aware=self.toast_aware)
                self.batches_applied += 1
                return
            except FileNotFoundError:
                raise
            except Exception as e:  # transient
                last_err = e
        raise last_err
