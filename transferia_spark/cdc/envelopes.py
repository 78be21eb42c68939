"""CDC envelope adapters: MySQL binlog rows and Mongo change-stream
events → the ChangeItem column contract (``changeitem.py``).

≈ transferia/transferia:
- MySQL: ``pkg/providers/mysql/source.go:141`` (``OnRow`` — update
  events arrive as (old,new) row pairs; deletes carry the PK in
  OldKeys), ``utils.go:204`` (``CalculateLSN``: binlog file index ×
  10^12 + offset), ``source.go:197-201`` (GTID string → FNV-1 32-bit
  transaction sequence).
- Mongo: ``pkg/providers/mongo/change_stream_watcher.go:38`` +
  ``batcher.go:128`` (operationType insert/update/replace/delete,
  ``documentKey._id`` as the key, ``fullDocument`` when available,
  ``updateDescription.updatedFields/removedFields`` when not).

Everything here is pure Column expressions: the adapters are ordinary
projections Catalyst fuses into whatever scan feeds them (a Kafka
stream of canal/change-stream JSON, a file drop, a connector frame),
so they cost nothing extra at 100 TB. Partial Mongo updates surface
through the ``_present`` contract — ``updatedFields`` names are carried
columns, ``removedFields`` are carried-with-NULL — which collapse/merge
fold correctly without conflating absent with NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.cdc.changeitem import (
    BEFORE_COL,
    COMMIT_TS_COL,
    COUNTER_COL,
    LSN_COL,
    OP_COL,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    PRESENT_COL,
    TX_COL,
)

# ``fileOffset`` in utils.go:202 — LSN advances by this per binlog file
MYSQL_FILE_OFFSET = 1_000_000_000_000


def mysql_lsn(file_col: Column, pos_col: Column) -> Column:
    """``CalculateLSN`` (utils.go:204): ``binlog.000007`` → 7·10^12+pos;
    a file name without an index counts as file 1."""
    idx = F.split(file_col, r"\.")
    has_idx = F.size(idx) > 1
    fidx = F.when(has_idx, F.element_at(idx, 2).cast("long")).otherwise(F.lit(1))
    return (fidx * F.lit(MYSQL_FILE_OFFSET) + pos_col).cast("long")


def fnv1_32(col: Column) -> Column:
    """FNV-1 (multiply-then-xor — what Go's ``fnv.New32()`` computes;
    distinct from FNV-1a) over UTF-8 bytes, as a Catalyst expression.
    The reference hashes the GTID set string with it to get the
    transaction sequence id (source.go:198-201)."""
    b = F.encode(col, "UTF-8")
    folded = F.aggregate(
        F.sequence(F.lit(1), F.octet_length(col)),
        F.lit(2166136261).cast("long"),
        lambda acc, i: F.pmod(acc * F.lit(16777619), F.lit(1 << 32)).bitwiseXOR(
            F.conv(F.hex(F.substr(b, i, F.lit(1))), 16, 10).cast("long")
        ),
    )
    return F.when(F.octet_length(col) == 0, F.lit(2166136261).cast("long")).otherwise(folded)


def mysql_binlog_to_changeitems(df: DataFrame, keys: list[str]) -> DataFrame:
    """Binlog row events → ChangeItem frame.

    Expected input columns (the canonical parsed-binlog shape a
    go-canal-style reader or Kafka topic carries):

    - ``action``  string — ``insert`` | ``update`` | ``delete``
    - ``log_file``/``log_pos`` — binlog position (→ ``_lsn``)
    - ``ts_sec``  long — binlog header timestamp (→ ``_commit_ts``)
    - ``gtid``    string — executed GTID set (→ ``_tx_id``)
    - ``row_idx`` int — row index within the event (→ ``_counter``)
    - ``before``/``after`` — full row images; ``before`` is NULL for
      inserts, ``after`` NULL for deletes (the (old,new) pair contract
      of OnRow — even line old values, odd line new values)

    Deletes take their payload from ``before`` (the reference's delete
    items carry the old row, source.go:287-300); updates attach the old
    key pre-image as ``_before`` so PK-changing updates normalize to
    delete+insert downstream.
    """
    payload_fields = df.schema["after"].dataType.names
    op = (
        F.when(F.col("action") == "insert", F.lit(OP_INSERT))
        .when(F.col("action") == "update", F.lit(OP_UPDATE))
        .otherwise(F.lit(OP_DELETE))
    )
    is_del = F.col("action") == "delete"
    cols = [
        F.when(is_del, F.col(f"before.{c}")).otherwise(F.col(f"after.{c}")).alias(c)
        for c in payload_fields
    ]
    before_keys = F.when(
        F.col("action").isin("update", "delete") & F.col("before").isNotNull(),
        F.struct(*[F.col(f"before.{k}").alias(k) for k in keys]),
    )
    return df.select(
        *cols,
        op.alias(OP_COL),
        mysql_lsn(F.col("log_file"), F.col("log_pos")).alias(LSN_COL),
        F.col("row_idx").cast("int").alias(COUNTER_COL),
        F.timestamp_seconds(F.col("ts_sec")).alias(COMMIT_TS_COL),
        F.col("gtid").alias(TX_COL),
        before_keys.alias(BEFORE_COL),
    )


def mongo_change_stream_to_changeitems(
    df: DataFrame,
    doc_schema: T.StructType | str | None = None,
) -> DataFrame:
    """Change-stream events → ChangeItem frame keyed on ``_id``.

    Expected input columns (the change-stream document shape,
    ``change_stream_watcher.go`` / ``batcher.go:128``):

    - ``op_type``      string — ``insert`` | ``update`` | ``replace``
      | ``delete`` (invalidate/drop are control events — filter them
      before this adapter, as the watcher restarts on them)
    - ``cluster_time`` long — oplog timestamp (→ ``_lsn`` high bits)
    - ``order``        long — tie-break within a cluster time
      (resume-token order; → ``_counter``)
    - ``doc_key``      struct<_id> — the document key
    - ``full_doc``     struct — present for insert/replace and for
      updates under fullDocument=updateLookup
    - ``updated_fields`` map<string,string> — set fields of a partial
      update (when ``full_doc`` is absent)
    - ``removed_fields`` array<string> — fields explicitly $unset

    Partial updates (no ``full_doc``) emit the ``_present`` column:
    updated names are carried-with-value, removed names carried-as-NULL
    (an $unset IS an explicit NULL write), everything else absent — the
    distinction collapse needs to not resurrect stale values.
    """
    payload_fields = list(df.schema["full_doc"].dataType.names)
    op = (
        F.when(F.col("op_type") == "insert", F.lit(OP_INSERT))
        .when(F.col("op_type") == "delete", F.lit(OP_DELETE))
        .otherwise(F.lit(OP_UPDATE))  # update | replace
    )
    has_full = F.col("full_doc").isNotNull()
    is_del = F.col("op_type") == "delete"

    # A DOTTED path touching a declared column is a nested
    # sub-document write this adapter cannot patch into a column
    # fragment — element_at misses it and the column would silently
    # go stale, so the batch fails loudly instead (the direct
    # change-stream reader raises/dead-letters the same class;
    # code-review r14). Dotted paths under UNdeclared prefixes drop
    # like any undeclared field.
    declared = F.array(
        *[F.lit(c) for c in payload_fields if c != "_id"]
    )
    all_keys = F.concat(
        F.coalesce(F.map_keys(F.col("updated_fields")), F.array()),
        F.coalesce(F.col("removed_fields"), F.array()),
    )
    frag = F.exists(
        all_keys,
        lambda k: k.contains(".")
        & F.array_contains(declared, F.split(k, r"\.").getItem(0)),
    )
    dotted_guard = F.assert_true(
        has_full | is_del | ~frag,
        F.concat(
            F.lit(
                "dotted-path partial update touches declared "
                "column(s) (keys "
            ),
            F.to_json(all_keys),
            F.lit(
                ") — a nested sub-document write without a full "
                "image cannot patch a column fragment; front the "
                "stream with fullDocument=updateLookup"
            ),
        ),
    )

    cols = []
    for c in payload_fields:
        if c == "_id":
            continue
        dt = df.schema["full_doc"].dataType[c].dataType.simpleString()
        partial_val = F.element_at(F.col("updated_fields"), c).cast(dt)
        cols.append(
            F.when(is_del, F.lit(None).cast(dt))
            .when(has_full, F.col(f"full_doc.{c}"))
            .otherwise(partial_val)
            .alias(c)
        )
    # present contract: full docs carry everything (NULL marker);
    # partial updates carry exactly updated+removed (+ the key)
    present = F.when(
        ~has_full & ~is_del,
        F.concat(
            F.array(F.lit("_id")),
            F.coalesce(F.map_keys(F.col("updated_fields")), F.array()),
            F.coalesce(F.col("removed_fields"), F.array()),
        ),
    )
    return df.select(
        # the guard folds into a projected column so the optimizer
        # cannot prune the assertion away (assert_true yields NULL
        # when it passes)
        F.when(
            dotted_guard.isNull(), F.col("doc_key._id")
        ).alias("_id"),
        *cols,
        op.alias(OP_COL),
        F.col("cluster_time").cast("long").alias(LSN_COL),
        F.col("order").cast("int").alias(COUNTER_COL),
        present.alias(PRESENT_COL),
    )


def ydb_changefeed_to_changeitems(
    df: DataFrame,
    key_cols: list[str],
    value_schema: T.StructType,
) -> DataFrame:
    """YDB changefeed JSON records → ChangeItem frame.

    ≈ ``pkg/providers/ydb/cdc_converter.go:356-380``
    (``convertToChangeItem``): a record with ``update``/``newImage``
    is an upsert, one with ``erase`` a delete; ``key`` is the
    POSITIONAL primary-key array; with VIRTUAL_TIMESTAMPS enabled
    ``ts = [step, txId]`` supplies commit time and transaction id
    (:319-323); the topic partition offset is the LSN.

    Expected input columns:

    - ``json``    string — one changefeed record
      (``{"key":[...],"update":{...}}`` / ``{"erase":{}}`` /
      ``newImage``/``oldImage`` when the feed mode includes images)
    - ``part_id`` — topic partition (→ part id / counter tie-break)
    - ``offset``  long — partition offset (→ ``_lsn``)

    KEYS_CHANGED never arises: YDB forbids primary-key updates, so no
    ``_before`` column is emitted. In ``UPDATES`` feed mode (no
    images) the record carries only changed columns — surfaced through
    the ``_present`` contract exactly like Mongo partial updates, so
    collapse folds them without resurrecting stale values.
    """
    upd = F.get_json_object("json", "$.update")
    img = F.get_json_object("json", "$.newImage")
    erase = F.get_json_object("json", "$.erase")
    op = F.when(erase.isNotNull(), F.lit(OP_DELETE)).otherwise(F.lit(OP_UPDATE))

    payload_schema = T.StructType(
        [f for f in value_schema.fields if f.name not in key_cols]
    )
    payload = F.from_json(F.coalesce(img, upd), payload_schema)

    key_exprs = []
    for i, k in enumerate(key_cols):
        dt = value_schema[k].dataType.simpleString()
        key_exprs.append(
            F.get_json_object("json", f"$.key[{i}]").cast(dt).alias(k)
        )
    val_exprs = [
        F.when(erase.isNotNull(), F.lit(None).cast(f.dataType.simpleString()))
        .otherwise(payload[f.name])
        .alias(f.name)
        for f in payload_schema.fields
    ]
    # UPDATES mode carries only changed columns: present = keys + the
    # update object's own keys. With a full newImage the marker is NULL
    # (= every column present), as is a delete.
    present = F.when(
        img.isNull() & erase.isNull(),
        F.concat(
            F.array(*[F.lit(k) for k in key_cols]),
            F.coalesce(F.json_object_keys(upd), F.array()),
        ),
    )
    ts0 = F.get_json_object("json", "$.ts[0]").cast("long")
    ts1 = F.get_json_object("json", "$.ts[1]")
    return df.select(
        *key_exprs,
        *val_exprs,
        op.alias(OP_COL),
        F.col("offset").cast("long").alias(LSN_COL),
        F.col("part_id").cast("int").alias(COUNTER_COL),
        F.timestamp_millis(ts0).alias(COMMIT_TS_COL),
        ts1.alias(TX_COL),
        present.alias(PRESENT_COL),
    )
