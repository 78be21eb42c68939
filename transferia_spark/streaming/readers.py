"""Streaming source builders (SURVEY §2.2).

The reference's replication sources are push loops feeding parsed
ChangeItems to an async sink (``pkg/abstract/source.go:3-6``). In
Spark every source is a declarative ``readStream`` whose offsets live
in the query checkpoint — ack/commit machinery (parsequeue ordered
ack, slot LSN feedback) is subsumed by checkpointed offsets:

- file arrival (≈ S3+SQS source, ``s3/source/source.go:43``):
  Spark's file stream source does incremental listing natively.
- Kafka (≈ ``kafka/source.go:105``): `format("kafka")` — the consumer
  group/ack dance becomes checkpointed offsets. Parsing (SURVEY §2.6)
  is `from_json`/`str_to_map` etc. from `transferia_spark.parsers`.
- rate / rate-CDC: deterministic generator sources (≈ the `sample`
  provider, ``pkg/providers/sample``) used for tests and soak runs.

Scale notes: file-source incremental listing is O(new files) with
`maxFilesPerTrigger` bounding batch size (the bufferer's TriggingCount
analog); Kafka parallelism = topic partitions → set
`minPartitions` to fan out hot partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transferia_spark.cdc.changeitem import COUNTER_COL, LSN_COL, OP_COL


def file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """Incremental file-arrival stream (≈ S3+SQS replication source).

    Unlike the batch reader, streaming requires an explicit schema —
    mirror of the reference's schema-inference-at-activation step.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    **options,
) -> DataFrame:
    """Kafka replication source: raw (key, value, topic, partition,
    offset, timestamp) — the reference's "mirror" row shape
    (``pkg/abstract/changeitem/mirror.go``). Compose with a parser from
    ``transferia_spark.parsers`` for typed rows. Untested in this
    environment (no broker); the contract is the standard connector's.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def kinesis_records_to_raw(records: DataFrame, stream: str) -> DataFrame:
    """Kinesis/YDS/EventHub-family record frame → the raw queue-message
    shape every parser consumes (≈ ``pkg/providers/kinesis/source.go:197``
    ``makeRawChangeItem``: topic = stream name, partition = the numeric
    suffix of ``shardId-000000000001`` (``splitShard:209``), offset = a
    64-bit hash of the decimal sequence-number string (``hash:215`` —
    xxhash64 here; the synthetic offset never crosses engines, it only
    needs determinism + uniqueness), timestamp = approximate arrival).

    Expected input columns: ``shard_id`` string, ``sequence_number``
    string, ``partition_key`` string, ``data`` binary, ``arrival``
    timestamp — the public GetRecords shape however it lands (Kinesis
    firehose→S3 drop read by ``file_stream``, a connector jar, or a
    boto3 ``mapInPandas`` poller). EventHub deployments usually skip
    this entirely: their Kafka-compatible endpoint goes straight
    through ``kafka_stream``.

    Pure projection — composes with any parser at zero extra cost.
    """
    return records.select(
        F.col("partition_key").cast("string").alias("key"),
        F.col("data").alias("value"),
        F.lit(stream).alias("topic"),
        F.element_at(F.split(F.col("shard_id"), "-"), 2).cast("int").alias("partition"),
        F.xxhash64(F.col("sequence_number")).alias("offset"),
        F.col("arrival").alias("timestamp"),
    )


def rate_stream(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int = 4
) -> DataFrame:
    """Deterministic generator stream: (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
    )


def rate_cdc_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    num_keys: int = 50,
    num_partitions: int = 4,
) -> DataFrame:
    """Synthetic CDC changelog stream over ``num_keys`` hot keys:
    deterministic op mix (≈ the sample provider's generators) shaped as
    a ChangeItem frame: key, val, _op, _lsn, _counter."""
    raw = rate_stream(spark, rows_per_second, num_partitions)
    v = F.col("value")
    return raw.select(
        (v % num_keys).alias("key"),
        (v * 10).alias("val"),
        F.when(v % 11 == 0, F.lit("d"))
        .when(v % 3 == 0, F.lit("u"))
        .otherwise(F.lit("i"))
        .alias(OP_COL),
        v.alias(LSN_COL),
        F.lit(0).alias(COUNTER_COL),
    )
