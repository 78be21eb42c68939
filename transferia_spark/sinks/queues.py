"""Queue sinks (Kafka) — gated on connector-jar availability.

≈ ``pkg/providers/kafka/sink.go`` + ``writer/`` in transferia/transferia:
serialize (json/debezium/native/mirror/raw_column via
``transferia_spark.serializers``) then produce, topic per table. The
Spark kafka writer (``format("kafka")``) ships in the external
spark-sql-kafka package; this container does not bundle it, so the
sink validates availability at construction and fails with the remedy
instead of an executor-side ClassNotFound.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, Sink, register_sink

KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13"


def _kafka_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


@register_sink
class KafkaSink(Sink):
    TYPE = "kafka"

    def __init__(
        self,
        bootstrap_servers: str,
        topic_for: Callable[[TableID], str] | None = None,
        serializer: Callable[[DataFrame], DataFrame] | None = None,
        options: dict | None = None,
    ):
        self.bootstrap_servers = bootstrap_servers
        self.topic_for = topic_for or (lambda t: t.fqtn())
        self.serializer = serializer
        self.options = options or {}

    def cleanup(self, table: TableID, policy: CleanupPolicy) -> None:
        # queues are append-only; cleanup (topic recreation) is an
        # admin-API concern, same as the reference
        return

    def write(self, df: DataFrame, table: TableID) -> None:
        if not _kafka_available(df.sparkSession):
            raise NotImplementedError(
                f"kafka sink needs --packages {KAFKA_PACKAGE}"
            )
        out = self.serializer(df) if self.serializer else df
        writer = (
            out.write.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("topic", self.topic_for(table))
        )
        for k, v in self.options.items():
            writer = writer.option(k, v)
        writer.save()

    def write_cdc(self, batch: DataFrame, table: TableID, keys: list[str]) -> None:
        # event-log semantics: every change is produced, no collapse
        self.write(batch, table)
