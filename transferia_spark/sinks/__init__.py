"""Sinks (SURVEY §2.3): file/object-store writers, JDBC upsert,
console; cleanup policies."""

from transferia_spark.sinks.base import (  # noqa: F401
    CleanupPolicy,
    Sink,
    build_sink,
    register_sink,
)
from transferia_spark.sinks import (  # noqa: F401
    bigquery,
    clickhouse,
    files,
    greenplum,
    jdbc,
    logs,
    mongo,
    queues,
    search,
    ydb,
    yt,
)
