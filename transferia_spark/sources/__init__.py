"""Snapshot-scan sources (SURVEY §2.1 Storage implementations)."""

from transferia_spark.sources.base import Source, build_source, register_source  # noqa: F401
from transferia_spark.sources import (  # noqa: F401
    airbyte,
    clickhouse,
    delta,
    elastic,
    enterprise,
    files,
    jdbc,
    mongo,
    mysql_select,
    pg_copy,
    sample,
    ydb,
    yt,
)
from transferia_spark.sources.jdbc import shard_by_pk_hash, shard_by_numeric_range  # noqa: F401
from transferia_spark.sources.incremental import IncrementalState  # noqa: F401
