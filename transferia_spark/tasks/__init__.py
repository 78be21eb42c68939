"""Operational tasks: checksum/compare, chunked snapshot (dblog)."""

from transferia_spark.tasks.checksum import (  # noqa: F401
    ChecksumReport,
    checksum_table,
    compare_tables,
)
from transferia_spark.tasks.dblog import chunked_snapshot_with_cdc  # noqa: F401
