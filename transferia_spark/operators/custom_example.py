"""Custom-transformer example: HTTP access-log filter.

≈ ``registry/custom/filter_strm_access_log.go:9`` in
transferia/transferia — the reference ships one bespoke transformer as
the worked example of its custom-registry API; this is the Spark
analog: parse combined-log-format lines from a raw ``value`` column
and keep only rows matching status/path rules. Registration is the
same ``@register`` decorator every built-in uses — user operators are
not second-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID

# combined log format:  ip - user [ts] "METHOD path HTTP/x" status bytes
ACCESS_LOG_RE = (
    r'^(\S+) \S+ (\S+) \[([^\]]+)\] "(\S+) (\S+) [^"]*" (\d{3}) (\d+|-)'
)


@register
class AccessLogFilter(Transformer):
    TYPE = "filter_access_log"

    def __init__(
        self,
        column: str = "value",
        min_status: int = 0,
        max_status: int = 999,
        exclude_path_prefixes: tuple[str, ...] = ("/health", "/metrics"),
    ):
        self.column = column
        self.min_status = min_status
        self.max_status = max_status
        self.exclude_path_prefixes = exclude_path_prefixes

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        raw = F.col(self.column).cast("string")
        ex = lambda i: F.regexp_extract(raw, ACCESS_LOG_RE, i)  # noqa: E731
        parsed = df.select(
            ex(1).alias("ip"),
            ex(2).alias("user"),
            ex(3).alias("ts_raw"),
            ex(4).alias("method"),
            ex(5).alias("path"),
            # try_cast: non-matching lines extract '' (ANSI cast errors)
            ex(6).try_cast("int").alias("status"),
            F.when(ex(7) == "-", None).otherwise(ex(7)).try_cast("long").alias("bytes"),
        ).filter(F.col("status").isNotNull())
        cond = F.col("status").between(self.min_status, self.max_status)
        for p in self.exclude_path_prefixes:
            cond = cond & ~F.col("path").startswith(p)
        return [(table, parsed.filter(cond))]
