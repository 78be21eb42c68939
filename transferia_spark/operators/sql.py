"""The ``sql`` transformer: arbitrary SQL over each batch.

≈ ``registry/clickhouse/clickhouse_local.go:48`` in
transferia/transferia, which pipes every batch through an embedded
clickhouse-local with the batch exposed as virtual table ``table``.
Rows are matched back by PK; rows the query didn't return are routed to
errors.

On Spark this surface *is* Spark SQL: the batch becomes a temp view and
Catalyst plans the query — which is how this engine legitimately
acquires the full relational operator set (joins, aggregation, window
functions, the whole function library) with codegen and AQE for free.

The PK-match error contract is reproduced: with ``strict_pk_match``,
input keys absent from the output are returned as an error DataFrame
(dead-letter), exactly the unmatched-by-PK semantics of the reference.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID

VIRTUAL_TABLE = "table"


@register
class SqlTransformer(Transformer):
    TYPE = "sql"

    def __init__(self, query: str, keys: list[str] | None = None, strict_pk_match: bool = False):
        self.query = query
        self.keys = keys or []
        self.strict_pk_match = strict_pk_match
        self.errors: DataFrame | None = None

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        spark = df.sparkSession
        view = f"__sql_batch_{abs(hash((table.namespace, table.name))) % 10**8}"
        df.createOrReplaceTempView(view)
        # the reference exposes the batch as `table`; accept both
        query = re.sub(r"(?<![\w.])table(?![\w.(])", view, self.query)
        out = spark.sql(query)
        if self.strict_pk_match and self.keys:
            # one distinct-keys frame, built once and shared: the
            # dead-letter is the anti-join of the input against it.
            # (The semi-join side is implied — `out` itself carries the
            # surviving rows — so no second distinct/scan is planned.)
            keys_df = out.select(*self.keys).distinct()
            self.errors = df.join(keys_df, self.keys, "left_anti")
        return [(table, out)]
