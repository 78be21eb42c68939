"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H-Q1-shaped pricing summary
routed through the engine's ``sql`` transformer) on sf0.001.

``queries()`` — one callable per implemented operator from SURVEY §2;
``oracle_sql()`` — the DuckDB-equivalent SQL for each.

Numeric note: aggregate money columns are cast to DECIMAL before
summing in BOTH engines so value-hashes match exactly (float summation
order is engine-dependent; decimals are associative).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transferia_spark.cdc import apply_changelog, collapse
from transferia_spark.cdc.synthetic import OP_CASE_SQL, events_changelog
from transferia_spark.operators import Transformation, build
from transferia_spark.schema.colschema import TableID
from transferia_spark.session import load_tables

SF0001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_tables(spark, sf_dir, [name])[name]


def _register(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for n in names:
        _t(spark, sf_dir, n).createOrReplaceTempView(n)


# --------------------------------------------------------------------------
# SQL surface (the reference's `sql` transformer → Spark SQL itself)
# --------------------------------------------------------------------------

TPCH_Q1 = """
SELECT
  l_returnflag,
  l_linestatus,
  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
  SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS sum_disc_price,
  COUNT(*) AS count_order
FROM table
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation surface via the `sql` transformer (batch exposed as
    virtual table `table`, ≈ clickhouse_local.go:63-66)."""
    li = _t(spark, sf_dir, "lineitem")
    return build("sql", query=TPCH_Q1).apply_df(li)


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        """
        SELECT o_orderkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS revenue,
               o_orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
        """
    )


def q_tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: dims broadcast automatically (small side < threshold)."""
    _register(spark, sf_dir, ["region", "nation", "customer", "orders", "lineitem"])
    return spark.sql(
        """
        SELECT n_name,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS revenue
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        """
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .select(
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            ).alias("x")
        )
        .agg(F.sum("x").alias("revenue"))
    )


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — window-function surface."""
    _register(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        WHERE rn <= 3
        """
    )


def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch shape of the streaming rollup)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Transformer operators (SURVEY §2.4), each through the registry
# --------------------------------------------------------------------------


def q_filter_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    t = build(
        "filter_rows",
        filters=[
            "l_returnflag = 'R' AND l_quantity > 30",
            "l_linestatus = 'O' AND l_discount >= 0.09",
        ],
    )
    return t.apply_df(li).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


def q_filter_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    t = build("filter_columns", include=["o_orderkey", "o_totalprice", "o_orderstatus"])
    return t.apply_df(o)


def q_filter_rows_by_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    t = build("filter_rows_by_ids", column="c_custkey", ids=[1, 7, 42, 99, 120])
    return t.apply_df(c)


def q_mask_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    t = build("mask_field", columns=["c_name"], salt="pepper")
    return t.apply_df(c).select("c_custkey", "c_name")


def q_convert_to_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t = build("convert_to_string", columns=["event_id", "ts", "value"])
    return t.apply_df(ev).select("event_id", "ts", "value", "event_type")


def q_convert_to_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t = build("convert_to_datetime", columns=["event_id"], unit="s")
    return t.apply_df(ev).select(F.col("event_id").alias("event_ts"), "user_id")


def q_number_to_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    t = build("number_to_float", columns=["c_custkey", "c_nationkey"])
    return t.apply_df(c).select("c_custkey", "c_nationkey", "c_name")


def q_regex_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    t = build("regex_replace", columns=["text"], pattern="[aeiou]", replacement="*")
    return t.apply_df(d).select("doc_id", "text")


def q_table_splitter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t = build("table_splitter", columns=["event_type"])
    out = t.apply(TableID("", "events"), ev)[0][1]
    return out.select("event_id", F.col("_route").alias("route"))


def q_raw_doc_grouper(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    t = build("raw_doc_grouper", keys=["doc_id"])
    return t.apply_df(d).select("doc_id", "doc")


def q_transform_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A whole per-table plan: filter → project → mask, fused by Catalyst
    into one codegen stage over the scan (the engine's snapshot path)."""
    li = _t(spark, sf_dir, "lineitem")
    chain = (
        Transformation()
        .add(build("filter_rows", filters=["l_quantity >= 45"]))
        .add(
            build(
                "filter_columns",
                include=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"],
            )
        )
        .add(build("mask_field", columns=["l_returnflag"], salt="s"))
    )
    out = chain.apply(TableID("", "lineitem"), li)
    return out[0][1]


# --------------------------------------------------------------------------
# CDC surface
# --------------------------------------------------------------------------


def q_cdc_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net effect per key of an I/U/D stream (changeitem_collapse.go
    semantics, as one map-side-combinable aggregation)."""
    ev = _t(spark, sf_dir, "events")
    log = events_changelog(ev)
    return collapse(log, keys=["user_id"]).select("user_id", "value", "_op", "_lsn")


def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a collapsed changelog to a snapshot (MERGE as anti-join ∪
    upserts — what Delta/Iceberg compile MERGE into)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    ev = _t(spark, sf_dir, "events")
    log = events_changelog(ev, key="c_custkey", value="c_acctbal")
    return apply_changelog(cust, log, keys=["c_custkey"])


def q_skip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    log = events_changelog(ev)
    t = build("skip_events", kinds=["d"])
    return t.apply_df(log).select("user_id", "value", "_op", "_lsn")


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_tpch_q1(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5ish": q_tpch_q5ish,
        "tpch_q6": q_tpch_q6,
        "window_topk": q_window_topk,
        "events_hourly_rollup": q_events_hourly_rollup,
        "filter_rows": q_filter_rows,
        "filter_columns": q_filter_columns,
        "filter_rows_by_ids": q_filter_rows_by_ids,
        "mask_field": q_mask_field,
        "convert_to_string": q_convert_to_string,
        "convert_to_datetime": q_convert_to_datetime,
        "number_to_float": q_number_to_float,
        "regex_replace": q_regex_replace,
        "table_splitter": q_table_splitter,
        "raw_doc_grouper": q_raw_doc_grouper,
        "transform_chain": q_transform_chain,
        "cdc_collapse": q_cdc_collapse,
        "cdc_merge": q_cdc_merge,
        "skip_events": q_skip_events,
    }


def _changelog_cte(key: str = "user_id", value: str = "value") -> str:
    """DuckDB CTE reproducing events_changelog + collapse — the oracle
    for the CDC surface."""
    return f"""
WITH changelog AS (
  SELECT user_id AS {key}, value AS {value}, event_id AS lsn,
         {OP_CASE_SQL} AS op
  FROM events
),
net AS (
  SELECT {key},
         arg_max(op, lsn)      AS last_op,
         arg_min(op, lsn)      AS first_op,
         max(lsn)              AS max_lsn,
         arg_max({value}, lsn) AS last_value
  FROM changelog GROUP BY {key}
),
collapsed AS (
  SELECT {key},
         CASE WHEN last_op = 'd' THEN NULL ELSE last_value END AS {value},
         CASE WHEN last_op = 'd' THEN 'd'
              WHEN first_op = 'i' THEN 'i' ELSE 'u' END AS _op,
         max_lsn AS _lsn
  FROM net
  WHERE NOT (first_op = 'i' AND last_op = 'd')
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "tpch_q1": TPCH_Q1.replace("FROM table", "FROM lineitem"),
        "tpch_q3": """
            SELECT o_orderkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS revenue,
                   o_orderdate
            FROM customer JOIN orders ON c_custkey = o_custkey
                          JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "tpch_q5ish": """
            SELECT n_name,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS revenue
            FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
        """,
        "tpch_q6": """
            SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "window_topk": """
            SELECT o_custkey, o_orderkey, o_totalprice
            FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
            WHERE rn <= 3
        """,
        "events_hourly_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n,
                   SUM(CAST(value AS DECIMAL(18,2))) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "filter_rows": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount
            FROM lineitem
            WHERE (l_returnflag = 'R' AND l_quantity > 30)
               OR (l_linestatus = 'O' AND l_discount >= 0.09)
        """,
        "filter_columns": "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders",
        "filter_rows_by_ids": "SELECT * FROM customer WHERE c_custkey IN (1, 7, 42, 99, 120)",
        "mask_field": """
            SELECT c_custkey, sha256(concat('pepper', c_name)) AS c_name FROM customer
        """,
        "convert_to_string": """
            SELECT CAST(event_id AS VARCHAR) AS event_id,
                   CAST(ts AS VARCHAR) AS ts,
                   CAST(value AS VARCHAR) AS value,
                   event_type
            FROM events
        """,
        "convert_to_datetime": """
            SELECT to_timestamp(event_id)::TIMESTAMP AS event_ts, user_id FROM events
        """,
        "number_to_float": """
            SELECT CAST(c_custkey AS DOUBLE) AS c_custkey,
                   CAST(c_nationkey AS DOUBLE) AS c_nationkey,
                   c_name
            FROM customer
        """,
        "regex_replace": """
            SELECT doc_id, regexp_replace(text, '[aeiou]', '*', 'g') AS text FROM documents
        """,
        "table_splitter": """
            SELECT event_id, concat_ws('/', 'events', event_type) AS route FROM events
        """,
        "raw_doc_grouper": """
            SELECT doc_id,
                   to_json(struct_pack(doc_id := doc_id, text := text, lang := lang,
                                       source := source, n_chars := n_chars)) AS doc
            FROM documents
        """,
        "transform_chain": """
            SELECT l_orderkey, l_linenumber, l_quantity,
                   sha256(concat('s', l_returnflag)) AS l_returnflag
            FROM lineitem WHERE l_quantity >= 45
        """,
        "cdc_collapse": _changelog_cte() + "SELECT user_id, value, _op, _lsn FROM collapsed",
        "cdc_merge": _changelog_cte(key="c_custkey", value="val")
        + """
        , ups AS (SELECT * FROM collapsed WHERE _op <> 'd')
        SELECT t.c_custkey, t.c_name, coalesce(u.val, t.c_acctbal) AS c_acctbal
        FROM customer t JOIN ups u USING (c_custkey)
        UNION ALL
        SELECT u.c_custkey, NULL AS c_name, u.val AS c_acctbal
        FROM ups u ANTI JOIN customer t USING (c_custkey)
        UNION ALL
        SELECT t.c_custkey, t.c_name, t.c_acctbal
        FROM customer t ANTI JOIN collapsed n USING (c_custkey)
        """,
        "skip_events": f"""
            SELECT user_id, value, {OP_CASE_SQL} AS _op, event_id AS _lsn
            FROM events
            WHERE {OP_CASE_SQL} <> 'd'
        """,
    }
