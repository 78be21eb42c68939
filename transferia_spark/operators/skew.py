"""Skew weapons: salted joins/aggregations and bucketed co-located joins.

AQE's skew-join splitter (on in ``session.get_spark``) handles most
sort-merge skew at runtime by splitting oversized partitions. Two cases
remain where explicit structure wins, and the 100 TB pipeline hits both:

- **Hot-key join fan-out** (``salted_join``): one key carrying a large
  fraction of the big side (null-ish defaults, a viral document, a
  boilerplate domain). Salting splits the hot key's rows across
  ``salts`` sub-keys and replicates the SMALL side once per salt — the
  shuffle spreads evenly, at the cost of a small-side blow-up bounded
  by ``salts × |small|``.
- **Hot-group aggregation** (``two_phase_agg``): groupBy on a skewed
  key aggregates the hot group in one reducer. Two-phase (partial by
  (key, salt), final by key) caps any single reducer's input at
  ~1/salts of the hot group. Only algebraic aggregates compose this
  way (sum/count/min/max — the caller supplies both phases).
- **Repeat joins on the same key** (``write_bucketed``): persisting
  both sides bucketed by the join key lets every subsequent join run
  with ZERO Exchange — the scan itself is the shuffle, paid once at
  write time. This is Spark's native answer to the reference's
  PK-hash sharded uploads (``sharding_storage.go:195``): same
  hash-partition layout, but persisted and reused by the planner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salts: int = 16,
    how: str = "inner",
    salt_col: str | None = None,
) -> DataFrame:
    """Join with the large side's rows spread over ``salts`` sub-keys.

    The salt is derived from the large row's content hash — stable
    under task retry/recomputation (a ``rand()`` salt is not: a retried
    task would re-salt rows differently mid-shuffle, the same defect
    the sharder fix removed from ``operators/routing.py``). Limitation:
    byte-identical duplicate rows share a salt, so a hot key made of
    IDENTICAL rows still lands on one sub-key — pass ``salt_col`` (any
    high-cardinality column, e.g. an event id) to spread those.

    Right/full-outer joins are rejected: the small side is replicated
    once per salt, so an unmatched small row would emit one null-padded
    output PER SALT. Inner, left (all spellings), and left-semi/anti
    are unaffected by the replication and allowed.
    """
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi",
        "left_anti", "leftanti", "anti",
    }
    if how not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, got {how!r} "
            "(small-side replication breaks right/full outer)"
        )
    salt_src = (
        [F.col(salt_col)]
        if salt_col
        else [F.col(c) for c in large.columns]
    )
    lsalt = F.pmod(F.xxhash64(*salt_src), F.lit(salts)).cast("int")
    l = large.withColumn("_salt", lsalt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return l.join(s, [*on, "_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, F.Column],
    final_aggs: dict[str, F.Column],
    salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Skew-safe aggregation: partial per (keys, salt), final per keys.

    ``partial_aggs``: name → aggregate over the input columns.
    ``final_aggs``: name → aggregate over the partial columns (refer to
    partial names). E.g. sum: partial ``sum(x) as s``, final
    ``sum(s) as s``; count: partial ``count(*) as c``, final
    ``sum(c) as c``; avg: carry (sum, count) and divide at the end.

    Same duplicate-row caveat as ``salted_join``: byte-identical rows
    share a content-hash salt; pass ``salt_col`` when counting
    replayed/identical events. (Plain groupBy's map-side partial
    aggregation already absorbs identical-row hot keys well — reach for
    this helper when the hot group's DISTINCT rows overwhelm one
    reducer.)
    """
    salt_src = (
        [F.col(salt_col)] if salt_col else [F.col(k) for k in df.columns]
    )
    salt = F.pmod(F.xxhash64(*salt_src), F.lit(salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[c.alias(n) for n, c in partial_aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(n) for n, c in final_aggs.items()]
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by the join
    key. Subsequent equi-joins/aggregations on ``bucket_cols`` between
    tables bucketed with the SAME bucket count plan with no Exchange
    (and no Sort, when sorted) — verify with
    ``assert "Exchange" not in plan`` (tests/test_skew.py does)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:  # external table (metastore carries only the bucket spec)
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
