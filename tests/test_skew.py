"""Salted joins/aggs and bucketed co-located joins (operators/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transferia_spark.operators.skew import (
    read_table,
    salted_join,
    two_phase_agg,
    write_bucketed,
)


@pytest.fixture()
def skewed(spark):
    # 10k rows on one hot key + a uniform tail
    hot = spark.range(0, 10000).select(
        F.lit(7).alias("k"), F.col("id").alias("v")
    )
    tail = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(50)], "k long, name string"
    )
    got = salted_join(skewed, dim, ["k"], salts=8)
    want = skewed.join(dim, ["k"])
    assert got.count() == want.count()
    assert (
        got.agg(F.sum("v")).collect()[0][0]
        == want.agg(F.sum("v")).collect()[0][0]
    )


def test_salted_join_spreads_hot_key(spark, skewed):
    dim = spark.createDataFrame([(7, "hot")], "k long, name string")
    l = skewed.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(8)).cast("int"),
    )
    per_salt = (
        l.filter(F.col("k") == 7).groupBy("_salt").count().collect()
    )
    assert len(per_salt) == 8  # hot key's rows really split 8 ways
    assert max(r["count"] for r in per_salt) < 10000
    _ = dim


def test_two_phase_agg_matches_direct(spark, skewed):
    got = two_phase_agg(
        skewed,
        ["k"],
        partial_aggs={"s": F.sum("v"), "c": F.count(F.lit(1))},
        final_aggs={"s": F.sum("s"), "c": F.sum("c")},
        salts=8,
    )
    want = skewed.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    a = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x")
    )
    b = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("y")
    )
    write_bucketed(a, "bk_a", ["k"], 8, ["k"], path=str(tmp_path / "bk_a"))
    write_bucketed(b, "bk_b", ["k"], 8, ["k"], path=str(tmp_path / "bk_b"))
    # disable broadcast so the planner actually exercises the bucketed
    # sort-merge path (with tiny test tables it would broadcast and
    # mark the scan "Bucketed: false (disabled by query planner)")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, "bk_a").join(read_table(spark, "bk_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # scans are pre-partitioned
        assert "Bucketed: true" in plan
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_salted_join_rejects_outer(spark, skewed):
    dim = spark.createDataFrame([(7, "hot")], "k long, name string")
    with pytest.raises(ValueError, match="inner|left"):
        salted_join(skewed, dim, ["k"], how="right")


def test_salted_join_salt_col_spreads_identical_rows(spark):
    from pyspark.sql import functions as F2

    # identical content rows, distinct event ids
    df = spark.range(0, 4000).select(
        F2.lit(7).alias("k"), F2.lit(1).alias("v"), F2.col("id").alias("eid")
    )
    salted = df.withColumn(
        "_salt", F2.pmod(F2.xxhash64(F2.col("eid")), F2.lit(8)).cast("int")
    )
    assert salted.select("_salt").distinct().count() == 8
    dim = spark.createDataFrame([(7, "x")], "k long, name string")
    out = salted_join(df, dim, ["k"], salts=8, salt_col="eid")
    assert out.count() == 4000
