"""Table-splitter routing (operators/routing.py): fan-out cardinality
guard + the one-scan partitioned write path (r4 verdict item 7).
≈ registry/table_splitter/table_splitter.go:18."""

import os

import pytest
from pyspark.sql import functions as F

from transferia_spark.operators import build
from transferia_spark.schema.colschema import TableID


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], float(i)) for i in range(30)],
        "id long, region string, v double",
    )


def test_fan_out_routes_rows_per_value(frame):
    t = build("table_splitter", columns=["region"])
    routed = t.fan_out(TableID("", "events"), frame)
    names = [tid.name for tid, _ in routed]
    assert names == ["events/a", "events/b", "events/c"]
    for tid, df in routed:
        vals = {r.region for r in df.collect()}
        assert vals == {tid.name.split("/")[-1]}
    assert sum(df.count() for _, df in routed) == 30


def test_fan_out_cardinality_guard_fails_fast(spark):
    """Splitting on a high-cardinality column must fail with a remedy,
    and the route-discovery collect is bounded by limit(cap+1) — never
    an unbounded driver materialization."""
    df = spark.range(500).select(F.col("id"), F.col("id").alias("k"))
    t = build("table_splitter", columns=["k"])
    with pytest.raises(ValueError, match="write_fan_out"):
        t.fan_out(TableID("", "t"), df, max_routes=10)
    # explicit raise of the cap restores the old behavior
    routed = t.fan_out(TableID("", "t"), df.limit(12), max_routes=1000)
    assert len(routed) == 12


def test_write_fan_out_single_scan_partitioned(frame, tmp_path):
    """The file-sink path is ONE partitioned write: a single scan in the
    written plan (not one filtered scan per route), leaf dirs are the
    routes, and reading a leaf back returns exactly that route's rows."""
    t = build("table_splitter", columns=["region"])
    out = t.write_fan_out(TableID("", "events"), frame, str(tmp_path))
    leaves = sorted(n for n in os.listdir(out) if n.startswith("region="))
    assert leaves == ["region=a", "region=b", "region=c"]
    spark = frame.sparkSession
    back = spark.read.parquet(os.path.join(out, "region=b"))
    assert back.count() == 10 and set(back.columns) == {"id", "v"}
    # the frame fed to the writer embeds exactly one scan — fan_out's
    # per-route filters would show one scan per route instead
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 1
