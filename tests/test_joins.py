"""asof_join / range_join semantics (operators/joins.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transferia_spark.operators.joins import asof_join, range_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 5.0, "a"),
            (1, 9.0, "b"),
            (1, 3.0, "c"),
            (2, 7.0, "d"),
            (3, 1.0, "e"),
        ],
        "k long, t double, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, 4.0, 40),
            (1, 8.0, None),  # NULL value must still win over t=4.0
            (2, 7.0, 70),  # exact-time match
            (2, 9.0, 90),
        ],
        "k long, rt double, v int",
    )
    return left, right


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_asof_backward(frames):
    left, right = frames
    out = asof_join(
        left, right, ["k"], ["k"], "t", "rt", ["v"], direction="backward"
    )
    got = {(r.tag, r.matched_time, r.v) for r in out.collect()}
    assert got == {
        ("a", 4.0, 40),
        ("b", 8.0, None),  # row-atomic: the newer right row's NULL wins
        ("c", None, None),  # nothing at or before t=3
        ("d", 7.0, 70),  # <= includes equal timestamps
        ("e", None, None),  # key with no right rows
    }


def test_asof_forward(frames):
    left, right = frames
    out = asof_join(
        left, right, ["k"], ["k"], "t", "rt", ["v"], direction="forward"
    )
    got = {(r.tag, r.matched_time, r.v) for r in out.collect()}
    assert got == {
        ("a", 8.0, None),
        ("b", None, None),
        ("c", 4.0, 40),
        ("d", 7.0, 70),  # >= includes equal timestamps
        ("e", None, None),
    }


def test_asof_tolerance(frames):
    left, right = frames
    out = asof_join(
        left,
        right,
        ["k"],
        ["k"],
        "t",
        "rt",
        ["v"],
        direction="backward",
        tolerance_seconds=1.0,
    )
    got = {(r.tag, r.matched_time) for r in out.collect()}
    # 'a' matched rt=4.0 at t=5.0 (gap 1.0, kept); 'b' matched rt=8.0 at
    # t=9.0 (gap 1.0, kept); everything farther nulls out
    assert got == {
        ("a", 4.0),
        ("b", 8.0),
        ("c", None),
        ("d", 7.0),
        ("e", None),
    }


def test_asof_left_row_count_preserved(frames):
    left, right = frames
    out = asof_join(left, right, ["k"], ["k"], "t", "rt", ["v"])
    assert out.count() == left.count()


def test_asof_no_cross_product_in_plan(frames):
    left, right = frames
    out = asof_join(left, right, ["k"], ["k"], "t", "rt", ["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_matches_theta_join(spark):
    pts = spark.range(0, 200).select(
        F.col("id").alias("pid"),
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 3.5).alias("x"),
    )
    ivl = spark.range(0, 40).select(
        F.col("id").alias("iid"),
        (F.col("id") % 7).alias("ik"),
        (F.col("id") * 13.0).alias("lo"),
        (F.col("id") * 13.0 + F.col("id") % 5 * 9.0).alias("hi"),
    )
    got = _rows(
        range_join(
            pts, ivl, ["k"], ["ik"], "x", "lo", "hi", bin_size=16.0
        ).select("pid", "iid")
    )
    want = _rows(
        pts.join(
            ivl,
            (F.col("k") == F.col("ik"))
            & (F.col("lo") <= F.col("x"))
            & (F.col("x") < F.col("hi")),
        ).select("pid", "iid")
    )
    assert got == want and len(want) > 0


def test_range_join_hi_inclusive(spark):
    pts = spark.createDataFrame([(1, 10.0)], "k long, x double")
    ivl = spark.createDataFrame([(1, 0.0, 10.0)], "ik long, lo double, hi double")
    assert (
        range_join(pts, ivl, ["k"], ["ik"], "x", "lo", "hi", 8.0).count() == 0
    )
    assert (
        range_join(
            pts, ivl, ["k"], ["ik"], "x", "lo", "hi", 8.0, hi_inclusive=True
        ).count()
        == 1
    )


def test_range_join_no_duplicate_pairs(spark):
    # interval spanning many bins must still emit each (point, interval)
    # pair exactly once
    pts = spark.createDataFrame(
        [(1, float(x)) for x in range(0, 100, 10)], "k long, x double"
    )
    ivl = spark.createDataFrame([(1, 0.0, 95.0)], "ik long, lo double, hi double")
    out = range_join(pts, ivl, ["k"], ["ik"], "x", "lo", "hi", 3.0)
    assert out.count() == out.select("x").distinct().count() == 10


def test_asof_join_matches_bruteforce_reference(spark):
    """Randomized cross-check: the window formulation equals the
    obvious per-row argmax over a seeded dataset."""
    import random

    rnd = random.Random(42)
    lrows = [(rnd.randrange(5), float(rnd.randrange(100)), i) for i in range(200)]
    rrows = {(rnd.randrange(5), float(rnd.randrange(100))) for _ in range(80)}
    rrows = [(k, t, i) for i, (k, t) in enumerate(sorted(rrows))]
    left = spark.createDataFrame(lrows, "k long, t double, lid long")
    right = spark.createDataFrame(rrows, "k long, rt double, rid long")
    out = asof_join(left, right, ["k"], ["k"], "t", "rt", ["rid"])
    got = {r.lid: r.rid for r in out.collect()}
    by_key = {}
    for k, rt, rid in rrows:
        by_key.setdefault(k, []).append((rt, rid))
    for k, t, lid in lrows:
        cands = [(rt, rid) for rt, rid in by_key.get(k, []) if rt <= t]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, k, t)


def test_asof_null_keys_and_times_match_nothing(spark):
    """SQL semantics: NULL keys/timestamps never satisfy the join
    condition — on either side, in either direction."""
    left = spark.createDataFrame(
        [(None, 5.0, "nullkey"), (1, None, "nullts"), (1, 5.0, "ok")],
        "k long, t double, tag string",
    )
    right = spark.createDataFrame(
        [(None, 1.0, 1), (1, None, 2), (1, 4.0, 3)],
        "k long, rt double, rid long",
    )
    for direction in ("backward", "forward"):
        out = asof_join(
            left, right, ["k"], ["k"], "t", "rt", ["rid"], direction=direction
        )
        got = {r.tag: r.rid for r in out.collect()}
        assert got["nullkey"] is None
        assert got["nullts"] is None
        want_ok = 3 if direction == "backward" else None
        assert got["ok"] == want_ok, direction


def test_range_join_property_random_intervals(spark):
    """Hypothesis-style randomized check across bin sizes: binning
    never changes the answer relative to the theta join."""
    import random

    rnd = random.Random(7)
    pts_rows = [
        (rnd.randrange(4), float(rnd.randrange(1000)), i) for i in range(300)
    ]
    ivl_rows = [
        (rnd.randrange(4), lo := float(rnd.randrange(1000)),
         lo + float(rnd.randrange(1, 200)), 1000 + i)
        for i in range(60)
    ]
    pts = spark.createDataFrame(pts_rows, "k long, x double, pid long")
    ivl = spark.createDataFrame(ivl_rows, "ik long, lo double, hi double, iid long")
    want = {
        (p[2], v[3])
        for p in pts_rows
        for v in ivl_rows
        if p[0] == v[0] and v[1] <= p[1] < v[2]
    }
    for bin_size in (1.0, 7.0, 64.0, 250.0, 5000.0):
        got = {
            (r.pid, r.iid)
            for r in range_join(
                pts, ivl, ["k"], ["ik"], "x", "lo", "hi", bin_size
            ).collect()
        }
        assert got == want, bin_size
