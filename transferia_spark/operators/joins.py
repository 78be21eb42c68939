"""Scale-shaped temporal joins Spark lacks as built-ins: as-of join and
point-in-interval range join.

The reference has no user-facing joins at all — its `sql` transformer
delegates a full dialect to embedded clickhouse-local per batch
(``pkg/parsers``/``registry/clickhouse/clickhouse_local.go:48``), and
ClickHouse exposes ASOF JOIN there. In the Spark engine the relational
surface is Spark SQL itself (SURVEY §2.5); these two operators cover
the temporal-join shapes Catalyst would otherwise execute as an O(N·M)
theta-join (BroadcastNestedLoopJoin / cartesian + filter), which does
not survive a 100 TB input.

Both are pure DataFrame compositions — no UDFs, no collect():

- ``asof_join``: union-tag + window carry-forward. ONE shuffle of each
  side on the join keys, then a per-key sort-and-scan (exactly the
  merge shape a hand-written engine uses). Cost is O((N+M) log p) per
  partition, independent of time-range overlap. Skewed keys are
  handled by AQE; there is no pair blow-up to skew in the first place.
- ``range_join``: interval binning. Intervals explode into the
  time-bins they cover (≈ (hi-lo)/bin_size + 1 copies — choose
  bin_size ≈ the typical interval length so the replication factor
  stays ~2), points land in exactly one bin, and the join becomes an
  equi-join on (keys…, bin) with a residual containment filter. Since
  a point has exactly one bin and an interval appears at most once per
  bin, the output needs NO dedup. This is the standard trick Spark's
  own range-join hint (Databricks runtime) applies internally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_T = "_asof_t"
_PACK = "_asof_pack"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: list[str],
    right_on: list[str],
    left_time: str,
    right_time: str,
    right_values: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    matched_time: str = "matched_time",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_time <= left_time`` (backward; ``>=`` for forward) within
    the same key group. Unmatched left rows keep NULLs (left join
    semantics).

    Requires (right_on…, right_time) to be unique on the right side —
    pre-aggregate the right frame otherwise (ties would make ANY
    engine's answer nondeterministic, including DuckDB's ASOF JOIN).

    Implementation: tag right rows 0 / left rows 1, union, and over a
    window partitioned by key and ordered by (time, tag) carry the last
    non-null *packed struct* of right values forward (struct, not bare
    columns: a right row whose value column is genuinely NULL must
    still overwrite the carry — row-atomic semantics). At equal
    timestamps the right row sorts first, so an exact-time match is
    taken, matching ASOF's ``<=``/``>=`` contract.

    One shuffle per side, no pair enumeration: the 100 TB shape.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    keys = list(left_on)
    # SQL join semantics: a right row with a NULL key or NULL time can
    # never satisfy `l.k = r.k AND l.t >= r.t`, so drop it before the
    # union (otherwise NULLS FIRST ordering would let its pack pollute
    # every carry in the NULL-key window partition)
    null_guard = F.lit(True)
    for rc in right_on:
        null_guard = null_guard & F.col(rc).isNotNull()
    r = right.filter(null_guard & F.col(right_time).isNotNull()).select(
        *[F.col(rc).alias(lc) for rc, lc in zip(right_on, left_on)],
        F.col(right_time).alias(_T),
        F.struct(
            F.col(right_time).alias(matched_time),
            *[F.col(v) for v in right_values],
        ).alias(_PACK),
    ).withColumn(_SIDE, F.lit(0))
    l = left.withColumn(_T, F.col(left_time)).withColumn(_SIDE, F.lit(1))

    u = l.unionByName(r, allowMissingColumns=True)
    order = [F.col(_T).asc(), F.col(_SIDE).asc()]
    if direction == "forward":
        order = [F.col(_T).desc(), F.col(_SIDE).asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col(_PACK), ignorenulls=True).over(w)

    # a left row with a NULL key or NULL time matches nothing in SQL
    # (`NULL = x` / `NULL >= x` are never true) — null out its carry
    left_matchable = F.col(left_time).isNotNull()
    for k in keys:
        left_matchable = left_matchable & F.col(k).isNotNull()
    out = (
        u.withColumn(_PACK, F.when(left_matchable, matched))
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE, _T)
    )
    if tolerance_seconds is not None:
        lt = F.col(left_time).cast("double")
        rt = F.col(_PACK)[matched_time].cast("double")
        gap = (lt - rt) if direction == "backward" else (rt - lt)
        out = out.withColumn(
            _PACK, F.when(gap <= F.lit(float(tolerance_seconds)), F.col(_PACK))
        )
    return out.select(
        *[c for c in left.columns],
        F.col(_PACK)[matched_time].alias(matched_time),
        *[F.col(_PACK)[v].alias(v) for v in right_values],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_on: list[str],
    interval_on: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: float,
    hi_inclusive: bool = False,
) -> DataFrame:
    """Inner-join point rows to interval rows with
    ``lo <= point < hi`` (``<= hi`` when ``hi_inclusive``) and equal
    keys, without a theta-join.

    ``point_col``/``lo_col``/``hi_col`` must be numeric (cast
    timestamps with ``unix_timestamp`` / ``unix_micros`` first);
    ``bin_size`` is in the same unit. Output carries all columns of
    both inputs (key columns once, under the point-side names).
    """
    if bin_size <= 0:
        raise ValueError("bin_size must be positive")
    b = F.lit(float(bin_size))
    bin_of = lambda c: F.floor(c.cast("double") / b).cast("long")  # noqa: E731

    p = points.withColumn("_bin", bin_of(F.col(point_col)))
    i = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(bin_of(F.col(lo_col)), bin_of(F.col(hi_col)))),
    )
    # rename interval keys to avoid ambiguity; keys equality via the bin join
    i = i.select(
        *[F.col(k).alias(f"_ik_{n}") for n, k in enumerate(interval_on)],
        F.col("_bin"),
        *[F.col(c) for c in intervals.columns if c not in interval_on],
    )
    cond = [p["_bin"] == i["_bin"]]
    for n, k in enumerate(point_on):
        cond.append(p[k] == i[f"_ik_{n}"])
    contain = i[lo_col] <= p[point_col]
    upper = p[point_col] <= i[hi_col] if hi_inclusive else p[point_col] < i[hi_col]
    joined = p.join(i, cond + [contain, upper], "inner")
    return joined.select(
        *[p[c] for c in points.columns],
        *[i[c] for c in intervals.columns if c not in interval_on],
    )
