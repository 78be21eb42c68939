"""Driver-style oracle comparison: run a Spark query and its DuckDB
oracle on the same parquet tables; compare row count, column names, and
order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from transferia_spark.session import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, bytes):
        return v.hex()
    return v


def _key(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


def compare(spark_df, con, oracle: str, float_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass).

    Decimal output columns are rejected outright: the driver's value
    hash normalizes DuckDB decimals through pandas (float64) while
    Spark decimals stay ``decimal.Decimal``, so a scale-2 sum like
    138014.00 stringifies as '138014.0' on one side and '138014.00' on
    the other — rows/schema match but the hash doesn't (CORRECTNESS_r02
    tpch_q1 / events_hourly_rollup). Queries must cast final decimals
    to DOUBLE (or STRING for >2^53 exact integers) in BOTH engines.
    """
    errs: list[str] = []
    dec_cols = [c for c, t in spark_df.dtypes if t.startswith("decimal")]
    if dec_cols:
        errs.append(
            f"decimal output columns {dec_cols}: driver-hash hazard — cast to DOUBLE/STRING in both engines"
        )
        return errs
    spark_cols = sorted(spark_df.columns)
    srows = [
        tuple(_norm(r[c]) for c in spark_cols) for r in spark_df.collect()
    ]
    rel = con.execute(oracle)
    ocols_raw = [d[0] for d in rel.description]
    orows_raw = rel.fetchall()
    order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    ocols = [ocols_raw[i] for i in order]
    orows = [tuple(_norm(r[i]) for i in order) for r in orows_raw]

    if spark_cols != ocols:
        errs.append(f"columns differ: spark={spark_cols} oracle={ocols}")
        return errs
    if len(srows) != len(orows):
        errs.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")
    srows.sort(key=_key)
    orows.sort(key=_key)
    bad = 0
    for a, b in zip(srows, orows):
        if a == b:
            continue
        ok = True
        for x, y in zip(a, b):
            if x == y:
                continue
            if (
                float_tol
                and isinstance(x, float)
                and isinstance(y, float)
                and abs(x - y) <= float_tol * max(1.0, abs(x), abs(y))
            ):
                continue
            ok = False
        if not ok:
            bad += 1
            if bad <= 3:
                errs.append(f"row mismatch: spark={a} oracle={b}")
    if bad > 3:
        errs.append(f"... {bad} mismatching rows total")
    return errs
