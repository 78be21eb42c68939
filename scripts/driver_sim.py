"""Simulate the driver: load __spark_entry__ via importlib (as the
driver does), smoke entry(spark), then run every queries() entry at
sf0.01 against its oracle_sql() in DuckDB, comparing count/schema/
values. Exits non-zero on any mismatch."""

import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")

from tests.oracle_check import compare, duckdb_conn  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])  # optional query-name filter for fast iteration

spec = importlib.util.spec_from_file_location("spark_entry", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

# Build a VIRGIN session the way the driver does — deliberately without
# get_spark()'s builder confs, so any hidden dependency on them fails here
# first (CORRECTNESS_r01's 11 fail-env rows came from exactly that gap).
from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .appName("driver_sim")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

if not ONLY:
    t0 = time.time()
    edf = mod.entry(spark)
    rows = edf.count()
    print(f"entry(): {rows} rows, schema={[f.name for f in edf.schema.fields]}, {time.time()-t0:.1f}s")
    assert rows > 0

qs, oracles = mod.queries(), mod.oracle_sql()
fail = 0
for name in sorted(ONLY or qs):
    t0 = time.time()
    df = qs[name](spark, SF)
    if name in oracles:
        con = duckdb_conn(SF)
        errs = compare(df, con, oracles[name])
        status = "OK " if not errs else "FAIL"
        if errs:
            fail += 1
        print(f"{status} {name:28s} {time.time()-t0:5.1f}s" + ("  " + "; ".join(errs[:2]) if errs else ""))
    else:
        n = df.count()
        print(f"ROWS {name:28s} {time.time()-t0:5.1f}s rows={n}")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
