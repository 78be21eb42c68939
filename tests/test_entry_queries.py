"""Every queries() entry runs and matches its DuckDB oracle at sf0.001
(the driver does the same at sf0.01)."""

import importlib.util
import sys

import pytest

sys.path.insert(0, "/root/repo")
from tests.oracle_check import compare, duckdb_conn  # noqa: E402

spec = importlib.util.spec_from_file_location("spark_entry", "/root/repo/__spark_entry__.py")
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_all_queries_have_oracles():
    missing = [k for k in QUERIES if k not in ORACLES]
    # non-SQL-expressible ops may be absent, but list them explicitly
    allowed_missing = set()
    assert set(missing) <= allowed_missing, f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check
        return
    con = duckdb_conn(sf_dir)
    errs = compare(df, con, ORACLES[name])
    assert not errs, f"{name}: " + "; ".join(errs)
