"""Greenplum gpfdist load sink: TEXT staging files, external-table DDL,
transactional temp-table commit sequence (SQL captured by a recorder —
no Greenplum in this environment)."""

from __future__ import annotations

import glob

import pytest

from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import CleanupPolicy, build_sink


@pytest.fixture()
def rec():
    return []


def _sink(tmp_path, rec, **kw):
    return build_sink(
        "greenplum_gpfdist",
        staging_dir=str(tmp_path / "stage"),
        gpfdist_urls=["gpfdist://etl1:8080", "gpfdist://etl2:8080"],
        sql_executor=rec.append,
        **kw,
    )


def test_write_stages_text_and_runs_load_sequence(spark, tmp_path, rec):
    df = spark.createDataFrame(
        [(1, "plain", 1.5), (2, "tab\there", None), (3, None, 2.5)],
        "id long, name string, score double",
    ).coalesce(2)
    _sink(tmp_path, rec).write(df, TableID("sales", "orders"))

    # staged TEXT parts: tab-separated, \N nulls, tab escaped
    lines = []
    for p in glob.glob(str(tmp_path / "stage" / "orders" / "part-*")):
        lines += open(p).read().splitlines()
    by_id = {ln.split("\t")[0]: ln for ln in lines}
    assert by_id["1"] == "1\tplain\t1.5"
    assert by_id["2"].startswith("2\ttab\\there")  # tab escaped in value
    assert by_id["3"] == "3\t\\N\t2.5"

    sql = rec
    ext = '"sales"."ext_orders"'
    # unqualified: CREATE TEMPORARY TABLE rejects schema-qualified names
    tmp = '"tmp_sales_orders"'
    target = '"sales"."orders"'
    create_ext = next(q for q in sql if q.startswith("CREATE READABLE EXTERNAL"))
    assert ext in create_ext
    assert '"id" bigint' in create_ext and '"score" double precision' in create_ext
    assert "'gpfdist://etl1:8080/orders/*', 'gpfdist://etl2:8080/orders/*'" in create_ext
    assert "FORMAT 'TEXT'" in create_ext
    # load sequence: ext → tmp, then transactional tmp → target swap
    i_ext = sql.index(f'INSERT INTO {tmp}("id", "name", "score") '
                      f'SELECT "id", "name", "score" FROM {ext}')
    i_begin = sql.index("BEGIN")
    i_tgt = sql.index(f'INSERT INTO {target}("id", "name", "score") '
                      f'SELECT "id", "name", "score" FROM {tmp}')
    i_commit = sql.index("COMMIT")
    assert i_ext < i_begin < i_tgt < i_commit
    assert any(q.startswith(f"DROP TABLE IF EXISTS {tmp}") for q in sql)


def test_generated_columns_excluded(spark, tmp_path, rec):
    df = spark.createDataFrame([(1, "x", "gen")], "id long, v string, total string")
    _sink(tmp_path, rec, generated_cols=["total"]).write(df, TableID("", "t"))
    ins = [q for q in rec if q.startswith("INSERT INTO")]
    assert all('"total"' not in q for q in ins)  # ≈ InsertQueryColumns


def test_cleanup_policies(tmp_path, rec):
    s = _sink(tmp_path, rec)
    s.cleanup(TableID("", "t"), CleanupPolicy.DROP)
    assert rec[-1] == 'DROP TABLE IF EXISTS "public"."t"'
    s.cleanup(TableID("", "t"), CleanupPolicy.TRUNCATE)
    assert rec[-1] == 'TRUNCATE TABLE "public"."t"'
    n = len(rec)
    s.cleanup(TableID("", "t"), CleanupPolicy.DISABLED)
    assert len(rec) == n


def test_missing_executor_is_gated(tmp_path):
    sink = build_sink("greenplum_gpfdist", staging_dir=str(tmp_path))
    with pytest.raises(NotImplementedError, match="SQL executor"):
        sink.cleanup(TableID("", "t"), CleanupPolicy.DROP)
