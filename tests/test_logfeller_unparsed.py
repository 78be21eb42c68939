"""Logfeller parser + <table>_unparsed dead-letter routing.

≈ ``pkg/parsers/registry/logfeller/lib/lib.go`` (parser × splitter into
the generic-parser pipeline) and ``pkg/parsers/generic/generic_parser.go:575``
``NewUnparsed`` (unparsable rows become rows of a sibling
``<table>_unparsed`` table with the fixed UnparsedSchema)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from transferia_spark.parsers import build_parser
from transferia_spark.plans.transfer import route_unparsed
from transferia_spark.schema.colschema import TableID


def _queue_df(spark, payloads):
    rows = [(i, p.encode(), "topic", 0, i) for i, p in enumerate(payloads)]
    return spark.createDataFrame(
        rows, "key long, value binary, topic string, partition int, offset long"
    ).withColumn("timestamp", F.current_timestamp())


def test_logfeller_line_splitter_json_records(spark):
    df = _queue_df(spark, ['{"id": 1, "msg": "a"}\n{"id": 2, "msg": "b"}\n\nnot-json'])
    parse = build_parser(
        "logfeller", parser_name="json", schema="id INT, msg STRING", splitter="line"
    )
    out = parse(df).collect()
    assert len(out) == 3  # empty line dropped by the splitter
    good = sorted((r["id"], r["msg"], r["_idx"]) for r in out if r["_unparsed_raw"] is None)
    assert good == [(1, "a", 0), (2, "b", 1)]
    (bad,) = [r for r in out if r["_unparsed_raw"] is not None]
    assert bad["_unparsed_raw"] == "not-json" and "malformed" in bad["_error"]
    assert bad["_logfeller_timestamp"] is not None  # PK column always present


def test_logfeller_json_list_splitter_and_tskv_parser(spark):
    df = _queue_df(spark, ['["k=1\\tv=x", "k=2\\tv=y", "plain"]'])
    parse = build_parser(
        "logfeller", parser_name="tskv", schema="k INT, v STRING",
        splitter="json_list", add_system_cols=False,
    )
    out = parse(df).collect()
    good = sorted((r["k"], r["v"]) for r in out if r["_unparsed_raw"] is None)
    assert good == [(1, "x"), (2, "y")]
    assert [r["_unparsed_raw"] for r in out if r["_unparsed_raw"]] == ["plain"]


def test_logfeller_timestamp_field(spark):
    df = _queue_df(spark, ['{"id": 1, "ts": "2024-03-01 10:00:00"}'])
    parse = build_parser(
        "logfeller", parser_name="json", schema="id INT, ts STRING",
        timestamp_field="ts", add_system_cols=False,
    )
    (row,) = parse(df).collect()
    assert str(row["_logfeller_timestamp"]).startswith("2024-03-01 10:00:00")


def test_route_unparsed_splits_dead_letter_table(spark):
    df = _queue_df(spark, ['{"id": 1}\nbroken'])
    parse = build_parser("logfeller", parser_name="json", schema="id INT")
    routed = route_unparsed({TableID("", "logs"): parse(df)})
    assert {t.fqtn() for t in routed} == {"logs", "logs_unparsed"}
    clean = routed[TableID("", "logs")]
    assert "_unparsed_raw" not in clean.columns
    assert [r["id"] for r in clean.collect()] == [1]
    dead = routed[TableID("", "logs_unparsed")].collect()
    assert len(dead) == 1
    # UnparsedSchema shape (generic_parser.go:231)
    assert set(routed[TableID("", "logs_unparsed")].columns) == {
        "_timestamp", "_partition", "_offset", "_idx", "unparsed_row", "reason",
    }
    assert dead[0]["unparsed_row"] == "broken" and dead[0]["_offset"] == 0


def test_route_unparsed_passthrough_without_marker(spark):
    df = spark.range(3).toDF("id")
    routed = route_unparsed({TableID("", "t"): df})
    assert list(routed) == [TableID("", "t")] and routed[TableID("", "t")] is df


def test_activate_writes_unparsed_side_table(spark, tmp_path):
    """End-to-end: a pipeline whose transformer leaves _unparsed_raw on
    the frame gets the side table written by activate()."""
    from transferia_spark.operators.base import Transformation
    from transferia_spark.plans.transfer import TransferSpec, activate
    from transferia_spark.sinks.base import CleanupPolicy
    from transferia_spark.sinks.files import FileSink
    from transferia_spark.sources.files import FileSource

    src_dir = str(tmp_path / "in")
    # jsonparser keeps unparsable payloads in _unparsed_raw (keep_raw)
    spark.createDataFrame(
        [('{"a": 1}',), ("oops",)], "payload string"
    ).write.mode("overwrite").parquet(os.path.join(src_dir, "logs.parquet"))

    from transferia_spark.operators import build

    spec = TransferSpec(
        src=FileSource(path=os.path.join(src_dir, "logs.parquet"), format="parquet"),
        dst=FileSink(path=str(tmp_path / "out"), format="parquet"),
        transformation=Transformation().add(
            build("jsonparser", column="payload", schema="a INT", keep_raw=True)
        ),
        cleanup=CleanupPolicy.DISABLED,
    )
    activate(spark, spec)
    out = str(tmp_path / "out")
    clean = spark.read.parquet(os.path.join(out, "logs"))
    assert [r["a"] for r in clean.collect()] == [1]
    dead = spark.read.parquet(os.path.join(out, "logs_unparsed"))
    assert [r["unparsed_row"] for r in dead.collect()] == ["oops"]
