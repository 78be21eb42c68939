"""Generic-parser golden parity against the reference's canonized
parser outputs (`tests/canon/parser/samples/static/generic/*` and the
canondata under `tests/canon/parser/gotest/` in transferia/transferia,
runner `canon_static_generic_test.go`).

Each case feeds the SAME sample lines through our json/tskv parsers
configured with the SAME declared field list (YT types mapped through
the typesystem matrix) and asserts the parsed data-field values equal
the reference's canonized ChangeItems. System columns
(_timestamp/_partition/_offset/_idx) are harness-synthesized constants
in the canon runner and are excluded from the value compare."""

from __future__ import annotations

import decimal
import json
import os

import pytest

from transferia_spark.parsers import build_parser
from transferia_spark.schema.typesystem import yt_to_spark

SAMPLES = "/root/reference/tests/canon/parser/samples/static/generic"
CANON = "/root/reference/tests/canon/parser/gotest/canondata"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference checkout not present"
)


def _load_case(name: str, parser_key: str):
    cfg = json.load(open(f"{SAMPLES}/{name}.config.json"))
    fields = [
        (f["name"], f["type"])
        for f in cfg["ParserConfig"][parser_key]["Fields"]
    ]
    lines = open(f"{SAMPLES}/{name}.sample").read().splitlines()
    golden = json.load(
        open(f"{CANON}/gotest.gotest.TestGenericParsers_{name}_canon_0/extracted")
    )
    return fields, [ln for ln in lines if ln], golden


def _golden_rows(golden, data_cols):
    out = []
    for item in golden:
        names = item["ColumnNames"]["value"]
        vals = [v.get("value") for v in item["ColumnValues"]["value"]]
        row = dict(zip(names, vals))
        out.append(tuple(_norm(row.get(c)) for c in data_cols))
    return sorted(out)


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return int(v)
    if isinstance(v, dict) and not v:
        return None  # empty _rest map ≡ no overflow fields
    return v


def _spark_rows(df, data_cols):
    out = []
    for r in df.collect():
        vals = []
        for c in data_cols:
            x = r[c]
            if isinstance(x, decimal.Decimal):
                x = int(x)
            if isinstance(x, dict) and not x:
                x = None
            vals.append(x)
        out.append(tuple(vals))
    return sorted(out)


def _schema_ddl(fields) -> str:
    """Parser-level type mapping: YT ``string`` is bytes in the storage
    matrix, but the generic parser extracts JSON string fields as their
    raw character bytes (``ParseVal``, generic_parser.go:888) — i.e.
    Spark StringType; every other type goes through the matrix."""
    def one(yt: str) -> str:
        if yt in ("string", "utf8"):
            return "string"
        return yt_to_spark(yt).simpleString()

    return ", ".join(f"`{name}` {one(yt)}" for name, yt in fields)


def test_canon_json_sample(spark):
    fields, lines, golden = _load_case("json", "json.lb")
    data_cols = [n for n, _ in fields]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    parse = build_parser(
        "json", schema=_schema_ddl(fields), add_rest=True, add_system_cols=False
    )
    out = parse(df)
    # nothing unparsed, nothing overflowed (golden _rest is {})
    rows = out.collect()
    assert all(r["_unparsed_raw"] is None for r in rows)
    assert all(not r["_rest"] for r in rows)
    assert _spark_rows(out, data_cols) == _golden_rows(golden, data_cols)


def test_canon_tskv_sample(spark):
    fields, lines, golden = _load_case("tskv", "tskv.lb")
    data_cols = [n for n, _ in fields]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    parse = build_parser("tskv", schema=_schema_ddl(fields), add_system_cols=False)
    out = parse(df)
    assert _spark_rows(out, data_cols) == _golden_rows(golden, data_cols)


def test_canon_uint64_width(spark):
    """The json canon case carries a uint64 (89488198116272410) —
    prove the declared YT type survives the matrix without precision
    loss (the reference stores it as uint64; we must not round-trip it
    through a double)."""
    fields, lines, golden = _load_case("json", "json.lb")
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    parse = build_parser(
        "json", schema=_schema_ddl(fields), add_rest=False, add_system_cols=False
    )
    got = sorted(_norm(r["version"]) for r in parse(df).collect())
    want = sorted(
        _norm(dict(zip(i["ColumnNames"]["value"],
                       [v.get("value") for v in i["ColumnValues"]["value"]]))["version"])
        for i in golden
    )
    assert got == want and max(got) > 2**53  # double would mangle it
