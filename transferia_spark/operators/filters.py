"""Row/column filter transformers.

- ``filter_columns`` ≈ ``registry/filter/filter_columns_transformer.go:17``
- ``filter_rows`` ≈ ``registry/filter_rows/filter_rows.go:22`` with the
  predicate grammar of ``library/go/yandex/cloud/filter/filters.go:12-23``
  (ops ``= != < <= > >= IN NOT IN ~ !~``; multiple filter strings OR-ed)
- ``filter_rows_by_ids`` ≈ ``registry/filter_rows_by_ids/...go:14``
- ``skip_events`` ≈ ``registry/filter/skip_events.go:13``

All compile to native Spark SQL expressions, so Catalyst pushes them
into the scan (PushedFilters on parquet / JDBC) — at 100 TB the filter
runs inside the source, not in the engine.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import OP_COL
from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import MD_PRIMARY_KEY, TableID

# --- filter_rows DSL --------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<op>!=|<=|>=|=|<|>|!~|~)
      | (?P<kw>\bNOT\s+IN\b|\bIN\b|\bAND\b)
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<list>\((?:[^()]*)\)|\[(?:[^\[\]]*)\])
      | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE | re.IGNORECASE,
)


def _parse_value(tok: str):
    tok = tok.strip()
    if tok[0] in "'\"":
        return tok[1:-1].replace("\\'", "'").replace('\\"', '"')
    low = tok.lower()
    if low in ("true", "false"):
        return low == "true"
    if low == "null":
        return None
    return float(tok) if "." in tok else int(tok)


def _parse_list(tok: str) -> list:
    inner = tok[1:-1]
    parts = re.findall(r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"|[^,\s]+", inner)
    return [_parse_value(p) for p in parts]


def compile_filter(expr: str) -> Column:
    """Compile one filter string (AND-joined terms) into a Spark Column.

    Grammar (≈ cloud/filter): ``ident op value [AND ident op value ...]``
    with ops ``= != < <= > >= IN NOT IN ~ !~``; ``~`` is substring match.
    """
    pos, conds = 0, []
    toks: list[tuple[str, str]] = []
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if not m:
            raise ValueError(f"filter_rows: cannot parse {expr!r} at offset {pos}")
        pos = m.end()
        for k, v in m.groupdict().items():
            if v is not None:
                toks.append((k, v))
    i = 0
    while i < len(toks):
        kind, val = toks[i]
        if kind == "kw" and val.upper() == "AND":
            i += 1
            continue
        if kind != "ident":
            raise ValueError(f"filter_rows: expected column name, got {val!r}")
        col = F.col(val)
        okind, op = toks[i + 1]
        if okind == "kw":  # IN / NOT IN
            lst = _parse_list(toks[i + 2][1])
            c = col.isin(lst)
            if re.match(r"not\s+in", op, re.IGNORECASE):
                c = ~c
        else:
            vkind, vtok = toks[i + 2]
            value = _parse_list(vtok) if vkind == "list" else _parse_value(vtok)
            if op == "=":
                c = col.isNull() if value is None else (col == F.lit(value))
            elif op == "!=":
                c = col.isNotNull() if value is None else (col != F.lit(value))
            elif op == "<":
                c = col < F.lit(value)
            elif op == "<=":
                c = col <= F.lit(value)
            elif op == ">":
                c = col > F.lit(value)
            elif op == ">=":
                c = col >= F.lit(value)
            elif op == "~":
                c = col.contains(str(value))
            elif op == "!~":
                c = ~col.contains(str(value))
            else:
                raise ValueError(f"filter_rows: unknown op {op!r}")
        conds.append(c)
        i += 3
    if not conds:
        raise ValueError(f"filter_rows: empty filter {expr!r}")
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


@register
class FilterRows(Transformer):
    """Keep rows matching any of the filter strings (OR of AND-terms).

    The reference is fatal on update/delete kinds (it cannot filter a
    delta stream consistently); we reproduce that check when an ``_op``
    column is present.
    """

    TYPE = "filter_rows"

    def __init__(self, filters: list[str] | str, allow_cdc: bool = False):
        if isinstance(filters, str):
            filters = [filters]
        self.filters = filters
        self.allow_cdc = allow_cdc
        self._cond = compile_filter(filters[0])
        for f in filters[1:]:
            self._cond = self._cond | compile_filter(f)

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        cond = self._cond
        if OP_COL in df.columns and not self.allow_cdc:
            # fatal on non-insert kinds, as in filter_rows.go:99. The
            # guard is folded into the predicate so the contract is
            # enforced during the one scan that evaluates the filter —
            # no extra eager job per batch, and the same shape works for
            # streaming micro-batches and 100 TB snapshot frames alike.
            guard = F.when(
                F.col(OP_COL) != "i",
                F.raise_error(
                    F.lit("filter_rows: update/delete items are not filterable")
                ).cast("boolean"),
            ).otherwise(F.lit(True))
            cond = guard & cond
        return [(table, df.filter(cond))]


@register
class FilterColumns(Transformer):
    """Keep/drop columns by explicit lists or regex; PK columns must
    survive (``filter_columns_transformer.go`` contract)."""

    TYPE = "filter_columns"

    def __init__(
        self,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
        include_regex: str = "",
        exclude_regex: str = "",
    ):
        self.include = include
        self.exclude = set(exclude or [])
        self.include_re = re.compile(include_regex) if include_regex else None
        self.exclude_re = re.compile(exclude_regex) if exclude_regex else None

    def _keep(self, name: str) -> bool:
        if self.include is not None and name not in self.include:
            return False
        if self.include_re and not self.include_re.search(name):
            return False
        if name in self.exclude:
            return False
        if self.exclude_re and self.exclude_re.search(name):
            return False
        return True

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        kept = [c for c in df.columns if self._keep(c)]
        for f in df.schema.fields:
            if (f.metadata or {}).get(MD_PRIMARY_KEY) and f.name not in kept:
                raise ValueError(f"filter_columns: would drop PK column {f.name!r}")
        if not kept:
            raise ValueError("filter_columns: no columns left")
        return [(table, df.select(*kept))]


@register
class FilterRowsByIds(Transformer):
    """Keep rows whose id column value is in the allow-list
    (``filter_rows_by_ids.go:14``). Small lists compile to ``isin`` —
    Catalyst turns that into a pushed-down IN; huge lists should use a
    broadcast semi-join instead (``from_ids_df``)."""

    TYPE = "filter_rows_by_ids"

    def __init__(self, column: str, ids: list, ids_df: DataFrame | None = None):
        self.column = column
        self.ids = ids
        self.ids_df = ids_df

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        if self.ids_df is not None:
            keyed = self.ids_df.toDF(self.column)
            return [(table, df.join(F.broadcast(keyed), self.column, "left_semi"))]
        return [(table, df.filter(F.col(self.column).isin(self.ids)))]


@register
class SkipEvents(Transformer):
    """Drop CDC items of the given kinds (``skip_events.go:13``), e.g.
    all deletes. No-op on snapshot batches without ``_op``."""

    TYPE = "skip_events"

    def __init__(self, kinds: list[str]):
        self.kinds = kinds

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        if OP_COL not in df.columns:
            return [(table, df)]
        return [(table, df.filter(~F.col(OP_COL).isin(self.kinds)))]
