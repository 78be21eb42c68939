"""Transformer protocol, registry, and per-table chain assembly.

Mirrors the reference's transformer contract
(``pkg/abstract/transformer.go:32-38`` in transferia/transferia):
``Suitable(table, schema)``, ``ResultSchema(schema)``, ``Apply(batch)``;
and chain assembly with per-table plans
(``pkg/transformer/transformation.go:46-160``).

In Spark a "batch" is a DataFrame; every transformer is a stateless
narrow transformation (Catalyst fuses the chain into one stage).
Transformers that *route* rows to different tables (rename_tables,
table_splitter) return multiple ``(TableID, DataFrame)`` pairs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from transferia_spark.schema.colschema import TableID

# output of one transformer application: row-sets routed per table
Routed = list[tuple[TableID, DataFrame]]


class Transformer:
    """Base class. Subclasses set ``TYPE`` (the registry type string)."""

    TYPE: str = ""

    def suitable(self, table: TableID, df: DataFrame) -> bool:  # noqa: ARG002
        return True

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        raise NotImplementedError

    # convenience for the common single-table case
    def apply_df(self, df: DataFrame) -> DataFrame:
        out = self.apply(TableID("", "t"), df)
        assert len(out) == 1
        return out[0][1]


_REGISTRY: dict[str, Callable[..., Transformer]] = {}


def register(cls):
    """Class decorator ≈ ``transformer.Register`` (``pkg/transformer/registry.go``)."""
    assert cls.TYPE, f"{cls} must define TYPE"
    _REGISTRY[cls.TYPE] = cls
    return cls


def build(type_string: str, **config) -> Transformer:
    try:
        factory = _REGISTRY[type_string]
    except KeyError:
        raise ValueError(
            f"unknown transformer {type_string!r}; known: {sorted(_REGISTRY)}"
        ) from None
    return factory(**config)


def known_types() -> list[str]:
    return sorted(_REGISTRY)


@dataclass
class Transformation:
    """A chain of transformers applied per table
    (≈ ``pkg/transformer/transformation.go`` AddTablePlan/Push).

    Each input table gets the sub-chain of transformers whose
    ``suitable`` accepts it; routing transformers fan rows out to new
    table ids, and downstream transformers are re-matched against the
    routed table id (same behavior as the reference's per-table plans).
    """

    transformers: list[Transformer] = field(default_factory=list)

    def add(self, t: Transformer) -> "Transformation":
        self.transformers.append(t)
        return self

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        current: Routed = [(table, df)]
        for t in self.transformers:
            nxt: Routed = []
            for tid, d in current:
                if t.suitable(tid, d):
                    nxt.extend(t.apply(tid, d))
                else:
                    nxt.append((tid, d))
            current = nxt
        return current

    def apply_batch(self, batches: dict[TableID, DataFrame]) -> dict[TableID, DataFrame]:
        """Apply to a multi-table batch; rows routed to the same output
        table id from different inputs are unioned."""
        out: dict[TableID, DataFrame] = {}
        for tid, df in batches.items():
            for otid, odf in self.apply(tid, df):
                out[otid] = odf if otid not in out else out[otid].unionByName(odf)
        return out
