"""Schema model: ColSchema / TableSchema / TableID ↔ Spark StructType.

Mirrors the reference's schema system (see
``pkg/abstract/changeitem/col_schema.go:14-29``,
``table_schema.go:10-15``, ``table_id.go`` in transferia/transferia):
a column carries its logical type, primary-key membership, NOT NULL
flag, generated-column expression, and the provider-native original
type string (``"pg:timestamptz"``). In Spark all of that rides in
``StructField.metadata`` so it survives every DataFrame transformation.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

from pyspark.sql import types as T

from transferia_spark.schema.typesystem import spark_to_yt, yt_to_spark

# metadata keys used on StructField
MD_PRIMARY_KEY = "primaryKey"
MD_FAKE_KEY = "fakeKey"
MD_REQUIRED = "required"
MD_EXPRESSION = "expression"
MD_ORIGINAL_TYPE = "originalType"
MD_PATH = "path"
MD_PROPERTIES = "properties"


@dataclass(frozen=True)
class TableID:
    """Namespace-qualified table identity (``table_id.go``)."""

    namespace: str
    name: str

    def fqtn(self) -> str:
        return f"{self.namespace}.{self.name}" if self.namespace else self.name

    @staticmethod
    def parse(s: str) -> "TableID":
        """Parse ``schema.table`` / ``"q.uoted"."name"`` / bare ``table``."""
        parts, cur, in_q = [], [], False
        for ch in s:
            if ch == '"':
                in_q = not in_q
            elif ch == "." and not in_q:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        parts.append("".join(cur))
        if len(parts) == 1:
            return TableID("", parts[0])
        return TableID(parts[0], ".".join(parts[1:]))


@dataclass
class ColSchema:
    """One column's logical schema (``col_schema.go:14-29``)."""

    name: str
    data_type: str  # YT type-system string: int64, utf8, double, any, ...
    primary_key: bool = False
    fake_key: bool = False
    required: bool = False
    expression: str = ""  # generated column (Spark SQL expression)
    original_type: str = ""  # e.g. "pg:timestamptz", "mysql:bigint(20) unsigned"
    path: str = ""  # dotted nested path
    properties: dict = field(default_factory=dict)

    def to_struct_field(self) -> T.StructField:
        md = {}
        if self.primary_key:
            md[MD_PRIMARY_KEY] = True
        if self.fake_key:
            md[MD_FAKE_KEY] = True
        if self.required:
            md[MD_REQUIRED] = True
        if self.expression:
            md[MD_EXPRESSION] = self.expression
        if self.original_type:
            md[MD_ORIGINAL_TYPE] = self.original_type
        if self.path:
            md[MD_PATH] = self.path
        if self.properties:
            md[MD_PROPERTIES] = self.properties
        return T.StructField(
            self.name, yt_to_spark(self.data_type), nullable=not self.required, metadata=md
        )

    @staticmethod
    def from_struct_field(f: T.StructField) -> "ColSchema":
        md = f.metadata or {}
        return ColSchema(
            name=f.name,
            data_type=md.get("ytType") or spark_to_yt(f.dataType),
            primary_key=bool(md.get(MD_PRIMARY_KEY)),
            fake_key=bool(md.get(MD_FAKE_KEY)),
            required=bool(md.get(MD_REQUIRED)) or not f.nullable,
            expression=md.get(MD_EXPRESSION, ""),
            original_type=md.get(MD_ORIGINAL_TYPE, ""),
            path=md.get(MD_PATH, ""),
            properties=dict(md.get(MD_PROPERTIES, {})),
        )


class TableSchema:
    """Ordered column list + memoized name index + content hash
    (``table_schema.go:10-15``)."""

    def __init__(self, columns: list[ColSchema]):
        self.columns = list(columns)
        self._index = {c.name: i for i, c in enumerate(self.columns)}

    def __iter__(self):
        return iter(self.columns)

    def __len__(self):
        return len(self.columns)

    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    def key_names(self) -> list[str]:
        """Primary-key columns, in declaration order."""
        return [c.name for c in self.columns if c.primary_key]

    def index_of(self, name: str) -> int:
        return self._index[name]

    def get(self, name: str) -> ColSchema | None:
        i = self._index.get(name)
        return self.columns[i] if i is not None else None

    def hash(self) -> str:
        """Stable content hash (≈ ``table_schema.go`` Hash) used for
        schema-drift detection during replication."""
        payload = json.dumps(
            [
                [c.name, c.data_type, c.primary_key, c.required, c.original_type]
                for c in self.columns
            ],
            separators=(",", ":"),
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def to_struct_type(self) -> T.StructType:
        return T.StructType([c.to_struct_field() for c in self.columns])

    @staticmethod
    def from_struct_type(st: T.StructType) -> "TableSchema":
        return TableSchema([ColSchema.from_struct_field(f) for f in st.fields])


# DBSchema (``db_schema.go``) is simply dict[TableID, TableSchema].
DBSchema = dict
