"""Wire-source schema discovery: ``TableList``/``TableSchema`` parity.

The reference discovers each storage's tables, column types and primary
keys from the source catalog at activation (``pkg/abstract/storage.go:
286-297``; PG ``pkg/providers/postgres/schema.go``; MySQL
``pkg/providers/mysql/schema.go:16-101``) — a user never hand-writes a
DDL string per table. This module gives the repo's wire-direct
snapshot sources (``pgcopy``/``mysqlselect``) the same power over the
sessions they already hold: the catalog reads are plain result-set
queries (``PgWireSession.simple_query`` / ``MySqlWireSession.
query_rows``), and the native→Spark type mapping routes through the
same YT-scalar currency as everything else
(:mod:`transferia_spark.schema.typesystem`), reproducing the
reference's published matrices (``postgres/typesystem.md``,
``mysql/typesystem.go`` TypeToYt).

Gated-provider split as usual: statement builders and type matrices
are pure (driver-scorable — the oracle re-derives the matrix in SQL);
the discovery calls run over injectable sessions and are pinned by
loopback e2e tests where ``tables:`` omits ``schema:`` entirely.
"""

from __future__ import annotations

from pyspark.sql import types as T

from transferia_spark.schema.typesystem import yt_to_spark

# --------------------------------------------------------------- statements

#: schemas the reference never lists (postgres/schema.go:33)
PG_SYSTEM_SCHEMAS = ("pg_catalog", "information_schema")
#: (mysql/schema.go:29)
MYSQL_SYSTEM_SCHEMAS = (
    "sys", "mysql", "information_schema", "performance_schema"
)


def _in_list(vals) -> str:
    return ", ".join(_lit(v) for v in vals)


def _lit(val: str) -> str:
    """SQL string literal with quote escaping — schema/database names
    come from config and must not break out of the catalog statement
    (code-review r9: the repo's quote_ident contract applies to
    literals too)."""
    return "'" + val.replace("'", "''") + "'"


def pg_columns_sql(schema: str | None = None) -> str:
    """Column list per table, in ordinal order — the
    ``information_schema`` face of the reference's pg_catalog read
    (``postgres/schema.go`` SchemaExtractor; the catalog subtleties it
    needs — replica identity, inherited keys — live in the PK query).
    ``data_type`` carries the normalized spellings the published type
    matrix (typesystem.md) is written in."""
    where = (
        f"c.table_schema NOT IN ({_in_list(PG_SYSTEM_SCHEMAS)})"
        if schema is None
        else f"c.table_schema = {_lit(schema)}"
    )
    return (
        "SELECT c.table_schema, c.table_name, c.column_name, "
        "c.ordinal_position, c.data_type, c.udt_name "
        "FROM information_schema.columns c "
        "JOIN information_schema.tables t "
        "ON t.table_schema = c.table_schema "
        "AND t.table_name = c.table_name "
        "WHERE t.table_type = 'BASE TABLE' AND " + where
        + " ORDER BY c.table_schema, c.table_name, c.ordinal_position"
    )


def pg_pkeys_sql(schema: str | None = None) -> str:
    """Primary-key columns per table, in key order. The reference's
    two fallbacks (``schema.go:318-447``) are separate catalog reads:
    :func:`pg_replident_keys_sql` (unique replica-identity indexes) and
    :func:`pg_partition_parents_sql` (partitioned children inherit the
    parent's key) — :func:`discover_pg_tables` resolves PK → replident
    → parent, in that order."""
    where = (
        f"tc.table_schema NOT IN ({_in_list(PG_SYSTEM_SCHEMAS)})"
        if schema is None
        else f"tc.table_schema = {_lit(schema)}"
    )
    return (
        "SELECT tc.table_schema, tc.table_name, kcu.column_name, "
        "kcu.ordinal_position "
        "FROM information_schema.table_constraints tc "
        "JOIN information_schema.key_column_usage kcu "
        "ON kcu.constraint_name = tc.constraint_name "
        "AND kcu.constraint_schema = tc.constraint_schema "
        # constraint names are unique PER TABLE in PG, not per schema:
        # without the table_name join two same-named PKs would
        # cross-contaminate each other's key lists (code-review r9)
        "AND kcu.table_name = tc.table_name "
        "WHERE tc.constraint_type = 'PRIMARY KEY' AND " + where
        + " ORDER BY tc.table_schema, tc.table_name, kcu.ordinal_position"
    )


def pg_replident_keys_sql(schema: str | None = None) -> str:
    """Unique replica-identity index columns per table, in index-key
    order — the reference's first PK fallback (``schema.go:318-380``:
    a PK-less table whose REPLICA IDENTITY is a unique index still has
    a usable shard/merge key). pg_catalog, not information_schema:
    ``indisreplident`` has no standard face."""
    where = (
        f"n.nspname NOT IN ({_in_list(PG_SYSTEM_SCHEMAS)})"
        if schema is None
        else f"n.nspname = {_lit(schema)}"
    )
    return (
        "SELECT n.nspname AS table_schema, c.relname AS table_name, "
        "a.attname AS column_name, k.ord AS ordinal_position "
        "FROM pg_index i "
        "JOIN pg_class c ON c.oid = i.indrelid "
        "JOIN pg_namespace n ON n.oid = c.relnamespace "
        "JOIN LATERAL unnest(i.indkey) WITH ORDINALITY k(attnum, ord) "
        "ON true "
        "JOIN pg_attribute a "
        "ON a.attrelid = c.oid AND a.attnum = k.attnum "
        "WHERE i.indisreplident AND i.indisunique AND " + where
        + " ORDER BY table_schema, table_name, k.ord"
    )


def pg_partition_parents_sql(schema: str | None = None) -> str:
    """child → partitioned parent map (``pg_inherits``) — the
    reference's second fallback (``schema.go:400-447``): a partition
    child with no key of its own inherits the parent's."""
    where = (
        f"cn.nspname NOT IN ({_in_list(PG_SYSTEM_SCHEMAS)})"
        if schema is None
        else f"cn.nspname = {_lit(schema)}"
    )
    return (
        "SELECT cn.nspname AS child_schema, c.relname AS child_name, "
        "pn.nspname AS parent_schema, p.relname AS parent_name "
        "FROM pg_inherits i "
        "JOIN pg_class c ON c.oid = i.inhrelid "
        "JOIN pg_namespace cn ON cn.oid = c.relnamespace "
        "JOIN pg_class p ON p.oid = i.inhparent "
        "JOIN pg_namespace pn ON pn.oid = p.relnamespace "
        "WHERE " + where
        + " ORDER BY child_schema, child_name"
    )


def mysql_columns_sql(database: str | None = None) -> str:
    """≈ ``mysql/schema.go:16-31`` columnList (base tables only; the
    reference orders by column NAME and re-sorts constraints first
    later — here ordinal order directly, since column order IS the
    wire-snapshot row layout)."""
    extra = (
        f" AND c.table_schema = {_lit(database)}" if database else ""
    )
    return (
        "SELECT c.table_schema, c.table_name, c.column_name, "
        "c.ordinal_position, c.column_type "
        "FROM information_schema.columns c "
        "INNER JOIN information_schema.tables t "
        "ON c.table_schema = t.table_schema "
        "AND c.table_name = t.table_name "
        "AND t.table_type IN ('BASE TABLE')"
        + extra
        + " WHERE c.table_schema NOT IN "
        f"({_in_list(MYSQL_SYSTEM_SCHEMAS)})"
        " ORDER BY c.table_schema, c.table_name, c.ordinal_position"
    )


def mysql_constraints_sql(database: str | None = None) -> str:
    """≈ ``mysql/schema.go:36-60`` constraintList — PRIMARY sorts
    before any other unique constraint, then ordinal position; the
    fold (:func:`fold_constraints`) keeps the FIRST constraint per
    table."""
    extra = f" AND k.table_schema = {_lit(database)}" if database else ""
    return (
        "SELECT DISTINCT k.table_schema, k.table_name, k.column_name, "
        "k.ordinal_position, k.constraint_name "
        "FROM information_schema.key_column_usage k "
        "JOIN information_schema.table_constraints tc "
        "ON tc.constraint_schema = k.constraint_schema "
        "AND tc.constraint_name = k.constraint_name "
        "AND tc.table_name = k.table_name "
        # PRIMARY/UNIQUE only: key_column_usage also lists FOREIGN KEY
        # columns, which are not shard keys (code-review r9); the
        # constraint_name tiebreak makes the PK-less choice stable
        # across activations
        "WHERE tc.constraint_type IN ('PRIMARY KEY', 'UNIQUE') "
        "AND k.table_schema NOT IN "
        f"({_in_list(MYSQL_SYSTEM_SCHEMAS)})"
        + extra
        + " ORDER BY k.table_schema, k.table_name, "
        "k.constraint_name = 'PRIMARY' DESC, k.constraint_name, "
        "k.ordinal_position"
    )


# ------------------------------------------------------------ type matrices


def pg_type_to_yt(data_type: str) -> str:
    """PostgreSQL → YT scalar per the reference's published source
    matrix (``postgres/typesystem.go:10-33`` + typesystem.md): exact
    ints keep width, every other numeric (NUMERIC included) is double,
    BYTEA/BIT are bytes, texty scalars are utf8, and everything
    structured (arrays, json, ranges, hstore, inet, …) is ``any``."""
    t = data_type.strip().lower()
    if t in ("bigint", "int8"):
        return "int64"
    if t in ("integer", "int4", "int"):
        return "int32"
    if t in ("smallint", "int2"):
        return "int16"
    if t in ("numeric", "real", "double precision", "float4", "float8",
             "decimal"):
        return "double"
    if t in ("bytea", "bit", "bit varying") or t.startswith("bit("):
        return "string"  # YT string = bytes
    if t in (
        "text", "character varying", "varchar", "char", "name", "uuid",
        "money", "interval", "abstime",
        "time without time zone", "time with time zone", "time",
    ):
        return "utf8"
    if t == "boolean":
        return "boolean"
    if t == "date":
        return "date"
    if t in (
        "timestamp without time zone", "timestamp with time zone",
        "timestamp", "timestamptz",
    ):
        return "timestamp"
    # ARRAY, json(b), CHARACTER(N), ranges, hstore, citext, inet, cidr,
    # macaddr, oid, point, xml, USER-DEFINED, …
    return "any"


def mysql_type_to_yt(column_type: str) -> str:
    """MySQL ``column_type`` (e.g. ``int(11) unsigned``) → YT scalar,
    the reference's ``TypeToYt`` (``mysql/cast.go:146-194``): width by
    base type, unsigned bumps to the unsigned twin, every
    decimal/float is double, text family utf8, blob/binary/geometry
    bytes, json ``any``."""
    ct = column_type.strip().lower()
    base = ct.split("(", 1)[0].split(" ", 1)[0]
    unsigned = "unsigned" in ct
    if base == "tinyint":
        return "uint8" if unsigned else "int8"
    if base == "smallint":
        return "uint16" if unsigned else "int16"
    if base in ("int", "mediumint", "integer"):
        return "uint32" if unsigned else "int32"
    if base == "bigint":
        return "uint64" if unsigned else "int64"
    if base in ("decimal", "double", "float", "numeric", "real"):
        return "double"
    if base == "date":
        return "date"
    if base in ("datetime", "timestamp"):
        return "timestamp"
    if base in (
        "tinytext", "text", "mediumtext", "longtext", "varchar", "char",
        "time", "year", "enum", "set",
    ):
        return "utf8"
    if base in (
        "tinyblob", "blob", "mediumblob", "longblob", "binary",
        "varbinary", "bit", "geometry", "geomcollection", "point",
        "multipoint", "linestring", "multilinestring", "polygon",
        "multipolygon",
    ):
        return "string"
    if base == "json":
        return "any"
    return "string"  # the reference's default arm: bytes


def pg_type_to_spark(data_type: str) -> T.DataType:
    return yt_to_spark(pg_type_to_yt(data_type))


def mysql_type_to_spark(column_type: str) -> T.DataType:
    return yt_to_spark(mysql_type_to_yt(column_type))


# ------------------------------------------------------------------- folds


def fold_columns(
    rows: list[dict], type_to_spark
) -> dict[str, T.StructType]:
    """Catalog column rows (``table_schema``/``table_name``/
    ``column_name``/``ordinal_position`` + a type column already
    extracted into ``type``) → one StructType per ``schema.table``,
    fields in ordinal order."""
    tables: dict[str, list[tuple[int, T.StructField]]] = {}
    for r in rows:
        fqtn = f"{r['table_schema']}.{r['table_name']}"
        tables.setdefault(fqtn, []).append(
            (
                int(r["ordinal_position"]),
                T.StructField(
                    r["column_name"], type_to_spark(r["type"]), True
                ),
            )
        )
    return {
        fqtn: T.StructType([f for _, f in sorted(cols, key=lambda p: p[0])])
        for fqtn, cols in tables.items()
    }


def fold_constraints(rows: list[dict]) -> dict[str, list[str]]:
    """Constraint rows (already ordered PRIMARY-first, then ordinal)
    → the FIRST constraint's columns per table, in key order — the
    reference's fold (``mysql/schema.go:166-215``): the primary key
    when one exists, else the first unique constraint (a usable shard
    key either way)."""
    pk: dict[str, list[str]] = {}
    chosen: dict[str, str] = {}
    for r in rows:
        fqtn = f"{r['table_schema']}.{r['table_name']}"
        name = r.get("constraint_name") or ""
        if fqtn not in chosen:
            chosen[fqtn] = name
        if chosen[fqtn] != name:
            continue  # a later (lower-priority) constraint
        pk.setdefault(fqtn, []).append(r["column_name"])
    return pk


# ---------------------------------------------------------------- discovery


def resolve_pg_keys(
    pks: dict[str, list[str]],
    replident: dict[str, list[str]],
    parent_of: dict[str, str],
    fqtn: str,
    _seen: tuple = (),
) -> list[str]:
    """The reference's key resolution order (``schema.go:318-447``):
    plain PRIMARY KEY, else the unique replica-identity index, else the
    partitioned parent's key (itself resolved PK-then-replident —
    multi-level partition trees walk up)."""
    if fqtn in pks:
        return pks[fqtn]
    if fqtn in replident:
        return replident[fqtn]
    parent = parent_of.get(fqtn)
    if parent and parent not in _seen:
        return resolve_pg_keys(
            pks, replident, parent_of, parent, _seen + (fqtn,)
        )
    return []


def discover_pg_tables(
    session, schema: str | None = None
) -> dict[str, dict]:
    """TableList+TableSchema over a live ``PgWireSession``:
    ``{fqtn: {"schema": StructType, "pk": [cols]}}``. One round trip
    per catalog view — columns, PKs, replica-identity indexes,
    partition parents — the same reads the reference's extractor does
    (``schema.go`` ListTables → extractor → key fallbacks)."""
    cols = session.simple_query(pg_columns_sql(schema))
    keys = session.simple_query(pg_pkeys_sql(schema))
    ident = session.simple_query(pg_replident_keys_sql(schema))
    parents = session.simple_query(pg_partition_parents_sql(schema))
    structs = fold_columns(
        [{**r, "type": r["data_type"]} for r in cols], pg_type_to_spark
    )
    pks = fold_constraints(
        [{**r, "constraint_name": "PRIMARY KEY"} for r in keys]
    )
    replident = fold_constraints(
        [{**r, "constraint_name": "REPLICA IDENTITY"} for r in ident]
    )
    parent_of = {
        f"{r['child_schema']}.{r['child_name']}":
            f"{r['parent_schema']}.{r['parent_name']}"
        for r in parents
    }
    return {
        fqtn: {
            "schema": st,
            "pk": resolve_pg_keys(pks, replident, parent_of, fqtn),
        }
        for fqtn, st in structs.items()
    }


def discover_mysql_tables(
    session, database: str | None = None
) -> dict[str, dict]:
    """Same over a live ``MySqlWireSession`` (text-protocol result
    sets arrive as raw bytes; catalog identifiers are utf-8)."""
    def q(sql: str) -> list[dict]:
        names, rows = session.query_rows(sql)
        return [
            {
                n: (v.decode() if v is not None else None)
                for n, v in zip(names, row)
            }
            for row in rows
        ]

    cols = q(mysql_columns_sql(database))
    cons = q(mysql_constraints_sql(database))
    structs = fold_columns(
        [{**r, "type": r["column_type"]} for r in cols],
        mysql_type_to_spark,
    )
    pks = fold_constraints(cons)
    return {
        fqtn: {"schema": st, "pk": pks.get(fqtn, [])}
        for fqtn, st in structs.items()
    }
