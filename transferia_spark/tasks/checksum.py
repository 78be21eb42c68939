"""Checksum / storage-compare verification task.

≈ ``pkg/worker/tasks/checksum.go:141,206`` (``Checksum``,
``CompareChecksum``) and ``tests/helpers/compare_storages.go:159`` in
transferia/transferia: after a transfer, verify source vs destination
by row count plus content comparison — full for small tables, sampled
(top/bottom/random via ``Sampleable``, ``abstract/storage.go:321-336``)
for large ones — with type-aware value comparators.

Spark formulation: one distributed aggregation per side —
- count: trivial agg;
- content hash: xxhash64 per row (over canonicalized column string
  values, column-order fixed) combined with a commutative aggregate
  (sum over hashes as unsigned) so the table hash is partition- and
  order-independent. No collect of table data to the driver.
- sample compare: deterministic top/bottom-k by key both sides.

At 100 TB each side is one scan + partial agg — the same cost profile
as the reference's checksum query pushed to the store.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# type-aware canonicalization before hashing (≈ comparator.go rules):
# floats are rounded to a tolerance grid, timestamps normalized to
# microseconds, binary hex-encoded — so physically-different-but-equal
# representations hash identically across stores.
FLOAT_DECIMALS = 9


def _canon(df: DataFrame, c: str) -> F.Column:
    dt = dict(df.dtypes)[c]
    col = F.col(c)
    if dt in ("float", "double"):
        out = F.format_number(col, FLOAT_DECIMALS)
    elif dt.startswith("decimal"):
        out = col.cast("string")
    elif dt in ("timestamp", "timestamp_ntz"):
        out = F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    elif dt == "binary":
        out = F.hex(col)
    else:
        out = col.cast("string")
    return F.coalesce(out, F.lit("\u2400null"))


@dataclass
class ChecksumReport:
    rows: int
    content_hash: int
    columns: list[str]
    samples: list[tuple] = field(default_factory=list)

    def matches(self, other: "ChecksumReport") -> list[str]:
        errs = []
        if self.columns != other.columns:
            errs.append(f"columns differ: {self.columns} vs {other.columns}")
            return errs
        if self.rows != other.rows:
            errs.append(f"row count differs: {self.rows} vs {other.rows}")
        if self.content_hash != other.content_hash:
            errs.append("content hash differs")
        if self.samples != other.samples:
            errs.append("sample rows differ")
        return errs


def checksum_table(
    df: DataFrame,
    columns: list[str] | None = None,
    sample_keys: list[str] | None = None,
    sample_k: int = 5,
) -> ChecksumReport:
    """Count + order-independent content hash (+ optional top/bottom-k
    sample rows by ``sample_keys``)."""
    cols = columns or df.columns
    canon = [_canon(df, c) for c in cols]
    row_hash = F.xxhash64(*canon)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        # sum of row hashes is commutative → partition/order independent;
        # decimal(38) accumulation never overflows (ANSI mode errors on
        # long wrap); reduce mod 2^64 at the end
        F.sum(row_hash.cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    samples: list[tuple] = []
    if sample_keys:
        # row_hash as the final sort key makes top/bottom-k selection
        # deterministic even when the sample keys are not unique
        top = df.orderBy(
            *[F.col(k).desc() for k in sample_keys], row_hash.desc()
        ).limit(sample_k)
        bottom = df.orderBy(
            *[F.col(k).asc() for k in sample_keys], row_hash.asc()
        ).limit(sample_k)
        for part in (bottom, top):
            samples.extend(
                tuple(str(v) for v in r) for r in part.select(*canon).collect()
            )
    return ChecksumReport(
        rows=agg["n"],
        content_hash=int(agg["h"]) % (1 << 64) if agg["h"] is not None else 0,
        columns=list(cols),
        samples=samples,
    )


def compare_tables(
    src: DataFrame,
    dst: DataFrame,
    columns: list[str] | None = None,
    sample_keys: list[str] | None = None,
) -> list[str]:
    """CompareStorages: return mismatch descriptions (empty = equal).

    ``columns`` defaults to the intersection in src order — the
    reference compares the common column set after transformers."""
    if columns is None:
        dst_cols = set(dst.columns)
        columns = [c for c in src.columns if c in dst_cols]
    a = checksum_table(src, columns, sample_keys)
    b = checksum_table(dst, columns, sample_keys)
    return a.matches(b)


def verify_transfer(spark, spec, tables: list[str] | None = None) -> dict[str, list[str]]:
    """Post-activation delivery verification (≈ ``tasks.VerifyDelivery``,
    ``pkg/worker/tasks/verify_delivery.go``, on top of CompareStorages):
    re-derive each output table from the source through the transformer
    chain and compare it against what the sink holds.

    Returns {output table fqtn: [mismatch descriptions]} — all-empty
    lists mean the transfer verified clean."""
    from transferia_spark.plans.transfer import _selected

    results: dict[str, list[str]] = {}
    for table in spec.src.table_list(spark):
        if not _selected(spec, table):
            continue
        if tables and table.fqtn() not in tables:
            continue
        df = spec.src.load_table(spark, table, where=spec.filters.get(table.fqtn()))
        routed = spec.transformation.apply_batch({table: df})
        if spec.type_system_version is not None:
            from transferia_spark.schema.typesystem import apply_fallbacks

            routed = {
                t: apply_fallbacks(d, spec.type_system_version)
                for t, d in routed.items()
            }
        for out_table, out_df in routed.items():
            dst_df = spec.dst.read_back(spark, out_table)
            # unlike cross-store CompareStorages (common-column
            # intersection), the derived frame here IS the expected
            # output — column sets must match exactly
            if set(out_df.columns) != set(dst_df.columns):
                results[out_table.fqtn()] = [
                    f"columns differ: {sorted(out_df.columns)}"
                    f" vs {sorted(dst_df.columns)}"
                ]
                continue
            results[out_table.fqtn()] = compare_tables(
                out_df, dst_df, columns=out_df.columns
            )
    return results
