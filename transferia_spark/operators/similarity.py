"""Approximate-nearest-neighbor search over an embedding column.

- ``ann_brute_force`` — exact cosine top-k per query vector: the
  correctness baseline every ANN variant is measured against.
- ``ann_lsh_bucketed`` — sign-random-projection LSH: assign every
  vector a hyperplane-sign bucket, then search only within the query's
  bucket. The scale path: the bucket join shuffles on a small integer
  key instead of forming the full cross product.

All similarity arithmetic uses quantized int64 embeddings
(``portable.quantize``): dot products are exact integers, so results
are independent of summation order / vectorization strategy, and the
DuckDB oracle matches bit-for-bit.

Scale notes (100 TB): brute force is O(|Q|·N) dot products; with the
query side broadcast (small |Q|) it is shuffle-free — each executor
scans its partition of the corpus once; the top-k window partitions by
query_id (|Q|·N rows shuffled, small for small |Q|; for large |Q| use
per-partition top-k + merge). The LSH variant cuts the scanned
fraction to ~1/2^planes per query; recall is tuned by probing several
plane seeds — the standard multi-probe trade-off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transferia_spark.functions.portable import (
    hyperplane_bucket,
    qcosine,
    qdot,
    quantize,
)
from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID


def _topk(pairs: DataFrame, k: int) -> DataFrame:
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim_bp").desc(), F.col("neighbor_id")
        )
    )
    return (
        pairs.withColumn("rank", rn)
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_bp")
    )


class _AnnBase(Transformer):
    def __init__(self, vec_col: str, id_col: str, query_pred: str, k: int = 10):
        self.vec_col, self.id_col = vec_col, id_col
        self.query_pred, self.k = query_pred, k

    def _quantized(self, df: DataFrame, extra=()) -> DataFrame:
        q = quantize(F.col(self.vec_col))
        return df.select(
            F.col(self.id_col),
            q.alias("_q"),
            qdot(q, q).alias("_n2"),
            *extra,
        )

    def _sim_bp(self):
        sim = qcosine(
            qdot(F.col("_qv"), F.col("_cv")), F.col("_qn2"), F.col("_cn2")
        )
        return F.floor(sim * F.lit(10000.0)).cast("long")


@register
class AnnBruteForce(_AnnBase):
    """Exact top-k cosine neighbors for each query vector.

    Queries are the rows matching ``query_pred`` (e.g. ``vec_id < 8``);
    the query side is broadcast so the corpus never shuffles.
    """

    TYPE = "ann_brute_force"

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        base = self._quantized(df)
        q = F.broadcast(
            base.filter(self.query_pred).select(
                F.col(self.id_col).alias("query_id"),
                F.col("_q").alias("_qv"),
                F.col("_n2").alias("_qn2"),
            )
        )
        c = base.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col("_q").alias("_cv"),
            F.col("_n2").alias("_cn2"),
        )
        pairs = (
            q.join(c, F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", self._sim_bp().alias("sim_bp"))
        )
        return [(table, _topk(pairs, self.k))]


@register
class AnnLshBucketed(_AnnBase):
    """LSH-bucketed ANN: candidates = corpus vectors in the query's
    hyperplane-sign bucket; rank candidates by exact cosine.

    With ``n_planes`` planes the corpus splits into ≤ 2^n_planes
    buckets; the candidate join keys on the bucket id (tiny shuffle)
    and the exact arithmetic runs only inside buckets.
    """

    TYPE = "ann_lsh_bucketed"

    def __init__(
        self,
        vec_col: str,
        id_col: str,
        query_pred: str,
        dim: int,
        n_planes: int = 6,
        k: int = 10,
    ):
        super().__init__(vec_col, id_col, query_pred, k)
        self.dim, self.n_planes = dim, n_planes

    def bucketed(self, df: DataFrame) -> DataFrame:
        base = self._quantized(df)
        return base.withColumn(
            "bucket", hyperplane_bucket(F.col("_q"), self.n_planes, self.dim)
        )

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        base = self.bucketed(df)
        q = F.broadcast(
            base.filter(self.query_pred).select(
                F.col(self.id_col).alias("query_id"),
                F.col("_q").alias("_qv"),
                F.col("_n2").alias("_qn2"),
                "bucket",
            )
        )
        c = base.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col("_q").alias("_cv"),
            F.col("_n2").alias("_cn2"),
            "bucket",
        )
        pairs = (
            q.join(c, "bucket")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", self._sim_bp().alias("sim_bp"))
        )
        return [(table, pairs.transform(lambda d: _topk(d, self.k)))]


__all__ = ["AnnBruteForce", "AnnLshBucketed"]
