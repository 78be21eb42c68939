"""Approximate-nearest-neighbor search over an embedding column.

- ``ann_brute_force`` — exact cosine top-k per query vector: the
  correctness baseline every ANN variant is measured against.
- ``ann_lsh_bucketed`` — sign-random-projection LSH: assign every
  vector a hyperplane-sign bucket, then search only within the query's
  bucket. The scale path: the bucket join shuffles on a small integer
  key instead of forming the full cross product.

Scale notes (100 TB): brute force is O(|Q|·N) dot products; with the
query side broadcast (small |Q|) it is shuffle-free — each executor
scans its partition of the corpus once and emits per-partition top-k
before the final k-merge (the window below collapses to that under
AQE + partial aggregation for small k). The LSH variant cuts the
scanned fraction to ~1/2^planes per query; recall is tuned by probing
multiple bucket tables (repeat with different plane seeds) — the
standard multi-probe trade-off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transferia_spark.functions.portable import (
    floor_bp,
    hyperplane_bucket,
    vec_dot,
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


@register
class AnnBruteForce(Transformer):
    """Exact top-k cosine neighbors for each query vector.

    Queries are the rows matching ``query_pred`` (e.g. ``vec_id < 8``);
    the query side is broadcast so the corpus never shuffles.
    """

    TYPE = "ann_brute_force"

    def __init__(self, vec_col: str, id_col: str, query_pred: str, k: int = 10):
        self.vec_col, self.id_col = vec_col, id_col
        self.query_pred, self.k = query_pred, k

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        base = df.select(
            F.col(self.id_col),
            F.col(self.vec_col),
            vec_dot(F.col(self.vec_col), F.col(self.vec_col)).alias("_n2"),
        )
        q = F.broadcast(
            base.filter(self.query_pred).select(
                F.col(self.id_col).alias("query_id"),
                F.col(self.vec_col).alias("_qv"),
                F.col("_n2").alias("_qn2"),
            )
        )
        c = base.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col).alias("_cv"),
            F.col("_n2").alias("_cn2"),
        )
        sim = vec_dot(F.col("_qv"), F.col("_cv")) / F.sqrt(
            F.col("_qn2") * F.col("_cn2")
        )
        pairs = (
            q.join(c, F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", floor_bp(sim).alias("sim_bp"))
        )
        return [(table, _topk(pairs, self.k))]


@register
class AnnLshBucketed(Transformer):
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
        self.vec_col, self.id_col = vec_col, id_col
        self.query_pred, self.dim = query_pred, dim
        self.n_planes, self.k = n_planes, k

    def bucketed(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.id_col),
            F.col(self.vec_col),
            vec_dot(F.col(self.vec_col), F.col(self.vec_col)).alias("_n2"),
            hyperplane_bucket(F.col(self.vec_col), self.n_planes, self.dim).alias(
                "bucket"
            ),
        )

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        base = self.bucketed(df)
        q = F.broadcast(
            base.filter(self.query_pred).select(
                F.col(self.id_col).alias("query_id"),
                F.col(self.vec_col).alias("_qv"),
                F.col("_n2").alias("_qn2"),
                "bucket",
            )
        )
        c = base.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col).alias("_cv"),
            F.col("_n2").alias("_cn2"),
            "bucket",
        )
        sim = vec_dot(F.col("_qv"), F.col("_cv")) / F.sqrt(
            F.col("_qn2") * F.col("_cn2")
        )
        pairs = (
            q.join(c, "bucket")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", floor_bp(sim).alias("sim_bp"))
        )
        return [(table, _topk(pairs, self.k))]


__all__ = ["AnnBruteForce", "AnnLshBucketed"]
