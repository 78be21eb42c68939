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

from pyspark.sql import Column, DataFrame, Window
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
    """Shared ANN scaffolding.

    ``query_pred`` must reference INPUT columns only (the id/vector
    columns of the frame passed to ``apply``): since r14 it is applied
    to the raw input — so parquet predicate pushdown prunes the scan to
    the query rows — not to the derived quantized/bucketed frame, and a
    predicate naming derived columns (``bucket``, ``_q``, ``_n2``)
    no longer resolves (ADVICE r14)."""

    def __init__(
        self,
        vec_col: str,
        id_col: str,
        query_pred: str,
        k: int = 10,
        arrow_kernel: bool = True,
    ):
        self.vec_col, self.id_col = vec_col, id_col
        self.query_pred, self.k = query_pred, k
        self.arrow_kernel = arrow_kernel

    def _quantized(self, df: DataFrame, extra=()) -> DataFrame:
        q = quantize(F.col(self.vec_col))
        return df.select(
            F.col(self.id_col),
            q.alias("_q"),
            qdot(q, q).alias("_n2"),
            *extra,
        )

    def _queries(self, df: DataFrame) -> DataFrame:
        """The query rows: ``query_pred`` applied to the INPUT frame.

        ``query_pred`` selects which input rows are queries (an
        id/vector predicate), so it filters BEFORE the quantize/bucket
        pass — parquet predicate pushdown prunes the scan to the query
        rows. Filtering the derived frame instead (the pre-r14 shape)
        recomputed the whole corpus kernel pass behind the query
        branch's broadcast, because BroadcastExchange defeats
        ReusedExchange — one full extra corpus scan per query set."""
        return df.filter(self.query_pred)

    def _sim_bp(self):
        sim = qcosine(
            qdot(F.col("_qv"), F.col("_cv")), F.col("_qn2"), F.col("_cn2")
        )
        return F.floor(sim * F.lit(10000.0)).cast("long")

    def _score_pairs(self, pairs: DataFrame) -> DataFrame:
        """(query_id, neighbor_id, sim_bp) from candidate pairs carrying
        both quantized vectors.

        Kernel path (default): Arrow-batched numpy row-wise dot — a
        narrow map over the join output, no extra shuffle. Exactness:
        the int64 einsum is exact (<2^63 by the quantization bound);
        casting that integer to float64 rounds identically to
        Catalyst's ``CAST(dot AS DOUBLE)``, and the remaining ops
        (÷, sqrt, ×10⁴, floor) are single IEEE ops on identical inputs.
        When all products stay < 2^53 the f64 einsum is itself exact
        and ~3× faster — runtime-checked per batch, same integers
        either way. The interpreted Catalyst fold (``_sim_bp``) is the
        executable spec: ~300 µs/pair vs ~0.5 µs/pair measured at
        64 dims — the difference between a plan that survives 10^9
        candidate pairs and one that doesn't.
        """
        sel = pairs.select(
            "query_id", "neighbor_id", "_qv", "_qn2", "_cv", "_cn2"
        )
        if not self.arrow_kernel:
            return sel.select(
                "query_id", "neighbor_id", self._sim_bp().alias("sim_bp")
            )
        import numpy as np

        import pandas as pd

        def kernel(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                a = np.array(list(pdf["_qv"]), dtype=np.int64)
                b = np.array(list(pdf["_cv"]), dtype=np.int64)
                dim = a.shape[1]
                lim = int((2**53 / dim) ** 0.5)
                if max(np.abs(a).max(initial=0), np.abs(b).max(initial=0)) <= lim:
                    dot = np.einsum(
                        "ij,ij->i", a.astype(np.float64), b.astype(np.float64)
                    )
                else:
                    dot = np.einsum("ij,ij->i", a, b).astype(np.float64)
                den = np.sqrt(
                    pdf["_qn2"].to_numpy(dtype=np.float64)
                    * pdf["_cn2"].to_numpy(dtype=np.float64)
                )
                # zero-norm (all-zero-quantized) vector: Catalyst's
                # double division yields NULL on /0 — mirror it with a
                # masked nullable Int64, not numpy's undefined inf→int
                # cast
                ok = den != 0.0
                bp = np.zeros(len(den), dtype=np.int64)
                np.floor(
                    np.divide(dot, den, out=np.zeros_like(dot), where=ok)
                    * 10000.0,
                    out=dot,
                )
                bp[ok] = dot[ok].astype(np.int64)
                out = pdf[["query_id", "neighbor_id"]].copy()
                out["sim_bp"] = pd.arrays.IntegerArray(bp, mask=~ok)
                yield out

        return sel.mapInPandas(
            kernel, "query_id long, neighbor_id long, sim_bp long"
        )


@register
class AnnBruteForce(_AnnBase):
    """Exact top-k cosine neighbors for each query vector.

    Queries are the rows matching ``query_pred`` (e.g. ``vec_id < 8``);
    the query side is broadcast so the corpus never shuffles.
    """

    TYPE = "ann_brute_force"

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        # query side from the PRE-FILTERED input (see _queries): the
        # corpus-wide quantize pass runs once, on the candidate side
        q = F.broadcast(
            self._quantized(self._queries(df)).select(
                F.col(self.id_col).alias("query_id"),
                F.col("_q").alias("_qv"),
                F.col("_n2").alias("_qn2"),
            )
        )
        c = self._quantized(df).select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col("_q").alias("_cv"),
            F.col("_n2").alias("_cn2"),
        )
        pairs = self._score_pairs(
            q.join(c, F.col("query_id") != F.col("neighbor_id"))
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
        probes: int = 1,
        arrow_kernel: bool = True,
    ):
        super().__init__(vec_col, id_col, query_pred, k, arrow_kernel)
        self.dim, self.n_planes = dim, n_planes
        self.probes = probes

    def bucketed(self, df: DataFrame) -> DataFrame:
        """(id, _q, _n2, bucket[, _dots]) — one map-side pass over the
        corpus, no shuffle.

        Kernel path (default): quantize + norm + all plane dots as one
        Arrow-batched numpy matmul per batch (exact: see
        ``_score_pairs``; plane components are ≤48, so products stay
        ≤ ~5·10⁹ and every sum < 2^53 — the f64 path is always exact
        here, checked anyway). The Catalyst expressions
        (``hyperplane_bucket``/``plane_dots``) remain the executable
        spec (``arrow_kernel=False``); tests assert bit-identity.
        Measured at 64 dims × 6 planes: ~300 µs/row interpreted vs
        ~1 µs/row kernel — the map-side cost that dominates a 10^9-row
        corpus scan.
        """
        base = self._quantized(df)
        want_dots = self.probes > 1
        if not self.arrow_kernel:
            out = base.withColumn(
                "bucket", hyperplane_bucket(F.col("_q"), self.n_planes, self.dim)
            )
            if want_dots:
                from transferia_spark.functions.portable import plane_dots

                out = out.withColumn(
                    "_dots", plane_dots(F.col("_q"), self.n_planes, self.dim)
                )
            return out

        import numpy as np

        from transferia_spark.functions.portable import Q_SCALE, _plane

        planes = np.array(
            [_plane(q, self.dim) for q in range(self.n_planes)], dtype=np.int64
        )
        weights = (1 << np.arange(self.n_planes)).astype(np.int64)
        id_col, vec_col = self.id_col, self.vec_col

        def kernel(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.array(list(pdf[vec_col]), dtype=np.float64)
                q = np.floor(v * float(Q_SCALE)).astype(np.int64)
                dim = q.shape[1]
                lim = int((2**53 / dim) ** 0.5)
                if np.abs(q).max(initial=0) <= lim:
                    n2 = np.einsum("ij,ij->i", q.astype(np.float64), q.astype(np.float64)).astype(np.int64)
                    dots = np.matmul(q.astype(np.float64), planes.T.astype(np.float64)).astype(np.int64)
                else:
                    n2 = np.einsum("ij,ij->i", q, q)
                    dots = q @ planes.T
                bucket = ((dots > 0) @ weights).astype(np.int64)
                out = {
                    id_col: pdf[id_col],
                    "_q": list(q),
                    "_n2": n2,
                    "bucket": bucket,
                }
                if want_dots:
                    out["_dots"] = list(dots)
                import pandas as pd

                yield pd.DataFrame(out)

        schema = f"{id_col} long, _q array<long>, _n2 long, bucket long"
        if want_dots:
            schema += ", _dots array<long>"
        return df.select(id_col, vec_col).mapInPandas(kernel, schema)

    def _query_probes(self, qbase: DataFrame) -> DataFrame:
        """Multi-probe expansion of the (tiny) query side: beyond its
        own bucket, each query probes the buckets reached by flipping
        the ``probes-1`` planes it sits CLOSEST to (smallest |dot| —
        the standard margin-ordered multi-probe of Lv et al., VLDB'07:
        a near-boundary plane is the likeliest sign error). The corpus
        never expands — each corpus vector stays in exactly one bucket,
        so probe buckets being distinct means no candidate dedup pass.

        ``qbase`` is ``bucketed`` over the PRE-FILTERED query rows
        (see ``_queries``) — filtering the corpus-wide frame here
        recomputed the whole bucket kernel behind this branch's
        broadcast (r14)."""
        if self.probes <= 1:
            return qbase.select(
                F.col(self.id_col).alias("query_id"),
                F.col("_q").alias("_qv"),
                F.col("_n2").alias("_qn2"),
                "bucket",
            )
        # probes > 1: `bucketed` emitted the per-plane dots (`_dots`)
        # in the same map-side pass
        q = qbase.select(
            F.col(self.id_col).alias("query_id"),
            F.col("_q").alias("_qv"),
            F.col("_n2").alias("_qn2"),
            "bucket",
            "_dots",
        )
        flip_rn = F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.abs(F.col("_dot")).asc(), F.col("_plane").asc()
            )
        )
        flips = (
            q.select(
                "query_id", "_qv", "_qn2", "bucket",
                F.posexplode("_dots").alias("_plane", "_dot"),
            )
            .withColumn("_rn", flip_rn)
            .filter(F.col("_rn") <= self.probes - 1)
            .select(
                "query_id", "_qv", "_qn2",
                F.col("bucket")
                .bitwiseXOR(F.expr("shiftleft(CAST(1 AS BIGINT), _plane)"))
                .alias("bucket"),
            )
        )
        return q.drop("_dots").unionByName(flips)

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        base = self.bucketed(df)
        q = F.broadcast(self._query_probes(self.bucketed(self._queries(df))))
        c = base.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col("_q").alias("_cv"),
            F.col("_n2").alias("_cn2"),
            "bucket",
        )
        pairs = self._score_pairs(
            q.join(c, "bucket").filter(
                F.col("query_id") != F.col("neighbor_id")
            )
        )
        return [(table, pairs.transform(lambda d: _topk(d, self.k)))]


@register
class AnnIVF(_AnnBase):
    """IVF-style ANN: partition the corpus into inverted lists by
    nearest centroid, probe the query's ``nprobe`` closest lists, rank
    candidates by exact cosine.

    Centroids are every ``centroid_stride``-th vector (deterministic
    seeding — production IVF would k-means these; the index/search
    machinery is identical). Assignment is argmax cosine over the
    centroid set with ties to the smallest centroid id.

    Scale shape (the part that matters at 10^9+ vectors):
    - The centroid table is aggregated into ONE array row and joined
      with a broadcast nested-loop — corpus cell assignment is a pure
      map-side fold (no shuffle, no driver collect; the fold iterates
      the centroid array in id order, so argmax tie-breaking is
      order-free).
    - Probing joins the (tiny, broadcast) query×probe-cell list against
      the corpus on the cell id — the corpus shuffles on a small int
      key at most once, and with AQE the skew of popular cells splits.
    - Each vector lives in exactly ONE cell, so no candidate dedup pass
      is needed (multi-probe never double-counts).
    """

    TYPE = "ann_ivf"

    def __init__(
        self,
        vec_col: str,
        id_col: str,
        query_pred: str,
        centroid_stride: int = 16,
        nprobe: int = 2,
        k: int = 10,
        arrow_kernel: bool = True,
    ):
        super().__init__(vec_col, id_col, query_pred, k, arrow_kernel)
        self.centroid_stride, self.nprobe = centroid_stride, nprobe

    @staticmethod
    def _cell_sims(cents: Column, qv: Column, qn2: Column) -> Column:
        """Array of (sim_bp, cid) structs for one vector vs every
        centroid — exact integer dots, one float div+sqrt each."""
        def one(c):
            dot = F.aggregate(
                F.zip_with(qv, c["_ce"], lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            bp = F.floor(
                dot.cast("double")
                / F.sqrt(qn2.cast("double") * c["_cn2"].cast("double"))
                * F.lit(10000.0)
            ).cast("long")
            return F.struct(bp.alias("bp"), c["_cid"].alias("cid"))

        return F.transform(cents, one)

    def _centroid_array(self, base: DataFrame) -> DataFrame:
        """One-row frame holding every (cid, vector, norm) struct,
        cid-ascending — the broadcastable index."""
        cents = base.filter(
            F.pmod(F.col(self.id_col), F.lit(self.centroid_stride)) == 0
        ).select(
            F.col(self.id_col).alias("_cid"),
            F.col("_q").alias("_ce"),
            F.col("_n2").alias("_cn2"),
        )
        return cents.agg(
            F.sort_array(
                F.collect_list(F.struct("_cid", "_ce", "_cn2"))
            ).alias("_cents")
        )

    def assigned(self, df: DataFrame, base: DataFrame | None = None, crow=None) -> DataFrame:
        """(id, _q, _n2, cell) — corpus cell assignment, shuffle-free.

        The coarse index (every centroid_stride-th vector ≈ √N rows —
        the same object FAISS ships as its coarse quantizer) is
        collected and broadcast; the corpus never moves. Per partition,
        an Arrow-batched numpy kernel computes the corpus×centroid
        block matmul: exact on these quantized ints (products and
        partial sums stay < 2^53, so float64 BLAS is bit-identical to
        int64 math — see dedup._cosine_pairs_block), and the argmax
        tie-break (smallest centroid id on equal sim) falls out of
        np.argmax's first-match rule over the cid-ascending matrix.
        An interpreted Catalyst fold over the centroid array computes
        the same thing ~10× slower (higher-order functions don't
        codegen) — measured, not guessed.
        """
        import numpy as np

        if base is None:
            base = self._quantized(df)
        if crow is None:
            crow = self._centroid_array(base).collect()[0]["_cents"]
        cid = np.array([r["_cid"] for r in crow], dtype=np.int64)
        cmat = np.array([r["_ce"] for r in crow], dtype=np.int64)
        cn2 = np.array([r["_cn2"] for r in crow], dtype=np.float64)
        dim = cmat.shape[1]
        exact_f64 = np.abs(cmat).max(initial=0) <= int((2**53 / dim) ** 0.5)

        def assign(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.array(list(pdf["_q"]), dtype=np.int64)
                if exact_f64 and np.abs(m).max(initial=0) <= int(
                    (2**53 / dim) ** 0.5
                ):
                    dots = np.matmul(
                        m.astype(np.float64), cmat.astype(np.float64).T
                    )
                else:  # exact int64 path for huge components
                    dots = (m @ cmat.T).astype(np.float64)
                n2 = pdf["_n2"].to_numpy(dtype=np.float64)
                sims = np.floor(
                    dots / np.sqrt(n2[:, None] * cn2[None, :]) * 10000.0
                )
                out = pdf[[c for c in pdf.columns]].copy()
                out["cell"] = cid[np.argmax(sims, axis=1)]
                yield out

        schema = f"{self.id_col} long, _q array<long>, _n2 long, cell long"
        return base.mapInPandas(assign, schema)

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        base = self._quantized(df)
        # materialize the coarse index ONCE (√N rows) and feed it to
        # both consumers: the collect for the assignment kernel and the
        # broadcast probe join — an earlier formulation ran the
        # centroid aggregation and the corpus quantization twice per
        # apply. The broadcast side reuses the CHECKPOINTED JVM frame
        # directly (r15): round-tripping the collected row through
        # createDataFrame built a Python-parallelized RDD whose
        # defaultParallelism slices each pulled a Python worker just to
        # deserialize one row — ~2 s of blocked wall per run at 32
        # cores, and still ~1.4 s with an explicit single slice
        # (stage-profiled r15).
        ca = self._centroid_array(base).localCheckpoint(eager=True)
        crow = ca.collect()[0]["_cents"]
        carr = ca
        asg = self.assigned(df, base=base, crow=crow)
        # query probe lists: nprobe best cells per query — the sims
        # array materializes only for rows passing query_pred (pushed
        # below the broadcast join, so this never scans the corpus)
        sims = self._cell_sims(F.col("_cents"), F.col("_q"), F.col("_n2"))
        probe_rn = F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("_pbp").desc(), F.col("_pcid").asc()
            )
        )
        probes = (
            # query rows from the PRE-FILTERED input (see _queries):
            # filtering `base` here re-ran the corpus-wide quantize
            # pass behind this branch's broadcast (r14)
            self._quantized(self._queries(df))
            .crossJoin(F.broadcast(carr))
            .select(
                F.col(self.id_col).alias("query_id"),
                F.col("_q").alias("_qv"),
                F.col("_n2").alias("_qn2"),
                F.explode(sims).alias("_s"),
            )
            .select(
                "query_id", "_qv", "_qn2",
                F.col("_s.bp").alias("_pbp"),
                F.col("_s.cid").alias("_pcid"),
            )
            .withColumn("_rn", probe_rn)
            .filter(F.col("_rn") <= self.nprobe)
            .select("query_id", "_qv", "_qn2", F.col("_pcid").alias("cell"))
        )
        cand = asg.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col("_q").alias("_cv"),
            F.col("_n2").alias("_cn2"),
            "cell",
        )
        pairs = self._score_pairs(
            F.broadcast(probes)
            .join(cand, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
        return [(table, _topk(pairs, self.k))]


@register
class AnnScalarQuant(_AnnBase):
    """Scalar-quantized (SQ8) ANN: per-dimension affine int8 codes +
    integer-cosine candidate pass + exact re-rank — the FAISS-SQ8 /
    compress-then-rerank shape.

    Stage 1 (compress): each dimension's global [min, max] maps values
    to 8-bit codes ``floor((x - mn) * 255 / (mx - mn))``. At 100 TB
    this is the point: the candidate pass scans a codes table ~8×
    narrower than float64/int64 vectors — scan bandwidth, shuffle
    width, and cache footprint all shrink accordingly (store as
    ``array<tinyint>``/``binary`` with a -128 offset; kept as ints in
    the plan for clarity). Dimension stats collect to the driver once
    (dim rows — bounded, like AnnIVF's √N centroid collect) and ride
    into the encode expression as literals.

    Stage 2 (candidate): integer cosine over the CODE vectors — exact
    int64 dots, so candidate ranking is vectorization-independent and
    cross-engine stable. Top ``rerank × k`` per query survive.

    Stage 3 (re-rank): survivors join back to the full-precision
    (Q_SCALE-quantized) vectors by id — an O(|Q|·rerank·k) join, tiny
    next to the corpus — and the final top-k ranks by exact cosine.
    Output ``sim_bp`` is therefore the EXACT similarity, as in
    ann_brute_force; the codes only choose candidates.
    """

    TYPE = "ann_sq8"

    def __init__(
        self,
        vec_col: str,
        id_col: str,
        query_pred: str,
        k: int = 10,
        rerank: int = 4,
        arrow_kernel: bool = True,
    ):
        super().__init__(vec_col, id_col, query_pred, k, arrow_kernel)
        self.rerank = rerank

    def dim_stats(self, df: DataFrame) -> tuple[list[float], list[float]]:
        """Per-dimension global [min, max] as driver-side lists (dim
        rows — the SQ 'training' pass; one aggregation over the corpus,
        map-side-combinable)."""
        rows = (
            df.select(F.posexplode(F.col(self.vec_col)).alias("pos", "x"))
            .groupBy("pos")
            .agg(
                F.min(F.col("x").cast("double")).alias("mn"),
                F.max(F.col("x").cast("double")).alias("mx"),
            )
            .orderBy("pos")
            .collect()
        )
        return [r["mn"] for r in rows], [r["mx"] for r in rows]

    def encode(self, mns: list[float], mxs: list[float]) -> Column:
        """int8-range code per dimension; a constant dimension
        (mx == mn) codes to 0."""
        mns_c = F.array(*[F.lit(float(v)) for v in mns])
        mxs_c = F.array(*[F.lit(float(v)) for v in mxs])

        def one(x, i):
            mn = F.element_at(mns_c, i + 1)
            mx = F.element_at(mxs_c, i + 1)
            return (
                F.when(
                    mx > mn,
                    F.floor(
                        (x.cast("double") - mn) * F.lit(255.0) / (mx - mn)
                    ).cast("long"),
                )
                .otherwise(F.lit(0).cast("long"))
            )

        return F.transform(F.col(self.vec_col), one)

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        mns, mxs = self.dim_stats(df)
        enc = self.encode(mns, mxs)
        qv = quantize(F.col(self.vec_col))
        base = df.select(
            F.col(self.id_col),
            enc.alias("_c"),
            qdot(enc, enc).alias("_cn2i"),
            qv.alias("_e"),
            qdot(qv, qv).alias("_en2"),
        ).localCheckpoint(eager=False)
        # ^ TRIPLE consumer (query broadcast, candidate side, exact
        # re-rank side) and two of them sit behind broadcasts, which
        # defeat ReusedExchange — without the checkpoint the per-dim
        # encode transform ran over the corpus three times (4 parquet
        # scans incl. dim_stats, verified in the plan; now 2). The
        # materialized frame is the codes + quantized vectors —
        # ~vector-sized, the artifact a real SQ8 index persists anyway
        # (r14; the _bucket_pairs trade).
        # candidate pass on codes: query side broadcast, corpus
        # scanned once (the narrow scan is the SQ8 payoff at scale)
        q = F.broadcast(
            base.filter(self.query_pred).select(
                F.col(self.id_col).alias("query_id"),
                F.col("_c").alias("_qv"),
                F.col("_cn2i").alias("_qn2"),
                F.col("_e").alias("_qe"),
                F.col("_en2").alias("_qen2"),
            )
        )
        c = base.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col("_c").alias("_cv"),
            F.col("_cn2i").alias("_cn2"),
        )
        csim = self._score_pairs(
            q.select("query_id", "_qv", "_qn2").join(
                c, F.col("query_id") != F.col("neighbor_id")
            )
        ).withColumnRenamed("sim_bp", "_csim")
        rr = F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("_csim").desc(), F.col("neighbor_id")
            )
        )
        survivors = csim.withColumn("_rr", rr).filter(
            F.col("_rr") <= self.rerank * self.k
        )
        # exact re-rank: survivors re-acquire both sides' full-precision
        # vectors (broadcast query side; id-join for the tiny neighbor set)
        exact_c = base.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col("_e").alias("_cv"),
            F.col("_en2").alias("_cn2"),
        )
        pairs = self._score_pairs(
            survivors.select("query_id", "neighbor_id")
            .join(
                q.select(
                    "query_id",
                    F.col("_qe").alias("_qv"),
                    F.col("_qen2").alias("_qn2"),
                ),
                "query_id",
            )
            .join(exact_c, "neighbor_id")
        )
        return [(table, _topk(pairs, self.k))]


__all__ = ["AnnBruteForce", "AnnLshBucketed", "AnnIVF", "AnnScalarQuant"]
