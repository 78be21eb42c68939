"""Corpus-assembly operators: clustering, decontamination, quota caps,
deterministic shuffle, sequence packing, and the IVF ANN index."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from transferia_spark.operators import build


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


# ---------------------------------------------------------------- cluster


def test_dedup_cluster_components(spark):
    """Hand-built graph: {1,2,3} via chained pairs + {10,11} + isolated
    20 → labels are the component minima, keepers are the minima."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in [
            (1, "a b c d e f"), (2, "a b c d e f"), (3, "a b c d e g"),
            (10, "x y z w q r"), (11, "x y z w q r"),
            (20, "unrelated words only here now thing"),
        ]],
        "doc_id long, text string",
    )
    t = build("dedup_cluster", text_col="text", id_col="doc_id",
              n=3, k=32, bands=8)
    out = {r["doc_id"]: (r["cluster_id"], r["is_keeper"])
           for r in t.apply_df(docs).collect()}
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[10] == (10, True)
    assert out[11] == (10, False)
    assert out[20] == (20, True)
    # 3 links to 1 only through 2 (shares no shingle with 1's tail) —
    # transitivity must carry the label
    assert out[3][0] == 1


def test_cluster_pairs_long_chain_converges_multiround(spark):
    """A 9-vertex path graph has diameter 8, so min-label propagation
    needs many rounds — each round's labels frame is a LAZY
    localCheckpoint materialized by its own convergence-sum action (the
    r14 one-action-per-round shape), and later rounds must read the
    persisted frame, not recompute it. Every vertex must land on the
    global minimum."""
    from transferia_spark.operators.corpus import DedupCluster

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "id_a long, id_b long"
    )
    cl = DedupCluster("text", "doc_id")
    labels = {r["_id"]: r["_lbl"] for r in cl.cluster_pairs(pairs).collect()}
    assert labels == {i: 1 for i in range(1, 10)}


def test_dedup_cluster_full_corpus_is_partition(docs):
    out = build(
        "dedup_cluster", text_col="text", id_col="doc_id", n=3, k=32, bands=8
    ).apply_df(docs)
    n_docs = docs.count()
    assert out.count() == n_docs
    # every cluster id is a real doc id and is its own cluster's keeper
    bad = out.alias("a").join(
        out.alias("b"),
        (F.col("a.cluster_id") == F.col("b.doc_id")) & ~F.col("b.is_keeper"),
    )
    assert bad.count() == 0
    # labels never exceed member ids (min-label convergence)
    assert out.filter(F.col("cluster_id") > F.col("doc_id")).count() == 0


# ---------------------------------------------------------- decontaminate


def test_decontaminate_flags_overlap(spark):
    bench_text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [
            (0, bench_text),             # benchmark doc (0 % 5 == 0)
            (1, bench_text),             # full overlap → contaminated
            (2, "alpha beta gamma nope nope nope"),  # 1 shared 3-gram
            (3, "totally different words in this document"),
        ],
        "doc_id long, text string",
    )
    t = build("decontaminate", text_col="text", id_col="doc_id",
              n=3, bench_mod=5, min_overlap=2)
    out = {r["doc_id"]: (r["overlap_ngrams"], r["contaminated"])
           for r in t.apply_df(df).collect()}
    assert 0 not in out  # benchmark docs are excluded from the output
    assert out[1] == (4, True)
    assert out[2] == (1, False)
    assert out[3] == (0, False)


def test_loser_ids_equal_apply_nonkeeper_filter(spark):
    """r14 optimization: ``DedupCluster.loser_ids_df`` (the small
    complement computed straight from the converged labels, no corpus
    re-scan/join) selects exactly
    ``apply_df(df).filter(~is_keeper)`` — incl. docs too short to
    shingle and singletons, which must appear in NEITHER set."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in [
            (1, "a b c d e f"), (2, "a b c d e f"), (3, "a b c d e g"),
            (10, "x y z w q r"), (11, "x y z w q r"),
            (20, "lonely single document with unique words"),
            (30, "ab"),  # < n words: no shingles, never a vertex
        ]],
        "doc_id long, text string",
    )
    t = build("dedup_cluster", text_col="text", id_col="doc_id",
              n=3, k=16, bands=4)
    via_apply = {
        r["doc_id"]
        for r in t.apply_df(docs).filter(~F.col("is_keeper")).collect()
    }
    direct = {r["doc_id"] for r in t.loser_ids_df(docs).collect()}
    assert direct == via_apply and direct  # non-trivial loser set


def test_contaminated_ids_equal_apply_filter(spark):
    """r14 optimization: ``Decontaminate.contaminated_ids_df`` (overlap
    counts filtered directly, no corpus-wide left join) selects exactly
    ``apply_df(df).filter(contaminated)``; min_overlap < 1 is rejected
    (zero-overlap docs are absent from the overlap frame)."""
    bench_text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [
            (0, bench_text),
            (1, bench_text),
            (2, "alpha beta gamma nope nope nope"),
            (3, "totally different words in this document"),
            (4, "alpha beta gamma delta nope nope"),
        ],
        "doc_id long, text string",
    )
    t = build("decontaminate", text_col="text", id_col="doc_id",
              n=3, bench_mod=5, min_overlap=2)
    via_apply = {
        r["doc_id"]
        for r in t.apply_df(df).filter(F.col("contaminated")).collect()
    }
    direct = {r["doc_id"] for r in t.contaminated_ids_df(df).collect()}
    assert direct == via_apply and direct
    t0 = build("decontaminate", text_col="text", id_col="doc_id",
               n=3, bench_mod=5, min_overlap=0)
    with pytest.raises(ValueError, match="min_overlap"):
        t0.contaminated_ids_df(df)


def test_decontaminate_plan_broadcasts_benchmark(docs):
    out = build(
        "decontaminate", text_col="text", id_col="doc_id", n=3, bench_mod=97
    ).apply_df(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# -------------------------------------------------------------- quota cap


def test_quota_cap_bounds_and_determinism(docs):
    t = build("quota_cap", group_col="source", id_col="doc_id", cap=7, seed=3)
    out = t.apply_df(docs)
    per = out.groupBy("source").count().collect()
    assert all(r["count"] <= 7 for r in per)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in t.apply_df(docs).collect())
    assert a == b  # hash priority, not rand(): stable across runs


# --------------------------------------------------------- global shuffle


def test_global_shuffle_dense_positions(docs):
    out = build("global_shuffle", id_col="doc_id", n_shards=4, seed=9).apply_df(docs)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    per = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    ).collect()
    for r in per:
        assert (r["mn"], r["mx"]) == (1, r["n"])  # dense 1..n per shard
    # different seed ⇒ different order (sanity that seed matters)
    out2 = build("global_shuffle", id_col="doc_id", n_shards=4, seed=10).apply_df(docs)
    j = out.join(out2, "doc_id")
    assert j.filter(out["shard"] != out2["shard"]).count() > 0


def test_derived_shard_count_scales_with_input(docs):
    """n_shards defaults to input-size / target bytes (r3 verdict §4):
    shrinking the per-shard byte target on the same input must raise the
    derived shard count proportionally, and the operators must honor it."""
    from transferia_spark.operators.corpus import derive_n_shards

    base = derive_n_shards(docs, target_bytes=1 << 40)
    assert base == 1  # sf0.001 docs ≪ 1 TB
    size = int(docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    quarter = derive_n_shards(docs, target_bytes=max(1, size // 4))
    assert 4 <= quarter <= 5  # ceil division: ~4 shards at a quarter-size target
    # 10x smaller target → ~10x more shards (input held constant ≡
    # target held constant with 10x more input)
    tenth = derive_n_shards(docs, target_bytes=max(1, size // 40))
    assert tenth >= 2 * quarter
    # operators honor the derived count end-to-end
    out = build(
        "global_shuffle", id_col="doc_id", seed=9,
        target_shard_bytes=max(1, size // 4),
    ).apply_df(docs)
    n_used = out.select("shard").distinct().count()
    assert 1 < n_used <= quarter


# --------------------------------------------------------- pack sequences


def test_pack_sequences_bins_are_contiguous_budget_chunks(docs):
    budget = 256
    out = build(
        "pack_sequences", text_col="text", id_col="doc_id",
        budget=budget, n_shards=4, seed=1,
    ).apply_df(docs)
    assert out.count() == docs.count()
    # bin_offset is the token offset where the doc starts inside its
    # bin: always within [0, budget)
    assert out.filter(
        (F.col("bin_offset") < 0) | (F.col("bin_offset") >= budget)
    ).count() == 0
    # per (shard, bin): tokens before each doc reconstruct the cut —
    # the bin index times budget plus the offset is the global prefix
    chk = out.withColumn(
        "prefix", F.col("bin") * budget + F.col("bin_offset")
    )
    w = chk.groupBy("shard").agg(
        F.sum("n_tok").alias("tot"), F.max(F.col("prefix") + F.col("n_tok")).alias("hi")
    )
    for r in w.collect():
        assert r["hi"] == r["tot"]  # last doc's end == shard token total


# ------------------------------------------------------------------- ivf


def test_ann_ivf_matches_brute_force_in_probed_cells(emb):
    """IVF results are exact within probed cells: every reported
    neighbor's sim_bp equals the brute-force sim for that pair, ranks
    are 1..k, and recall vs brute force is sane (>0)."""
    ivf = build(
        "ann_ivf", vec_col="embedding", id_col="vec_id",
        query_pred="vec_id < 4", centroid_stride=16, nprobe=2, k=5,
    ).apply_df(emb)
    bf = build(
        "ann_brute_force", vec_col="embedding", id_col="vec_id",
        query_pred="vec_id < 4", k=1000000,
    ).apply_df(emb)
    j = ivf.alias("i").join(
        bf.alias("b"),
        (F.col("i.query_id") == F.col("b.query_id"))
        & (F.col("i.neighbor_id") == F.col("b.neighbor_id")),
        "left",
    )
    assert j.filter(F.col("b.sim_bp").isNull()).count() == 0
    assert j.filter(F.col("i.sim_bp") != F.col("b.sim_bp")).count() == 0
    ranks = ivf.groupBy("query_id").agg(F.max("rank").alias("mx")).collect()
    assert all(r["mx"] <= 5 for r in ranks)


def test_ann_ivf_assignment_is_shuffle_free(emb):
    """Cell assignment is a map over the corpus (Arrow kernel with the
    broadcast centroid index) — no Exchange anywhere in the plan."""
    op = build(
        "ann_ivf", vec_col="embedding", id_col="vec_id",
        query_pred="vec_id < 4", centroid_stride=16, nprobe=2, k=5,
    )
    plan = op.assigned(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_ann_multiprobe_recall_at_least_single_probe(emb):
    """Margin-ordered multi-probe may only ADD candidate buckets for a
    query, so its top-k overlap with the exact answer is >= the
    single-probe overlap."""
    def topk(probes):
        return build(
            "ann_lsh_bucketed", vec_col="embedding", id_col="vec_id",
            query_pred="vec_id < 4", dim=64, n_planes=6, k=10, probes=probes,
        ).apply_df(emb)

    bf = build(
        "ann_brute_force", vec_col="embedding", id_col="vec_id",
        query_pred="vec_id < 4", k=10,
    ).apply_df(emb)
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    one = {(r["query_id"], r["neighbor_id"]) for r in topk(1).collect()}
    three = {(r["query_id"], r["neighbor_id"]) for r in topk(3).collect()}
    assert len(three & truth) >= len(one & truth)
    assert len(three) >= len(one)  # more probes never shrink candidates


# -------------------------------------------------- kernel == spec


def _ann_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("probes", [1, 3])
def test_ann_lsh_kernel_bit_identical_to_catalyst(emb, probes):
    """The Arrow bucket/score kernels are an execution strategy, not a
    semantic: identical output to the interpreted Catalyst expressions
    (quantize → plane dots → bucket → exact cosine)."""
    def run(ak):
        return build(
            "ann_lsh_bucketed", vec_col="embedding", id_col="vec_id",
            query_pred="vec_id < 4", dim=64, n_planes=6, k=10,
            probes=probes, arrow_kernel=ak,
        ).apply_df(emb)

    assert _ann_rows(run(True)) == _ann_rows(run(False))


def test_ann_brute_force_kernel_bit_identical(emb):
    def run(ak):
        return build(
            "ann_brute_force", vec_col="embedding", id_col="vec_id",
            query_pred="vec_id < 4", k=10, arrow_kernel=ak,
        ).apply_df(emb)

    assert _ann_rows(run(True)) == _ann_rows(run(False))


def test_ann_lsh_bucket_assignment_shuffle_free(emb):
    """Corpus bucket assignment is one map-side kernel pass — no
    Exchange in the plan."""
    op = build(
        "ann_lsh_bucketed", vec_col="embedding", id_col="vec_id",
        query_pred="vec_id < 4", dim=64, n_planes=6, k=10, probes=3,
    )
    plan = op.bucketed(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


# -------------------------------------------------------------------- sq8


def test_ann_sq8_exact_simbp_and_full_rerank_matches_bruteforce(emb):
    """SQ8 reported sim_bp is the EXACT similarity (codes only pick
    candidates): every (query, neighbor) pair's sim_bp equals brute
    force's, and with rerank covering the whole corpus the top-k set
    is identical to brute force."""
    n = emb.count()
    sq = build(
        "ann_sq8", vec_col="embedding", id_col="vec_id",
        query_pred="vec_id < 4", k=5, rerank=(n // 5) + 1,
    ).apply_df(emb)
    bf = build(
        "ann_brute_force", vec_col="embedding", id_col="vec_id",
        query_pred="vec_id < 4", k=5,
    ).apply_df(emb)
    assert sorted(map(tuple, sq.collect())) == sorted(map(tuple, bf.collect()))

    # modest rerank: pairs may differ from brute-force top-k, but each
    # reported sim_bp must still be the exact pair similarity
    sq4 = build(
        "ann_sq8", vec_col="embedding", id_col="vec_id",
        query_pred="vec_id < 4", k=5, rerank=4,
    ).apply_df(emb)
    bf_all = build(
        "ann_brute_force", vec_col="embedding", id_col="vec_id",
        query_pred="vec_id < 4", k=10**6,
    ).apply_df(emb)
    j = sq4.alias("s").join(
        bf_all.alias("b"),
        (F.col("s.query_id") == F.col("b.query_id"))
        & (F.col("s.neighbor_id") == F.col("b.neighbor_id")),
        "left",
    )
    assert j.filter(F.col("b.sim_bp").isNull()).count() == 0
    assert j.filter(F.col("s.sim_bp") != F.col("b.sim_bp")).count() == 0


def test_ann_sq8_codes_bounds(emb):
    """Codes live in [0, 255]; a dimension's min maps to 0, its max to
    255; constant dimensions code to 0."""
    from transferia_spark.operators.similarity import AnnScalarQuant

    op = AnnScalarQuant(
        vec_col="embedding", id_col="vec_id", query_pred="vec_id < 4"
    )
    mns, mxs = op.dim_stats(emb)
    codes = emb.select(op.encode(mns, mxs).alias("c"))
    stats = codes.select(
        F.min(F.array_min("c")).alias("lo"), F.max(F.array_max("c")).alias("hi")
    ).collect()[0]
    assert stats["lo"] == 0 and stats["hi"] == 255

    spark = emb.sparkSession
    const = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [1.0, 7.0])], "vec_id long, embedding array<double>"
    )
    op2 = AnnScalarQuant(vec_col="embedding", id_col="vec_id", query_pred="vec_id < 2")
    mns2, mxs2 = op2.dim_stats(const)
    rows = {r["vec_id"]: list(r["c"]) for r in
            const.select("vec_id", op2.encode(mns2, mxs2).alias("c")).collect()}
    assert rows[1] == [0, 0] and rows[2] == [0, 255]  # constant dim -> 0


# ------------------------------------------------------------- keep-best


def test_dedup_keep_best_picks_highest_score(spark):
    """Cluster {1,2,3}: keeper is the highest-scoring member (not the
    min id); singleton keeps itself; ties break to the smaller id."""
    docs = spark.createDataFrame(
        [(i, t, s) for i, t, s in [
            (1, "a b c d e f", 10),
            (2, "a b c d e f", 99),   # same text, best score → keeper
            (3, "a b c d e g", 50),
            (20, "unrelated words only here now thing", 1),
            (30, "tied text one two three four five", 7),
            (31, "tied text one two three four five", 7),  # tie → min id
        ]],
        "doc_id long, text string, score long",
    )
    out = {r.doc_id: (r.cluster_id, r.score, r.is_keeper)
           for r in build(
               "dedup_keep_best", text_col="text", id_col="doc_id",
               score_col="score", n=3, k=32, bands=8,
           ).apply_df(docs).collect()}
    assert out[2] == (1, 99, True)
    assert out[1] == (1, 10, False) and out[3] == (1, 50, False)
    assert out[20] == (20, 1, True)
    assert out[30] == (30, 7, True) and out[31] == (30, 7, False)
    # dedup = filter(is_keeper): one survivor per cluster
    keepers = [k for k, v in out.items() if v[2]]
    assert sorted(keepers) == [2, 20, 30]
