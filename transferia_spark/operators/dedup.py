"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (transferia has no dedup operator; its
closest relative is per-key CDC collapse,
``pkg/abstract/changeitem/change_item_collapse.go:48``), these are the
standard corpus-dedup family, each expressed as pure DataFrame ops so
Catalyst handles pushdown/pruning and AQE handles skew:

- ``dedup_exact``       — hash-window keeper selection (one shuffle,
                          map-side top-1 via WindowGroupLimit).
- ``dedup_minhash_lsh`` — shingle → minhash signature → banded LSH
                          bucket join → candidate pairs.
- ``dedup_simhash``     — 32-bit simhash + byte-banded hamming join.
- ``dedup_ngram_jaccard`` — exact n-gram Jaccard via shingle
                          inverted-index self-join.
- ``dedup_embedding_cosine`` — near-dup pairs by embedding cosine.

Scale notes (100 TB, 1000 executors):
- Signature/shingle/fingerprint computation is per-row Catalyst
  expression work (array folds over materialized word-hash arrays) —
  embarrassingly parallel, no Python, and ZERO shuffle: the corpus is
  read once and the first data movement is the bucket-key groupBy.
- The pair-generating joins shuffle on (band key | shingle | bucket).
  Degenerate keys (e.g. a boilerplate shingle shared by millions of
  docs) explode quadratically: every operator therefore caps bucket
  width (``max_bucket``) by dropping hotter-than-cap keys — the same
  fix Spark's own MinHashLSH recommends — making the join skew-safe.
- ``dedup_embedding_cosine`` brute-forces O(n²/2) pairs; at corpus
  scale, run it per LSH bucket (compose with ``ann_lsh_bucketed``) —
  the brute-force form here is the correctness baseline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferia_spark.functions.portable import (
    band_keys,
    block_hashes,
    cosine,
    minhash_signature_fold,
    quantize,
    shingle_hashes,
    word_hashes,
    words,
)
from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID

SIMHASH_BITS = 32


#: a kernel task on ~this many PLAN-STAT bytes outruns the shuffle that
#: would spread it. Re-calibrated END-TO-END (r14 opt round): the first
#: 4 MB figure priced only the vectorized numpy sweep (~0.1 s/MB), but
#: the single task also pays parquet decompression, the Catalyst
#: tokenizer, the Arrow round-trip and the downstream explode +
#: aggregation map side — measured 2–4 s per ~0.6 MB of plan-stat
#: bytes (stats are COMPRESSED scan bytes; the in-flight text is much
#: bigger), vs ~0.25 s for the repartition round-trip. Break-even is
#: therefore ~0.1 MB; 256 KB keeps a safety margin against pointless
#: exchanges on tiny inputs while a bench-scale corpus fans out 3+
#: ways (whole dedup/corpus query family measured 2–4× faster, every
#: rep of an alternating A/B ×3).
_PARALLELISM_CHUNK_BYTES = 256 << 10


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism — ONLY when
    the source provides fewer partitions (a tiny single-row-group
    parquet file yields one task, serializing the heavy per-row
    signature work) AND the input is big enough that the added exchange
    pays for itself: the target is ``min(defaultParallelism,
    ceil(plan-size / _PARALLELISM_CHUNK_BYTES))``, so a corpus-sized
    input still fans out to every core while a tiny one keeps its
    natural partitions (the chunk constant prices the FULL per-task
    stage — decompress, tokenize, Arrow round-trip, kernel, downstream
    map side — against the ~0.25 s exchange round-trip; see the
    constant's comment for the r14 re-calibration). At real corpus
    scale the scan has far
    more splits than cores and this is a no-op, so no shuffle is ever
    added where it would hurt."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        size = int(plan.stats().sizeInBytes())
        # Catalyst's join-size estimate MULTIPLIES the sides, so a
        # kernel input like `docs.join(scores)` reports GB-scale stats
        # over KB of physical text and fans the signature stage out to
        # every core (r15: 32 one-Python-round-trip tasks over 26 KB
        # each). Cap the estimate by the sum of LEAF scan sizes — the
        # bytes that physically exist; any leaf with sentinel/unknown
        # stats disables the cap (keeps the full-fan-out bias, which
        # is the right mistake for heavy per-row work at scale).
        leaves = plan.collectLeaves()
        leaf_sum = 0
        for i in range(leaves.size()):
            ls = int(leaves.apply(i).stats().sizeInBytes())
            if not 0 < ls < (1 << 60):
                leaf_sum = 0
                break
            leaf_sum += ls
        if 0 < leaf_sum < size:
            size = leaf_sum
    except Exception:
        size = 0
    if 0 < size < (1 << 60):
        # unknown stats (0 / Long.MaxValue sentinel) keep the full
        # fan-out — under-parallelizing heavy per-row work is the
        # costlier mistake at scale
        target = min(
            target, -(-size // _PARALLELISM_CHUNK_BYTES)
        )
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _flat_word_hashes(doc_words, np):
    """Per-word polynomial hashes for a batch of tokenized docs,
    vectorized across EVERY word of every doc: one flat codepoint
    array + ``np.add.reduceat`` per-word segments, no Python loop over
    words or chars. Returns ``(flat word-hash int64 array, per-doc
    word counts)``.

    Bit-identical to ``portable.pt_hash`` over ``words()`` tokens:
    the fold ((7·31+c₀)·31+c₁)… mod P equals
    (7·31^L + Σ cᵢ·31^(L-1-i)) mod P, and utf-32-le codepoints equal
    both Python ``ord`` and Spark ``ascii(split(s, ''))`` per char
    (verified incl. astral-plane chars; tokens are never empty — the
    one case where the two differ).  Overflow-safe: each term < P, so
    a segment sum stays < len·P < 2^63 for any real word length."""
    wcounts = np.fromiter(
        (len(d) for d in doc_words), np.int64, count=len(doc_words)
    )
    flat_words = [w for d in doc_words for w in d]
    wlens = np.fromiter(
        (len(w) for w in flat_words), np.int64, count=len(flat_words)
    )
    cps = np.frombuffer(
        "".join(flat_words).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    max_len = int(wlens.max()) if wlens.size else 0
    pow31 = np.empty(max_len + 1, dtype=np.int64)
    pow31[0] = 1
    for i in range(1, max_len + 1):
        pow31[i] = pow31[i - 1] * 31 % 1_000_000_007
    ends = np.cumsum(wlens)
    starts = ends - wlens
    expo = ends.repeat(wlens) - 1 - np.arange(cps.shape[0])
    terms = cps % 1_000_000_007 * pow31[expo] % 1_000_000_007
    sums = np.add.reduceat(terms, starts) if cps.size else terms
    wh = (pow31[wlens] * 7 + sums) % 1_000_000_007
    return wh, wcounts


def shingled_docs(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, _wh array, _sh array) per doc, entirely map-side.

    Shape matters at scale: hash each word ONCE into a materialized
    ``_wh`` array column, then fold n consecutive word hashes per
    shingle — every character is touched once, no shingle string is
    ever built, and (unlike the posexplode+window formulation) NO
    shuffle happens at all: shingling is a per-row Catalyst expression,
    so a 100 TB corpus computes signatures with zero data movement.
    ``_wh`` stays a real column (referenced ≥2 times) so CollapseProject
    cannot inline the tokenizer into the per-shingle lambda.

    Docs with fewer than ``n`` words are dropped (no shingles — cannot
    collide), matching the oracle's ``WHERE len(wh) >= n``.
    """
    # filter on the cheap token count BEFORE hashing: a filter on
    # size(_wh) would be predicate-pushed below the projection and
    # re-evaluate the per-character hash fold just for the predicate
    wh = ensure_parallelism(
        df.filter(F.size(words(F.col(text_col))) >= n)
    ).select(F.col(id_col), word_hashes(F.col(text_col)).alias("_wh"))
    return wh.select(
        F.col(id_col), F.col("_wh"), shingle_hashes(F.col("_wh"), n).alias("_sh")
    )


def _bucket_pairs(
    bucketed: DataFrame,
    key: str,
    payload_cols: list[str],
    max_bucket: int | None,
    distinct_input: bool = False,
) -> DataFrame:
    """All ordered (``_pa`` < ``_pb``) payload pairs sharing a bucket
    key: one ``groupBy(key).collect_set`` + intra-array expansion.

    Why not a self-join on the key: both join inputs are the SAME
    expensive pipeline (shingle → signature → band), and Spark computes
    it twice — the small side goes through a BroadcastExchange, which
    defeats ReusedExchange. Collecting each bucket once and expanding
    pairs from the array keeps exactly one pass over the corpus and one
    shuffle (on the bucket key; pair expansion is codegen'd array work).

    ``max_bucket`` is the skew guard: hotter-than-cap buckets (a
    boilerplate shingle shared by millions of docs) are dropped before
    the quadratic expansion — and (r4 verdict) before the
    ``collect_set`` ever sees them, in TWO passes:

    1. ``distinct()`` on (key, payload) — the exchange hashes on BOTH
       columns, so a degenerate key's rows spread across all reducers —
       then a map-side-combinable ``count`` per key finds hot keys (one
       long per key per partition, never an array).
    2. anti-join hot keys out, THEN ``collect_set``: the aggregation
       buffer is now bounded by ``max_bucket`` by construction. A key
       shared by 10⁸ docs at 100× scale costs pass 1 a counter, not a
       10⁸-element array in one reducer.

    The distinct projection is ``localCheckpoint``-ed (lazy) so the
    expensive upstream (shingle → signature → band) computes ONCE and
    both consumers read the materialized narrow (key, id) blocks —
    measured: without it Catalyst does NOT reuse the exchange and the
    signature kernel runs twice. Same trade dedup_cluster already
    makes: executor-local blocks, freed by the ContextCleaner when the
    plan is garbage-collected; an executor loss costs a recompute of
    the narrow projection, not of the corpus text.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols])
    if max_bucket is not None:
        proj = bucketed.select(F.col(key), payload.alias("_p"))
        if not distinct_input:
            proj = proj.distinct()
        # distinct_input=True (r15, §2.4 "a distinct on data that is
        # already unique"): callers whose (key, payload) rows are
        # distinct BY CONSTRUCTION (jaccard postings — one row per
        # (doc, distinct-shingle)) skip the distinct's full exchange;
        # the hot-key count below is map-side combinable either way,
        # and the collect_list buckets stay duplicate-free because the
        # input already is.
        proj = proj.localCheckpoint(eager=False)
        hot = (
            proj.groupBy(key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select(key)
        )
        cool = proj.join(hot, on=key, how="left_anti")
        # input is already distinct → collect_list (no per-buffer set
        # probing); sort_array keeps the deterministic pair order
        buckets = cool.groupBy(key).agg(
            F.sort_array(F.collect_list("_p")).alias("_ps")
        )
    else:
        buckets = bucketed.groupBy(key).agg(
            F.sort_array(F.collect_set(payload)).alias("_ps")
        )
    return (
        buckets.filter(F.size("_ps") >= 2)
        .select(F.col("_ps"), F.posexplode("_ps").alias("_i", "_pa"))
        # struct sort orders by the leading field (the id) → slicing
        # past _i yields exactly the _pa < _pb half-matrix
        .select(
            F.col("_pa"),
            F.explode(F.expr("slice(_ps, _i + 2, size(_ps))")).alias("_pb"),
        )
    )


@register
class DedupExact(Transformer):
    """Exact dedup: keep, per content hash of ``columns``, the row with
    the smallest ``id_col`` (deterministic keeper).

    Shape (r14): one ``row_number() over (partition by hash order by
    id)`` + ``filter(rn = 1)``. Spark's WindowGroupLimit pushes the
    top-1 below the exchange, so each scan task forwards at most one
    row per (hash, task) — the shuffle carries the already-thinned
    payload, once. The previous ``groupBy(hash).agg(min(id))`` +
    semi-join back on id read the input twice and, at 100 TB, turned
    the semi-join into a second full-payload shuffle (the keeper id
    set is ~the whole corpus — never broadcastable). The hash key
    distributes uniformly by design, so the window partition is skew-
    free.

    Assumes ``id_col`` is unique per row (as every id column here is —
    QuotaCap's deterministic priority hashing leans on the same
    property): with duplicate ids the old min(id)+semi-join kept every
    row carrying a keeper id, while the window keeps exactly one row
    per content hash (ADVICE r14).
    """

    TYPE = "dedup_exact"

    def __init__(self, columns: list[str], id_col: str):
        self.columns = columns
        self.id_col = id_col

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        from pyspark.sql import Window

        key = F.xxhash64(*[F.col(c) for c in self.columns])
        rn = F.row_number().over(
            Window.partitionBy("_content_hash").orderBy(
                F.col(self.id_col).asc()
            )
        )
        out = (
            df.withColumn("_content_hash", key)
            .withColumn("_rn", rn)
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_content_hash")
        )
        return [(table, out)]


@register
class DedupMinHashLSH(Transformer):
    """MinHash + banded LSH near-dup candidate pairs over a text column.

    Pipeline: words → word ``n``-shingles → portable polynomial hash per
    shingle → ``k``-perm minhash signature → ``bands``×``rows`` band
    keys → explode → self-join on band key. Docs with fewer than ``n``
    words have no shingles and are skipped (cannot collide).
    """

    TYPE = "dedup_minhash_lsh"

    def __init__(
        self,
        text_col: str,
        id_col: str,
        n: int = 3,
        k: int = 32,
        bands: int = 8,
        max_bucket: int | None = 1000,
        arrow_kernel: bool = True,
    ):
        assert k % bands == 0, "k must divide into equal bands"
        self.text_col, self.id_col = text_col, id_col
        self.n, self.k, self.bands = n, k, bands
        self.rows = k // bands
        self.max_bucket = max_bucket
        self.arrow_kernel = arrow_kernel

    def _signatures_fold(self, df: DataFrame) -> DataFrame:
        """Pure-Catalyst face: one left fold updating all k permutation
        minima per shingle (``minhash_signature_fold``) → band keys.
        Bit-identical to the Arrow kernel; kept as the executable
        specification and exercised against it in tests."""
        sh = shingled_docs(df, self.text_col, self.id_col, self.n)
        sigs = sh.select(
            F.col(self.id_col),
            minhash_signature_fold(F.col("_sh"), self.k).alias("_sig"),
        )
        # _sig is referenced `bands`× by band_keys → CollapseProject
        # keeps it materialized; the fold runs once per row
        return sigs.select(
            F.col(self.id_col),
            band_keys(F.col("_sig"), self.bands, self.rows).alias("_bands"),
        )

    def signatures(self, df: DataFrame) -> DataFrame:
        """(id, band-key array) per doc — ZERO shuffle.

        Tokenization stays in Catalyst (split/lower/filter); EVERYTHING
        per-character and per-shingle — word polynomial hashes, the
        n-word shingle fold, the k-perm minimum sweep and the band-key
        fold — runs as ONE Arrow-batched numpy kernel vectorized ACROSS
        the batch's documents (flat char/word/shingle arrays with
        ``np.add.reduceat``/``np.minimum.reduceat`` per-doc segments).
        Two earlier shapes this replaces, both measured slower: per-word
        hashing as an interpreted Catalyst HOF (per-char lambda eval, no
        codegen — it was ~half the signature wall-clock), and a per-doc
        Python loop inside the kernel (~100 µs/doc of interpreter
        overhead). All arithmetic is int64 mod P on values < 2^63, so
        the kernel is bit-identical to the Catalyst fold (asserted in
        tests, non-ASCII included).

        An earlier formulation exploded shingles to rows and ran k
        `min` aggregates — correct, but it paid a full shuffle of every
        (id, shingle) row for data already together in the source row.
        Minhash over the shingle *multiset* equals minhash over the
        set (min ignores duplicates), so no distinct pass is needed. At
        100 TB this stage reads the corpus once and emits one row per
        doc with no data movement at all.
        """
        if not self.arrow_kernel:
            return self._signatures_fold(df)
        import numpy as np

        # short-doc filter lives INSIDE the kernel (r15): as a Catalyst
        # `filter(size(words(text)) >= n)` it is pushed below the
        # ensure_parallelism Repartition (filters always are — verified
        # empirically), so the whole tokenizer ran pre-exchange in the
        # scan's (often single) task AND ran a second time in the
        # post-exchange projection. An alias-bearing Project is NOT
        # pushed below Repartition, so tokenizing once here and masking
        # short docs in numpy moves ALL per-doc work past the fan-out:
        # stage-profiled r15, the pre-exchange stage dropped from the
        # full tokenize (2.2 s CPU single-task cold at sf0.1) to a raw
        # text shuffle.
        wd = ensure_parallelism(df).select(
            F.col(self.id_col), words(F.col(self.text_col)).alias("_w")
        )
        id_col = self.id_col
        n, k, bands, rows = self.n, self.k, self.bands, self.rows
        P = 1_000_000_007
        A, B = 2_654_435_761, 40_503
        a = np.array([(i * A + 1) % P for i in range(k)], dtype=np.int64)
        b = np.array([(i * B + 17) % P for i in range(k)], dtype=np.int64)
        binit = np.array(
            [j * 1_000_003 + 13 for j in range(bands)], dtype=np.int64
        )
        band_rows = np.arange(bands) * rows

        def kernel(batches):
            import pandas as pd

            for pdf in batches:
                raw = list(pdf["_w"])
                keep = [i for i, d in enumerate(raw) if len(d) >= n]
                if not keep:
                    continue
                doc_words = [raw[i] for i in keep]
                ids = pdf[id_col].to_numpy()[keep]
                wh, wcounts = _flat_word_hashes(doc_words, np)
                # flat shingle starts: doc d's shingle i begins at word
                # dstart[d] + i (every doc has ≥ 1 shingle — the in-
                # kernel mask keeps only docs with ≥ n words)
                dstarts = np.cumsum(wcounts) - wcounts
                sc = wcounts - (n - 1)
                send = np.cumsum(sc)
                sstarts = send - sc
                base = np.repeat(dstarts - sstarts, sc) + np.arange(
                    int(send[-1])
                )
                sh = np.full(base.shape[0], 7, dtype=np.int64)
                for off in range(n):
                    sh = (sh * 31 + wh[base + off]) % P
                # k-perm minima per doc: one pass per permutation keeps
                # peak memory at O(|shingles|), not O(k·|shingles|)
                sig = np.empty((k, len(doc_words)), dtype=np.int64)
                for i in range(k):
                    sig[i] = np.minimum.reduceat(
                        (a[i] * sh % P + b[i]) % P, sstarts
                    )
                # band keys: band j folds sig[j·rows … j·rows+rows)
                acc = np.repeat(binit[:, None], len(doc_words), axis=1)
                for r in range(rows):
                    acc = (acc * 31 + sig[band_rows + r, :]) % P
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "_bands": [list(map(int, c)) for c in acc.T],
                    }
                )

        return wd.mapInPandas(kernel, f"{self.id_col} long, _bands array<long>")

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        # explode_OUTER, deliberately: plain explode triggers the
        # InferFiltersFromGenerate rule, which infers `size(_bands)>0`
        # and pushes it to the scan BY ALIAS SUBSTITUTION — duplicating
        # the whole signature pipeline into a per-row filter where the
        # word-hash array is re-evaluated per shingle (quadratic per
        # doc; observed 8× wall-clock). The rule skips outer generates,
        # and `_bands` is never empty here (docs are pre-filtered to
        # ≥ n words), so the rows are identical.
        bucketed = self.signatures(df).select(
            self.id_col, F.explode_outer("_bands").alias("_bk")
        )
        pairs = (
            _bucket_pairs(bucketed, "_bk", [self.id_col], self.max_bucket)
            .select(
                F.col(f"_pa.{self.id_col}").alias("id_a"),
                F.col(f"_pb.{self.id_col}").alias("id_b"),
            )
            .distinct()  # the same pair can collide in several bands
        )
        return [(table, pairs)]


@register
class DedupIncremental(Transformer):
    """Incremental near-dup candidates for an INGEST batch against an
    already-indexed corpus — the 100-TB ingest pattern: the persistent
    artifact is the banded signature index (one (id, band-key) row per
    band per document, ``band_index``), each ingest batch hashes ONLY
    its own documents and joins its band keys against the index. The
    old corpus text is never re-read, and the index grows by appending
    the batch's own ``band_index`` rows after the check.

    ``pairs_with_index(new_df, index)`` emits candidate pairs where at
    least one side is new: new↔old via an equi-join of the batch's
    bands against the index (the batch side is small relative to the
    index — AQE broadcasts it), new↔new via the same bucket expansion
    the full-corpus operator uses. ``is_cross`` marks new↔old pairs.
    New ids must be disjoint from indexed ids (an ingest batch is).

    The hot-key guard measures the COMBINED (index + batch) population
    of each band key, so a boilerplate shingle that only became hot
    across many ingests still gets dropped before any pair expansion.
    """

    TYPE = "dedup_incremental"

    def __init__(
        self,
        text_col: str,
        id_col: str,
        n: int = 3,
        k: int = 32,
        bands: int = 8,
        max_bucket: int | None = 1000,
    ):
        self.id_col = id_col
        self.max_bucket = max_bucket
        self.lsh = DedupMinHashLSH(
            text_col, id_col, n=n, k=k, bands=bands, max_bucket=max_bucket
        )

    def band_index(self, df: DataFrame) -> DataFrame:
        """(id, _bk) rows — the persistable index artifact (parquet it
        partitioned/bucketed by ``_bk`` for co-located ingest joins)."""
        return self.lsh.signatures(df).select(
            self.id_col, F.explode_outer("_bands").alias("_bk")
        )

    def pairs_with_index(self, new_df: DataFrame, index: DataFrame) -> DataFrame:
        return self.pairs_from_bands(
            self.band_index(new_df).localCheckpoint(eager=False), index
        )

    def pairs_from_bands(self, nb: DataFrame, index: DataFrame) -> DataFrame:
        """Candidate pairs from PRE-COMPUTED batch band rows ``nb`` —
        lets :class:`BandIndexStore` hash the ingest batch once and
        reuse the same rows for both the pair check and the index
        append. ``nb`` should be localCheckpoint-ed by the caller (it
        feeds several consumers; Catalyst does not reuse exchanges)."""
        idx = index
        if self.max_bucket is not None:
            hot = (
                nb.select("_bk")
                .unionByName(idx.select("_bk"))
                .groupBy("_bk")
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > self.max_bucket)
                .select("_bk")
            )
            # filtering the BATCH side alone suffices: the cross join is
            # an inner equi-join on _bk, so an index row with a hot key
            # matches nothing once nb dropped that key — the former
            # idx-side anti-join removed zero pairs and cost one extra
            # broadcast-anti pass over every index row (r14)
            nb = nb.join(hot, on="_bk", how="left_anti")
        n_id, o_id = F.col(f"n.{self.id_col}"), F.col(f"o.{self.id_col}")
        cross = (
            nb.alias("n")
            .join(idx.alias("o"), on="_bk")
            .select(
                F.least(n_id, o_id).alias("id_a"),
                F.greatest(n_id, o_id).alias("id_b"),
            )
            .withColumn("is_cross", F.lit(True))
        )
        within = (
            _bucket_pairs(nb, "_bk", [self.id_col], None)
            .select(
                F.col(f"_pa.{self.id_col}").alias("id_a"),
                F.col(f"_pb.{self.id_col}").alias("id_b"),
            )
            .withColumn("is_cross", F.lit(False))
        )
        return cross.unionByName(within).distinct()

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        raise NotImplementedError(
            "dedup_incremental needs the index side: call "
            "pairs_with_index(new_df, band_index(old_df)) — a chain "
            "transformer has no second input"
        )


class BandIndexStore:
    """On-disk lifecycle of the incremental-dedup band index (r5
    verdict item 7): at 100 TB the PERSISTED artifact is this (id, _bk)
    parquet directory, not the corpus text — each ingest re-reads the
    index, never the old documents.

    Layout: ``root/_v{N}/_shard=S/part-*.parquet`` with an atomically
    replaced ``_VERSION`` pointer (the repo's versioned-table pattern,
    tasks/compact.py). ``_shard = pmod(_bk, n_shards)`` hash-shards on
    the band key itself, so:

    - an ingest batch's index read prunes to the shard directories its
      OWN band keys land in (partition pruning — O(batch-touched
      shards), not O(index));
    - ``append`` lands a batch's rows in the same directories later
      batches will prune to;
    - ``compact`` folds the per-ingest small files shard-by-shard into
      a new version and swaps the pointer — append files never block
      readers.

    ``ingest`` materializes the pair check BEFORE appending the batch
    (a localCheckpoint), so a batch never pairs against itself through
    the index and a crash between check and append re-runs cleanly.

    ``retention`` versions stay on disk after a compact (deferred GC,
    the bucketed_table reader lease): a reader that resolved version
    ``v`` keeps scanning stable files while up to ``retention - 1``
    further compacts land. The shard count persists in ``_meta.json``
    and ALWAYS wins on reopen — ``_shard = pmod(_bk, n_shards)`` is
    part of the on-disk layout, so a different count would silently
    mis-prune ``read_for``; pass ``n_shards=None`` to derive it from
    the first appended batch's plan-size statistics.
    """

    def __init__(
        self,
        spark,
        root: str,
        n_shards: int | None = 64,
        retention: int = 2,
    ):
        self.spark = spark
        self.root = root
        self.n_shards = n_shards
        self.retention = max(1, retention)
        meta = self._load_meta()
        if meta is not None:
            self.n_shards = int(meta["n_shards"])

    def _load_meta(self) -> dict | None:
        try:
            with open(os.path.join(self.root, "_meta.json")) as f:
                import json

                return json.load(f)
        except FileNotFoundError:
            return None

    def _save_meta(self, data_schema=None) -> None:
        import json

        os.makedirs(self.root, exist_ok=True)
        meta: dict = {"n_shards": self.n_shards}
        if data_schema is not None:
            meta["schema"] = json.loads(data_schema.json())
        tmp = os.path.join(self.root, "_meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.root, "_meta.json"))

    def _ensure_shards(self, band_rows: DataFrame) -> None:
        if self.n_shards is None:
            from transferia_spark.operators.corpus import derive_n_shards

            # no floor above 1 (r15): the shard count is both the
            # append-write fan-out and the file count every later read
            # scans — a small store sharded 16+ ways pays 16+ task
            # commits per append and (because FilePartition's
            # maxSplitBytes shrinks as bytesPerCore with the core
            # count) one near-empty scan task per shard file at high
            # core counts, the exact §2.2 task-count-scales-with-
            # cluster failure the r14 driver measured (store row 3×
            # SLOWER at 32 cores than 8). derive_n_shards already
            # returns ~size/1 GB with a conservative 64 fallback for
            # unknown stats, so a corpus-scale index still fans wide.
            self.n_shards = min(
                derive_n_shards(band_rows, fallback=64), 65536
            )
        if self._load_meta() is None:
            self._save_meta(band_rows.schema)

    def _index_reader(self):
        """``spark.read`` with the persisted data schema when known —
        an explicit schema skips the per-open parquet footer inference
        job (one driver-side job per ingest read and per compact; at
        the 100 TB ingest cadence that is a job per batch for a schema
        that never changes). Stores written before the schema was
        persisted in ``_meta.json`` fall back to inference."""
        meta = self._load_meta() or {}
        if "schema" not in meta:
            return self.spark.read
        from pyspark.sql import types as T

        data = T.StructType.fromJson(meta["schema"])
        full = T.StructType(
            list(data.fields) + [T.StructField("_shard", T.LongType())]
        )
        return self.spark.read.schema(full)

    # -- versioned layout ----------------------------------------------
    def _version(self) -> int:
        try:
            with open(os.path.join(self.root, "_VERSION")) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def _vdir(self, v: int | None = None) -> str:
        return os.path.join(self.root, f"_v{v if v is not None else self._version()}")

    def _set_version(self, v: int) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = os.path.join(self.root, "_VERSION.tmp")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, os.path.join(self.root, "_VERSION"))

    def exists(self) -> bool:
        return os.path.isdir(self._vdir())

    def _sharded(self, band_rows: DataFrame) -> DataFrame:
        return band_rows.withColumn(
            "_shard", F.pmod(F.col("_bk"), F.lit(self.n_shards))
        )

    # -- lifecycle ------------------------------------------------------
    def append(self, band_rows: DataFrame) -> None:
        """Add a batch's (id, _bk) rows under their shard directories.

        Writers are ALIGNED with shards first: a dynamic partitionBy
        write from T input tasks emits up to T×n_shards files (measured
        5× slower at bench scale from file-commit overhead alone); one
        narrow (id, _bk) repartition makes it exactly one file per
        touched shard per append. Size ``n_shards`` to the corpus — it
        is both the pruning granularity and the append parallelism."""
        self._ensure_shards(band_rows)
        self._sharded(band_rows).repartition(self.n_shards, "_shard").write.mode(
            "append"
        ).partitionBy("_shard").parquet(self._vdir())

    def _snapshot(self) -> DataFrame:
        """The current version's index as a FILE-LIST read: the file
        set is resolved NOW, so later ``append``s to the same version
        directory cannot leak into this frame even if it is evaluated
        after them (r15 — what lets ``ingest`` return LAZY pairs).
        Compaction cannot invalidate the list either: it writes a NEW
        version directory and the ``retention`` lease keeps this one's
        files on disk. Listing cost is the same directory walk the
        directory-path read pays at planning time."""
        import glob as _glob

        paths = sorted(
            _glob.glob(os.path.join(self._vdir(), "_shard=*", "*.parquet"))
        )
        if not paths:
            # empty/missing version dir: same failure mode as before
            # (the directory read raises on a missing path)
            return self._index_reader().parquet(self._vdir())
        return (
            self._index_reader()
            .option("basePath", self._vdir())
            .parquet(*paths)
        )

    def read(self) -> DataFrame:
        return self._snapshot().drop("_shard")

    def read_for(self, batch_bands: DataFrame) -> DataFrame:
        """Index rows in the shards the batch's band keys touch — the
        pruned scan every ingest join should run against. The distinct
        shard collect is bounded by ``n_shards``, not data."""
        if self.n_shards == 1:
            # single-shard store: pruning cannot drop anything, so skip
            # the touched-shard job (one driver action per ingest that
            # computed the batch's whole band kernel just to learn the
            # answer is [0] — r15)
            return self.read()
        touched = sorted(
            r[0]
            for r in self._sharded(batch_bands)
            .select("_shard")
            .distinct()
            .collect()
        )
        df = self._snapshot()
        return df.filter(F.col("_shard").isin(touched)).drop("_shard")

    def ingest(self, dedup: DedupIncremental, new_df: DataFrame) -> DataFrame:
        """Check the batch against the persisted index, THEN append the
        batch's own band rows. Returns the candidate pairs (id_a, id_b,
        is_cross) as a LAZY localCheckpoint (r15): the index read is a
        file-list snapshot taken BEFORE the append, so deferring the
        pair computation to the caller's next action cannot see the
        batch's own rows — one driver action per ingest instead of two
        (§1.2), and several ingests' pair sets can materialize in ONE
        downstream job. Callers that interleave ``compact`` keep
        working through the retention lease (the snapshot's files stay
        on disk for ``retention`` more versions); a caller that crashes
        before consuming the pairs re-runs its batch against an index
        that already holds the batch's rows — the streaming sink's
        replay path resolves exactly that (diagonal filter +
        min(is_cross), see :class:`BandIndexIngestSink`)."""
        nb = dedup.band_index(new_df).localCheckpoint(eager=False)
        if self.exists():
            pairs = dedup.pairs_from_bands(nb, self.read_for(nb))
        else:
            empty = self.spark.createDataFrame(
                [], f"{dedup.id_col} long, _bk long"
            )
            pairs = dedup.pairs_from_bands(nb, empty)
        # lazy: the append below materializes nb's checkpoint (it
        # writes those rows), and the pairs plan reads the pre-append
        # file snapshot — the first consumer action computes the pairs
        # once, reusing nb's cached blocks
        pairs = pairs.localCheckpoint(eager=False)
        self.append(nb)
        return pairs

    def compact(self) -> int:
        """Fold append-accumulated small files into one file per shard
        in a NEW version directory, then swap the pointer — readers of
        the old version are never disturbed (tasks/compact.py pattern):
        the trailing ``retention`` version dirs stay on disk (deferred
        GC), so a reader holding version ``v``'s paths completes its
        scan even while up to ``retention - 1`` compacts land. Older
        versions GC after the swap. Returns the new version."""
        v = self._version()
        nxt = v + 1
        df = self._index_reader().parquet(self._vdir(v))
        # dropDuplicates: a crash-replayed ingest may have appended a
        # batch's band rows twice — harmless for pair recall (pairs are
        # distinct-ed) but it inflates bucket counts toward the hot-key
        # cutoff; compaction is the natural place to shed the duplicates.
        # Repartition FIRST: identical rows share a _shard (it is a
        # function of _bk), so HashPartitioning(_shard) already clusters
        # the dedup keys and the aggregate adds no second exchange —
        # distinct().repartition(...) shuffled the index twice, once on
        # (id,_bk,_shard) and again on _shard (r14, guide §2.4)
        df.repartition(self.n_shards, "_shard").dropDuplicates().write.mode(
            "overwrite"
        ).partitionBy("_shard").parquet(self._vdir(nxt))
        self._set_version(nxt)
        import shutil

        for old in range(nxt - self.retention, -1, -1):
            shutil.rmtree(self._vdir(old), ignore_errors=True)
        return nxt


class BandIndexIngestSink:
    """foreachBatch sink: STREAMING near-dup ingest over the persisted
    band index — the production shape where documents arrive as a
    Structured Streaming source and every micro-batch is checked
    against (then added to) the on-disk index.

    Each batch runs :meth:`BandIndexStore.ingest` (hash the batch only,
    pruned index read, pair check, append) and writes the batch's
    candidate pairs to ``pairs_dir`` as parquet tagged with the batch
    id — idempotent under micro-batch replay: a re-run of batch N
    OVERWRITES its own pairs output, and the index append is guarded by
    a single atomic high-watermark file (batch ids are monotone and
    Spark replays only the last uncommitted batch, so one watermark
    replaces the per-batch markers that grew without bound on a long
    stream — r6 verdict item 3).

    Compose with any documents stream::

        sink = BandIndexIngestSink(store, dedup, pairs_dir)
        stream.writeStream.foreachBatch(sink).start()
    """

    def __init__(
        self,
        store: BandIndexStore,
        dedup: DedupIncremental,
        pairs_dir: str,
        compact_every: int | None = None,
    ):
        self.store = store
        self.dedup = dedup
        self.pairs_dir = pairs_dir
        #: fold the index's per-batch append files every N batches — a
        #: long-running stream otherwise accretes one file per shard
        #: per batch and every later pruned read pays for it. The swap
        #: is versioned+atomic (readers of the old version undisturbed)
        self.compact_every = compact_every

    @property
    def _watermark_path(self) -> str:
        return os.path.join(self.store.root, "_INGESTED")

    def _watermark(self) -> int | None:
        """Highest batch id whose effects are fully on disk. A store
        written before the single-watermark scheme carries per-batch
        ``_ingested_batch_*.marker`` files instead — seed the watermark
        from their max on first open and delete them, so an upgraded
        mid-stream store neither re-appends the replayed batch's band
        rows nor keeps the stale markers forever (ADVICE r7)."""
        try:
            with open(self._watermark_path) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            pass
        try:
            names = os.listdir(self.store.root)
        except FileNotFoundError:
            return None  # store not materialized yet: nothing ingested
        legacy = [
            n
            for n in names
            if n.startswith("_ingested_batch_") and n.endswith(".marker")
        ]
        if not legacy:
            return None
        wm = max(
            int(n[len("_ingested_batch_"):-len(".marker")]) for n in legacy
        )
        self._advance_watermark(wm)
        for n in legacy:
            os.unlink(os.path.join(self.store.root, n))
        return wm

    def _advance_watermark(self, batch_id: int) -> None:
        tmp = self._watermark_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, self._watermark_path)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(self.pairs_dir, f"batch={batch_id}")
        wm = self._watermark()
        if wm is not None and batch_id <= wm:
            # replayed batch: the index already holds its band rows —
            # re-appending would self-pair every later batch against
            # duplicate rows. The pairs output is already on disk too
            # (written before the watermark advanced); nothing to do.
            return
        pairs = self.store.ingest(self.dedup, batch_df)
        # a crash between the index append and the marker re-runs the
        # batch with its own rows already indexed: the cross join then
        # pairs each doc with itself (filter the degenerate diagonal)
        # AND re-finds every within-batch pair via the index with
        # is_cross=True — a flag that only differs because of the
        # replay. Resolve per (id_a, id_b) with min(is_cross): on the
        # clean path each pair occurs once (batch and index ids are
        # disjoint), on the replay path the within-batch False wins —
        # so the replay loses nothing and fabricates nothing.
        pairs = (
            pairs.filter(F.col("id_a") != F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.min("is_cross").alias("is_cross"))
        )
        pairs.write.mode("overwrite").parquet(out)
        # watermark AFTER both effects: pairs overwrite is idempotent
        # and the replayed append only duplicates band rows
        # (recall-neutral after distinct), never loses a pair
        self._advance_watermark(batch_id)
        if (
            self.compact_every
            and (batch_id + 1) % self.compact_every == 0
        ):
            self.store.compact()

    def pairs(self, spark) -> DataFrame:
        """All pairs found so far, with their batch id."""
        return spark.read.option("basePath", self.pairs_dir).parquet(
            self.pairs_dir
        )


@register
class DedupSimHash(Transformer):
    """32-bit SimHash per document + hamming-distance near-dup pairs.

    ``fingerprints`` emits (id, simhash); ``apply`` emits pairs within
    ``max_hamming`` found via the 4×8-bit band trick (two fingerprints
    within hamming ≤ 3 of each other must agree on ≥1 of 4 bytes —
    pigeonhole), so the join key is a byte, never the full fingerprint.
    """

    TYPE = "dedup_simhash"

    def __init__(
        self,
        text_col: str,
        id_col: str,
        max_hamming: int = 3,
        max_bucket: int | None = 10000,
        arrow_kernel: bool = False,
    ):
        self.text_col, self.id_col = text_col, id_col
        self.max_hamming = max_hamming
        self.max_bucket = max_bucket
        self.arrow_kernel = arrow_kernel

    def fingerprints(self, df: DataFrame) -> DataFrame:
        """(id, simhash) — ZERO shuffle.

        Defaults to the Catalyst fold: unlike minhash (k×|shingles|
        work per doc), the 32-counter sweep is ~|words|×32 ops — small
        enough that the Python-boundary round trip of an Arrow kernel
        costs more than interpreted HOF eval (re-measured r14 with the
        rewritten across-docs kernel below: fold ~0.6-0.9 s vs kernel
        ~1.0-1.4 s at sf0.1 — the gap is the mapInPandas fixed cost,
        not the kernel, which since r14 is fully vectorized across
        documents and also absorbs the per-word char-fold hashing).
        The kernel stays available (``arrow_kernel=True``,
        bit-identical — asserted in tests) for wide-fingerprint
        variants where the arithmetic would dominate again."""
        if self.arrow_kernel:
            return self._fingerprints_kernel(df)
        return self._fingerprints_fold(df)

    def _fingerprints_kernel(self, df: DataFrame) -> DataFrame:
        import numpy as np

        # empty-doc filter inside the kernel — see
        # DedupMinHashLSH.signatures (r15): the Catalyst filter was
        # pushed below the fan-out exchange and serialized the
        # tokenizer into the scan task
        wd = ensure_parallelism(df).select(
            self.id_col, words(F.col(self.text_col)).alias("_w")
        )
        id_col = self.id_col

        def kernel(batches):
            import pandas as pd

            for pdf in batches:
                raw = list(pdf["_w"])
                keep = [i for i, d in enumerate(raw) if len(d) >= 1]
                if not keep:
                    continue
                doc_words = [raw[i] for i in keep]
                ids = pdf[id_col].to_numpy()[keep]
                wh, wcounts = _flat_word_hashes(doc_words, np)
                dstarts = np.cumsum(wcounts) - wcounts
                # bit j counter per doc: (+1 per word with bit set,
                # -1 else) = 2·popcount_j − n; positive ⇒ bit j set.
                # One reduceat pass per bit keeps memory O(|words|).
                fp = np.zeros(len(doc_words), dtype=np.int64)
                for j in range(SIMHASH_BITS):
                    ones = np.add.reduceat((wh >> j) & 1, dstarts)
                    fp |= ((2 * ones - wcounts) > 0).astype(np.int64) << j
                yield pd.DataFrame({id_col: ids, "simhash": fp})

        return wd.mapInPandas(kernel, f"{self.id_col} long, simhash long")

    def _fingerprints_fold(self, df: DataFrame) -> DataFrame:
        """Pure-Catalyst face: one left fold over the word-hash array
        updates all 32 signed bit counters per word (``zip_with``
        against a constant mask array); a second fold converts positive
        counters to bits. An earlier formulation exploded words to rows
        and ran 32 `sum` aggregates — a full shuffle of every
        (id, word) row for data already collocated in the source row.
        Zero-word docs are dropped (as the row formulation did
        implicitly).
        """
        masks = F.array(
            *[F.lit(1 << j).cast("long") for j in range(SIMHASH_BITS)]
        )
        zeros = F.array(
            *[F.lit(0).cast("long") for _ in range(SIMHASH_BITS)]
        )
        wh = ensure_parallelism(
            df.filter(F.size(words(F.col(self.text_col))) >= 1)
        ).select(self.id_col, word_hashes(F.col(self.text_col)).alias("_wh"))
        bit_sums = F.aggregate(
            F.col("_wh"),
            zeros,
            lambda acc, h: F.zip_with(
                acc,
                masks,
                lambda c, m: c
                + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
            ),
        )
        fp = F.aggregate(
            F.zip_with(
                bit_sums,
                masks,
                lambda s, m: F.when(s > 0, m).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        return wh.select(self.id_col, fp.alias("simhash"))

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        fps = self.fingerprints(df)
        # explode_outer: see DedupMinHashLSH.apply — keeps
        # InferFiltersFromGenerate from duplicating the fingerprint
        # expression into a pushed-down filter. The array is a fixed
        # 4-element band list, never empty.
        banded = fps.select(
            self.id_col,
            "simhash",
            F.explode_outer(
                F.array(
                    *[
                        (
                            F.shiftright(F.col("simhash"), 8 * q).bitwiseAND(F.lit(255))
                            + F.lit(q * 256)
                        ).cast("long")
                        for q in range(4)
                    ]
                )
            ).alias("_byte_band"),
        )
        pairs = (
            _bucket_pairs(
                banded, "_byte_band", [self.id_col, "simhash"], self.max_bucket
            )
            .select(
                F.col(f"_pa.{self.id_col}").alias("id_a"),
                F.col(f"_pb.{self.id_col}").alias("id_b"),
                F.bit_count(
                    F.col("_pa.simhash").bitwiseXOR(F.col("_pb.simhash"))
                ).alias("hamming"),
            )
            .filter(F.col("hamming") <= self.max_hamming)
            .distinct()
        )
        return [(table, pairs)]


@register
class DedupNgramJaccard(Transformer):
    """Exact n-gram Jaccard similarity pairs via an inverted-index
    self-join on distinct shingles.

    jaccard_bp = floor(10^4 · |A∩B| / |A∪B|) — integer output so the
    oracle compare is exact. ``min_bp`` filters the pair set.
    """

    TYPE = "dedup_ngram_jaccard"

    def __init__(
        self,
        text_col: str,
        id_col: str,
        n: int = 3,
        min_bp: int = 1000,
        max_bucket: int | None = 1000,
        arrow_kernel: bool = False,
    ):
        self.text_col, self.id_col = text_col, id_col
        self.n, self.min_bp = n, min_bp
        self.max_bucket = max_bucket
        self.arrow_kernel = arrow_kernel

    def _postings_fold(self, df: DataFrame) -> DataFrame:
        """Pure-Catalyst face: per-doc distinct shingle hashes via the
        interpreted HOF fold, exploded to (id, _sz, _s) posting rows.
        Kept as the executable specification; the kernel is asserted
        row-identical against it in tests."""
        shd = shingled_docs(df, self.text_col, self.id_col, self.n).select(
            self.id_col, F.array_distinct("_sh").alias("_shd")
        )
        # explode_outer: see DedupMinHashLSH.apply — a plain explode
        # makes InferFiltersFromGenerate duplicate the shingle pipeline
        # into a pushed-down filter. `_shd` is never empty (≥ n words).
        return shd.select(
            self.id_col,
            F.size("_shd").alias("_sz"),
            F.explode_outer("_shd").alias("_s"),
        )

    def _postings_kernel(self, df: DataFrame) -> DataFrame:
        """(id, _sz, _s) distinct-shingle posting rows via the
        Arrow-batched numpy kernel — measured and NOT made the default
        (r15, guide §1.3): unlike minhash (whose kernel replaced k=32
        interpreted permutation sweeps per shingle and won 2–4×), the
        jaccard fold only hashes each word once and folds each shingle
        once, and the kernel must ship the EXPLODED posting rows (one
        per (doc, distinct shingle) — ~300× the doc count) back across
        the Python boundary. A/B ×4 on a 4×-replicated sf0.1 corpus:
        kernel 10.3–16.9 s vs fold 1.9–2.3 s for the postings stage —
        the boundary rows cost more than the interpreted eval saves
        (§4.1: control how many bytes cross). Kept as an option and a
        cross-check (row-identity asserted in tests); a variant that
        returns per-doc ARRAYS would shrink the boundary but then
        reproduces the fold's explode anyway.

        Hash arithmetic is the same ``_flat_word_hashes`` + shingle
        fold the minhash kernel uses; per-doc distinct cannot disagree
        with ``array_distinct`` on identical values (posting ROW ORDER
        differs — downstream is unordered aggregation only)."""
        import numpy as np

        # short-doc filter inside the kernel — see
        # DedupMinHashLSH.signatures (r15)
        wd = ensure_parallelism(df).select(
            F.col(self.id_col), words(F.col(self.text_col)).alias("_w")
        )
        id_col, n = self.id_col, self.n
        P = 1_000_000_007

        def kernel(batches):
            import pandas as pd

            for pdf in batches:
                raw = list(pdf["_w"])
                keepi = [i for i, d in enumerate(raw) if len(d) >= n]
                if not keepi:
                    continue
                doc_words = [raw[i] for i in keepi]
                ids_all = pdf[id_col].to_numpy()[keepi]
                wh, wcounts = _flat_word_hashes(doc_words, np)
                dstarts = np.cumsum(wcounts) - wcounts
                sc = wcounts - (n - 1)
                send = np.cumsum(sc)
                sstarts = send - sc
                base = np.repeat(dstarts - sstarts, sc) + np.arange(
                    int(send[-1])
                )
                sh = np.full(base.shape[0], 7, dtype=np.int64)
                for off in range(n):
                    sh = (sh * 31 + wh[base + off]) % P
                # per-doc distinct: sort (doc, hash), keep run heads
                doc_of = np.repeat(
                    np.arange(len(doc_words), dtype=np.int64), sc
                )
                order = np.lexsort((sh, doc_of))
                ds, ss = doc_of[order], sh[order]
                keep = np.ones(ss.shape[0], dtype=bool)
                keep[1:] = (ds[1:] != ds[:-1]) | (ss[1:] != ss[:-1])
                ds, ss = ds[keep], ss[keep]
                sizes = np.bincount(ds, minlength=len(doc_words)).astype(
                    np.int64
                )
                yield pd.DataFrame(
                    {id_col: ids_all[ds], "_sz": sizes[ds], "_s": ss}
                )

        return wd.mapInPandas(kernel, f"{id_col} long, _sz long, _s long")

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        # set semantics via map-side per-doc distinct; the doc's shingle
        # count rides ALONG with every posting row (it is tiny and
        # functionally dependent on the id), so the union size needs no
        # separate sizes aggregation and no joins back — an earlier
        # formulation shuffled (id, shingle) rows for a distinct, a
        # groupBy for sizes, and TWO joins to attach them. The only
        # shuffles are the inverted-index bucket groupBy and the pair
        # count groupBy.
        postings = (
            self._postings_kernel(df)
            if self.arrow_kernel
            else self._postings_fold(df)
        )
        # length-ratio pruning (r15, guide §3.2): jaccard ≤ min/max of
        # the two distinct-shingle counts (inter ≤ min(a,b) and
        # union ≥ max(a,b)), so a pair with floor(10⁴·min/max) < min_bp
        # can never pass the final filter — drop it BEFORE the
        # pair-count shuffle. For integer min_bp,
        # floor(10⁴·min/max) ≥ min_bp ⟺ 10⁴·min ≥ min_bp·max:
        # exact, zero false drops.
        sza, szb = F.col("_pa._sz"), F.col("_pb._sz")
        ratio_ok = (
            F.least(sza, szb) * 10000
            >= F.lit(self.min_bp) * F.greatest(sza, szb)
        )
        # inverted index: per-shingle posting list → intra-list pairs;
        # each shared shingle contributes one row to the pair count
        out = (
            _bucket_pairs(
                postings, "_s", [self.id_col, "_sz"], self.max_bucket,
                # one (id, shingle) row per DISTINCT shingle per doc by
                # construction — the dedup exchange would be a no-op
                distinct_input=True,
            )
            .filter(ratio_ok)
            .groupBy(
                F.col(f"_pa.{self.id_col}").alias("id_a"),
                F.col(f"_pb.{self.id_col}").alias("id_b"),
                F.col("_pa._sz").alias("_sza"),
                F.col("_pb._sz").alias("_szb"),
            )
            .agg(F.count(F.lit(1)).alias("_inter"))
            .select(
                "id_a",
                "id_b",
                F.floor(
                    F.col("_inter")
                    * 10000
                    / (F.col("_sza") + F.col("_szb") - F.col("_inter"))
                )
                .cast("long")
                .alias("jaccard_bp"),
            )
            .filter(F.col("jaccard_bp") >= self.min_bp)
        )
        return [(table, out)]


def _cosine_pairs_block(ids_a, m_a, ids_b, m_b, min_bp, ordered_only):
    """Exact quantized-cosine pairs between two int64 blocks.

    Returns (id_a, id_b, sim_bp) arrays for every cross pair with
    ``sim_bp >= min_bp``; with ``ordered_only`` (the within-one-block
    diagonal case) only the ``id_a < id_b`` half-matrix is kept, else
    every (a, b) combination is kept once and the caller orders the
    ids. int64 matmul has no BLAS kernel in numpy (orders of magnitude
    slower); when every |q| ≤ sqrt(2^53/dim), all products AND partial
    sums are < 2^53, so float64 BLAS matmul is EXACT on these
    integer-valued matrices — same integers, memory-bandwidth speed.
    """
    import numpy as np

    dim = m_b.shape[1]
    exact_f64 = (
        max(np.abs(m_a).max(initial=0), np.abs(m_b).max(initial=0))
        <= int((2**53 / dim) ** 0.5)
    )
    if exact_f64:
        dot = np.matmul(m_a.astype(np.float64), m_b.astype(np.float64).T)
    else:  # exact int64 path for huge components (rare)
        dot = (m_a @ m_b.T).astype(np.float64)
    n2_a = np.einsum("ij,ij->i", m_a, m_a).astype(np.float64)
    n2_b = np.einsum("ij,ij->i", m_b, m_b).astype(np.float64)
    den = np.sqrt(n2_a[:, None] * n2_b[None, :])
    np.divide(dot, den, out=dot)
    np.multiply(dot, 10000.0, out=dot)
    np.floor(dot, out=dot)  # == sim_bp as float64
    keep = dot >= float(min_bp)
    if ordered_only:
        keep &= np.less.outer(ids_a, ids_b)
    ai, bi = np.nonzero(keep)
    return ids_a[ai], ids_b[bi], dot[ai, bi].astype(np.int64)


@register
class DedupEmbeddingCosine(Transformer):
    """Near-duplicate pairs by embedding cosine similarity ≥ threshold.

    Embeddings are quantized to int64 (floor(x·10^6)) so all dot
    products are EXACT integer arithmetic — order-free, therefore safe
    to vectorize any way we like, and the DuckDB oracle matches
    bit-for-bit.

    Execution — block-partitioned all-pairs, fully distributed:
    every vector gets a hash block id in [0, B); each row is replicated
    to its B (sorted) block-pair groups; ``applyInPandas`` per group
    runs a numpy block matmul (cross-block for (i,j), half-matrix for
    the (i,i) diagonal). Each unordered pair lands in EXACTLY one
    group, so the union over groups is the exact all-pairs answer with
    no distinct pass.

    Scale: no driver-side state at all (the former design collected the
    corpus to the driver and broadcast it — dead at ~10M vectors). Here
    the shuffle carries N·B rows and each group holds ≤ 2N/B vectors:
    pick ``blocks`` so a group fits executor memory (e.g. N=10^9,
    B=512 → ~4M vectors/group ≈ 2 GB at 64-dim int64). Work is
    O(N²·d/2) flops spread over B(B+1)/2 independent tasks — the
    unavoidable cost of an exact threshold; for approximate dedup at
    corpus scale, LSH-bucket first (``ann_lsh_bucketed``) and run the
    same kernel per bucket.
    ``sim_bp`` = floor(10^4 · cosine) for exact cross-engine compare.
    """

    TYPE = "dedup_embedding_cosine"

    OUT_SCHEMA = "id_a long, id_b long, sim_bp long"

    def __init__(self, vec_col: str, id_col: str, min_bp: int = 9000, blocks: int = 8):
        self.vec_col, self.id_col = vec_col, id_col
        self.min_bp = min_bp
        self.blocks = blocks

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        min_bp, B = self.min_bp, self.blocks

        q = df.select(
            F.col(self.id_col).cast("long").alias("_id"),
            quantize(F.col(self.vec_col)).alias("_q"),
            F.pmod(F.xxhash64(F.col(self.id_col)), F.lit(self.blocks))
            .cast("int")
            .alias("_b"),
        )
        # replicate each row to every block pair containing its block:
        # partner j ∈ [0,B) → group key (min(b,j), max(b,j)). For j==b
        # that is the diagonal group; all B keys per row are distinct,
        # so no pair is ever produced twice.
        rep = q.select(
            "_id",
            "_q",
            "_b",
            F.explode(F.array(*[F.lit(j) for j in range(B)])).alias("_j"),
        ).select(
            "_id",
            "_q",
            "_b",
            F.least("_b", "_j").alias("_bi"),
            F.greatest("_b", "_j").alias("_bj"),
        )

        def run(key, pdf):
            import numpy as np
            import pandas as pd

            bi, bj = int(key[0]), int(key[1])
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["_q"]), dtype=np.int64)
            if bi == bj:
                a, b, s = _cosine_pairs_block(
                    ids, mat, ids, mat, min_bp, ordered_only=True
                )
            else:
                left = pdf["_b"].to_numpy() == bi
                a, b, s = _cosine_pairs_block(
                    ids[left], mat[left], ids[~left], mat[~left], min_bp,
                    ordered_only=False,
                )
                # cross pairs appear once in any orientation; emit as
                # (min, max) to match the id_a < id_b output contract
                a, b = np.minimum(a, b), np.maximum(a, b)
            return pd.DataFrame({"id_a": a, "id_b": b, "sim_bp": s})

        out = rep.groupBy("_bi", "_bj").applyInPandas(run, self.OUT_SCHEMA)
        return [(table, out)]


__all__ = [
    "BandIndexIngestSink",
    "BandIndexStore",
    "DedupExact",
    "DedupIncremental",
    "DedupMinHashLSH",
    "DedupSimHash",
    "DedupNgramJaccard",
    "DedupEmbeddingCosine",
    "cosine",
]


@register
class DedupBlocks(Transformer):
    """Block-level (paragraph-style) duplication scoring — the
    C4/RefinedWeb unit between exact-doc and shingle dedup: split every
    document into NON-overlapping ``block_words``-word blocks, hash
    each block, and score each document by the fraction of its blocks
    that appear in ≥ ``min_docs`` distinct documents. Downstream
    filters drop documents whose content is mostly duplicated
    elsewhere (``dup_ratio_bp`` threshold) or feed the block set to a
    rewriter that strips the repeated paragraphs.

    Output: (id, n_blocks, dup_blocks, dup_ratio_bp).

    Scale shape: block hashing is one map-side pass (stride-w fold over
    the word-hash array — each character touched once); the only
    shuffles are the per-hash distinct-doc count (map-side combinable)
    and the join back on the block hash. The popular-block set is NOT
    broadcast — at 100 TB it can be arbitrarily large (boilerplate,
    licenses), so it stays a shuffle join keyed by a uniform 64-bit
    hash; AQE splits any residual skew.
    """

    TYPE = "dedup_blocks"

    def __init__(
        self,
        text_col: str,
        id_col: str,
        block_words: int = 8,
        min_docs: int = 2,
    ):
        self.text_col, self.id_col = text_col, id_col
        self.block_words, self.min_docs = block_words, min_docs

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        wh = df.select(
            self.id_col, word_hashes(F.col(self.text_col)).alias("_wh")
        )
        blocks = wh.select(
            self.id_col,
            block_hashes(F.col("_wh"), self.block_words).alias("_bh"),
        )
        # per-(doc, hash) exploded rows WITH multiplicity — dup_blocks
        # must count every occurrence so a doc that repeats one popular
        # paragraph 10x scores 10000bp, not 1000bp (ADVICE r3: the
        # distinct numerator understated 'fraction of blocks appearing
        # in >= min_docs docs'). Popularity still counts DISTINCT docs
        # per hash (a within-doc repeat is not cross-doc duplication).
        # explode_outer keeps empty docs (see DedupMinHashLSH on
        # InferFiltersFromGenerate).
        occ = blocks.select(
            self.id_col,
            F.explode_outer("_bh").alias("_h"),
        )
        popular = (
            occ.filter(F.col("_h").isNotNull())
            .groupBy("_h")
            .agg(F.count_distinct(F.col(self.id_col)).alias("_docs"))
            .filter(F.col("_docs") >= self.min_docs)
            .select("_h")
        )
        dup_counts = (
            occ.join(popular, "_h", "left_semi")
            .groupBy(self.id_col)
            .agg(F.count(F.lit(1)).alias("dup_blocks"))
        )
        out = (
            blocks.select(self.id_col, F.size("_bh").alias("n_blocks"))
            .join(dup_counts, self.id_col, "left")
            .select(
                self.id_col,
                F.col("n_blocks").cast("long"),
                F.coalesce("dup_blocks", F.lit(0)).cast("long").alias("dup_blocks"),
                F.when(
                    F.col("n_blocks") > 0,
                    F.floor(
                        F.coalesce("dup_blocks", F.lit(0))
                        * 10000
                        / F.col("n_blocks")
                    ),
                )
                .otherwise(0)
                .cast("long")
                .alias("dup_ratio_bp"),
            )
        )
        return [(table, out)]

    def oracle_sql(self, table: str = "documents") -> str:
        from transferia_spark.functions.portable import (
            sql_block_hashes,
            sql_word_hashes,
            sql_words,
        )

        wh = sql_word_hashes(sql_words(self.text_col))
        return f"""
            WITH wh AS (
              SELECT {self.id_col}, {wh} AS wh FROM {table}
            ),
            blocks AS (
              SELECT {self.id_col},
                     {sql_block_hashes('wh', self.block_words)} AS bh
              FROM wh
            ),
            occ AS (
              SELECT {self.id_col}, h.h AS h
              FROM blocks, unnest(bh) AS h(h)
            ),
            popular AS (
              SELECT h FROM occ
              GROUP BY h HAVING count(DISTINCT {self.id_col}) >= {self.min_docs}
            ),
            dup AS (
              SELECT occ.{self.id_col}, count(*)::BIGINT AS dup_blocks
              FROM occ SEMI JOIN popular ON occ.h = popular.h
              GROUP BY 1
            )
            SELECT b.{self.id_col}, len(b.bh)::BIGINT AS n_blocks,
                   COALESCE(dup.dup_blocks, 0)::BIGINT AS dup_blocks,
                   CASE WHEN len(b.bh) > 0 THEN
                     floor(COALESCE(dup.dup_blocks, 0) * 10000 / len(b.bh))::BIGINT
                   ELSE 0 END AS dup_ratio_bp
            FROM blocks b LEFT JOIN dup ON b.{self.id_col} = dup.{self.id_col}
        """
