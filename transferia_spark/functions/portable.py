"""Dual-engine deterministic primitives for the training-data pipeline.

Every function here has TWO faces kept in one place so they cannot
drift: a Spark `Column` builder (used by the operators) and a DuckDB
SQL-string builder (used by the oracle queries in `__spark_entry__`).
The driver's correctness gate compares values EXACTLY (no float
tolerance), so the design rules are:

- integer arithmetic everywhere a hash/count is involved (mod
  P=1e9+7, products bounded < 2^63);
- floating point only as `double`, produced by *sequential left
  folds* in both engines (Spark `aggregate`, DuckDB `list_reduce`
  with an explicit `::DOUBLE` init) so the bit pattern is identical;
- final float→int quantization via `floor(x * 10^k)` (monotone and
  exact on identical doubles — unlike `round`, whose tie-breaking
  differs between engines).

Scale notes: all builders are pure Catalyst expressions (no Python
UDFs), so they run inside WholeStageCodegen on the JVM and
vectorize; per-row cost is O(len(text)) with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007
HASH_INIT = 7
HASH_MULT = 31
MINHASH_A = 2_654_435_761
MINHASH_B = 40_503


# ---------------------------------------------------------------------------
# portable polynomial string hash:  h = fold(chars, 7, acc*31 + ord(c) mod P)
# ---------------------------------------------------------------------------


def pt_hash(s: Column) -> Column:
    """Polynomial rolling hash of a string, identical in Spark and DuckDB."""
    return F.aggregate(
        F.transform(F.split(s, ""), lambda c: F.ascii(c)),
        F.lit(HASH_INIT).cast("long"),
        lambda acc, x: (acc * HASH_MULT + x) % F.lit(P),
    )


def sql_pt_hash(expr: str) -> str:
    return (
        f"list_reduce(list_prepend({HASH_INIT}::BIGINT, "
        f"list_transform(split({expr}, ''), c -> ord(c))), "
        f"(acc, x) -> (acc * {HASH_MULT} + x) % {P})"
    )


# ---------------------------------------------------------------------------
# portable integer hash: h = ((x mod P) * A + B) mod P
# ---------------------------------------------------------------------------
#
# For deterministic shuffling/sharding of integer keys. (x mod P) < P and
# A < P keep the product < ~1e18 < 2^63, so BIGINT arithmetic is exact in
# both engines at any key magnitude. A seed folds in as a second round.


def pt_ihash(x: Column, seed: int = 0) -> Column:
    h = (x.cast("long") % P * F.lit(MINHASH_A % P) + F.lit(MINHASH_B)) % P
    if seed:
        h = (h * F.lit(MINHASH_A % P) + F.lit(seed % P)) % P
    return h


def sql_pt_ihash(expr: str, seed: int = 0) -> str:
    h = f"((({expr})::BIGINT % {P}) * {MINHASH_A % P} + {MINHASH_B}) % {P}"
    if seed:
        h = f"(({h}) * {MINHASH_A % P} + {seed % P}) % {P}"
    return h


# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------


def words(s: Column) -> Column:
    """Lower-cased whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(s), r"\s+"), lambda w: w != "")


def sql_words(expr: str) -> str:
    return rf"list_filter(regexp_split_to_array(lower({expr}), '\s+'), w -> w <> '')"


def shingles(w: Column, n: int) -> Column:
    """Word n-grams joined by single spaces; empty array if < n words."""
    starts = F.sequence(F.lit(1), F.size(w) - (n - 1))
    arr = F.transform(starts, lambda i: F.array_join(F.slice(w, i, n), " "))
    return F.when(F.size(w) >= n, arr).otherwise(F.array().cast("array<string>"))


def sql_shingles(words_expr: str, n: int) -> str:
    return (
        f"CASE WHEN len({words_expr}) >= {n} THEN "
        f"list_transform(range(1, len({words_expr}) - {n} + 2), "
        f"i -> array_to_string(list_slice({words_expr}, i, i + {n} - 1), ' ')) "
        f"ELSE [] END"
    )


# shingle HASHES from word hashes: hash each word once, then fold n
# consecutive word hashes — (…(7·31+wh_i)·31+wh_{i+1}…) mod P. Touches
# each character once (vs n× for string shingles) and never builds the
# shingle string. Collisions (P=1e9+7 vs ~1e5 shingles) are negligible
# and identical in both engines.


def word_hashes(s: Column) -> Column:
    """Array of per-word polynomial hashes — the Spark face of
    ``sql_word_hashes``. Callers MUST materialize this as its own
    column referenced ≥2 times downstream (CollapseProject inlines
    single-reference aliases, and an inlined word-hash array inside a
    per-shingle lambda re-tokenizes the document once per shingle)."""
    return F.transform(words(s), pt_hash)


def shingle_hashes(wh: Column, n: int) -> Column:
    """Shingle-hash array from a word-hash ARRAY column — the Spark
    face of ``sql_shingle_hashes``. Pure map-side expression: no
    explode, no window, no shuffle. ``wh`` must be a materialized
    column (see ``word_hashes``)."""
    arr = F.transform(
        F.sequence(F.lit(1), F.size(wh) - (n - 1)),
        lambda i: F.aggregate(
            F.slice(wh, i, n),
            F.lit(HASH_INIT).cast("long"),
            lambda acc, x: (acc * HASH_MULT + x) % F.lit(P),
        ),
    )
    return F.when(F.size(wh) >= n, arr).otherwise(
        F.array().cast("array<bigint>")
    )


def sql_shingle_hashes(wh_expr: str, n: int) -> str:
    """Shingle hashes from a word-hash LIST expression (bind the word
    hashes in a CTE first: ``list_transform(words, w -> pt_hash(w))``)."""
    fold = (
        f"list_reduce(list_prepend({HASH_INIT}::BIGINT, "
        f"list_slice({wh_expr}, i, i + {n} - 1)), "
        f"(acc, x) -> (acc * {HASH_MULT} + x) % {P})"
    )
    return (
        f"CASE WHEN len({wh_expr}) >= {n} THEN "
        f"list_transform(range(1, len({wh_expr}) - {n} + 2), i -> {fold}) "
        f"ELSE [] END"
    )


def sql_word_hashes(words_expr: str) -> str:
    return f"list_transform({words_expr}, w -> {sql_pt_hash('w')})"


def block_hashes(wh: Column, w: int) -> Column:
    """Hashes of the NON-overlapping w-word blocks of a word-hash
    array (stride w — the C4/RefinedWeb 'paragraph' unit, vs the
    stride-1 shingles used for minhash). Only full blocks count; docs
    shorter than w words yield an empty array. Pure map-side
    expression, same polynomial fold as ``shingle_hashes``."""
    starts = F.sequence(F.lit(1), F.size(wh) - (w - 1), F.lit(w))
    arr = F.transform(
        starts,
        lambda i: F.aggregate(
            F.slice(wh, i, w),
            F.lit(HASH_INIT).cast("long"),
            lambda acc, x: (acc * HASH_MULT + x) % F.lit(P),
        ),
    )
    return F.when(F.size(wh) >= w, arr).otherwise(
        F.array().cast("array<bigint>")
    )


def sql_block_hashes(wh_expr: str, w: int) -> str:
    fold = (
        f"list_reduce(list_prepend({HASH_INIT}::BIGINT, "
        f"list_slice({wh_expr}, i, i + {w} - 1)), "
        f"(acc, x) -> (acc * {HASH_MULT} + x) % {P})"
    )
    return (
        f"CASE WHEN len({wh_expr}) >= {w} THEN "
        f"list_transform(range(1, len({wh_expr}) - {w} + 2, {w}), i -> {fold}) "
        f"ELSE [] END"
    )


# ---------------------------------------------------------------------------
# minhash: k permutations h_i(x) = (a_i*x + b_i) mod P over shingle hashes
# ---------------------------------------------------------------------------


def minhash_signature(hashes: Column, k: int) -> Column:
    """k-element minhash signature of an array of shingle hashes.

    a_i, b_i derive from the loop index so both engines generate the
    same permutation family without a random generator.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(
                hashes,
                lambda h: ((i * MINHASH_A + 1) % P * h + (i * MINHASH_B + 17) % P) % P,
            )
        ),
    )


def minhash_signature_fold(sh: Column, k: int) -> Column:
    """k-perm minhash as ONE left fold over the shingle-hash array:
    every element updates all k minima via ``zip_with``.

    Why a fold and not ``transform(range(k), i -> array_min(...))``:
    Catalyst's CollapseProject inlines a single-reference alias, and in
    the nested-transform shape the inlined shingle subtree lands INSIDE
    the k-element lambda — re-evaluated k× per row. In the fold shape
    the shingle array sits in the fold's *input* position, evaluated
    exactly once per row no matter what gets inlined. min over the
    multiset equals min over the set, so results are identical to
    ``sql_minhash_signature``'s per-permutation ``list_min``.
    """
    perms = F.array(*[F.lit(i).cast("long") for i in range(k)])
    init = F.array(*[F.lit(P).cast("long") for _ in range(k)])
    return F.aggregate(
        sh,
        init,
        lambda acc, x: F.zip_with(
            acc,
            perms,
            # (a_i·x + b_i) mod P with a_i,b_i < P and x < P: products
            # stay < 1e18 < 2^63
            lambda m, i: F.least(
                m,
                ((i * MINHASH_A + 1) % P * x + (i * MINHASH_B + 17) % P) % P,
            ),
        ),
    )


def sql_minhash_signature(hashes_expr: str, k: int) -> str:
    return (
        f"list_transform(range(0, {k}), i -> list_min(list_transform({hashes_expr}, "
        f"h -> ((i * {MINHASH_A} + 1) % {P} * h + (i * {MINHASH_B} + 17) % {P}) % {P})))"
    )


def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """LSH band keys: fold each r-row slice of the signature into one
    bucket id (band index mixed into the init so bands never collide)."""
    keys = [
        F.aggregate(
            F.slice(sig, j * rows + 1, rows),
            F.lit(j * 1_000_003 + 13).cast("long"),
            lambda acc, v: (acc * HASH_MULT + v) % F.lit(P),
        )
        for j in range(bands)
    ]
    return F.array(*keys)


def sql_band_keys(sig_expr: str, bands: int, rows: int) -> str:
    return (
        f"list_transform(range(0, {bands}), j -> "
        f"list_reduce(list_prepend(j * 1000003 + 13, "
        f"list_slice({sig_expr}, j * {rows} + 1, j * {rows} + {rows})), "
        f"(acc, v) -> (acc * {HASH_MULT} + v) % {P}))"
    )


# ---------------------------------------------------------------------------
# vector math: sequential-fold dot product / norms (bit-identical doubles)
# ---------------------------------------------------------------------------


def vec_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sql_vec_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (acc, x) -> acc + x)"
    )


def vec_norm2(a: Column) -> Column:
    return vec_dot(a, a)


def sql_vec_norm2(a: str) -> str:
    return sql_vec_dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity as double; one division + one sqrt at the end
    so identical folds give identical bits."""
    return vec_dot(a, b) / F.sqrt(vec_norm2(a) * vec_norm2(b))


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_vec_dot(a, b)} / sqrt({sql_vec_norm2(a)} * {sql_vec_norm2(b)}))"


def floor_bp(x: Column, k: int = 4) -> Column:
    """Quantize a double to integer 10^-k units via floor (exact on
    identical doubles; `round` tie-breaking differs across engines)."""
    return F.floor(x * F.lit(10**k)).cast("long")


def sql_floor_bp(expr: str, k: int = 4) -> str:
    return f"floor(({expr}) * {10 ** k})::BIGINT"


# ---------------------------------------------------------------------------
# quantized-integer vector math: exact and order-free
# ---------------------------------------------------------------------------
#
# Float sums are order-dependent, which couples the execution strategy
# to the oracle bit-for-bit. Quantizing components to integers first
# (q = floor(x · 10^6)) makes dot products EXACT int64 arithmetic —
# any summation order, any engine, any vectorization (numpy matmul
# included) gives the same number. The only float ops left are one
# division and one sqrt on identical integers → identical bits.
# Bounds: |x| ≤ ~100 → |q| ≤ 1e8; 64-dim dot ≤ 64·1e16 < 2^63. ✓

Q_SCALE = 1_000_000


def quantize(vec: Column) -> Column:
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(Q_SCALE))).cast("long")
    )


def sql_quantize(vec: str) -> str:
    return (
        f"list_transform({vec}, x -> floor(x::DOUBLE * {Q_SCALE}.0)::BIGINT)"
    )


def qdot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sql_qdot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i] * {b}[i]))::BIGINT"
    )


def qcosine(dot: Column, n2a: Column, n2b: Column) -> Column:
    """cosine from exact integer dot/norms: double(dot)/sqrt(da·db)."""
    return dot.cast("double") / F.sqrt(n2a.cast("double") * n2b.cast("double"))


def sql_qcosine(dot: str, n2a: str, n2b: str) -> str:
    return f"(({dot})::DOUBLE / sqrt(({n2a})::DOUBLE * ({n2b})::DOUBLE))"


# ---------------------------------------------------------------------------
# deterministic LSH hyperplanes (integer-valued, index-derived)
# ---------------------------------------------------------------------------


def _plane(q: int, dim: int) -> list[int]:
    return [((q * 37 + d * 101) % 97) - 48 for d in range(dim)]


def hyperplane_bucket(qvec: Column, n_planes: int, dim: int) -> Column:
    """Sign-of-dot-product LSH bucket over a QUANTIZED vector. Plane
    q's d-th component is the integer ((q*37 + d*101) mod 97) - 48 —
    derived, not random, so both engines build the same planes; the
    int·int dot is exact, so bucket ids are order-free."""
    bucket = F.lit(0).cast("long")
    for q in range(n_planes):
        plane = F.array(*[F.lit(p).cast("long") for p in _plane(q, dim)])
        dot = F.aggregate(
            F.zip_with(qvec, plane, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << q)).otherwise(0)
    return bucket


def plane_dots(qvec: Column, n_planes: int, dim: int) -> Column:
    """Array of exact int64 dot products against every LSH plane —
    the margin signal multi-probe ranks bit flips by (planes closest
    to the vector are the likeliest sign errors)."""
    dots = []
    for q in range(n_planes):
        plane = F.array(*[F.lit(p).cast("long") for p in _plane(q, dim)])
        dots.append(
            F.aggregate(
                F.zip_with(qvec, plane, lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*dots)


def sql_plane_dots(qvec: str, n_planes: int, dim: int) -> str:
    exprs = []
    for q in range(n_planes):
        plane_lit = "[" + ", ".join(str(p) for p in _plane(q, dim)) + "]"
        exprs.append(
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> {qvec}[i] * ({plane_lit})[i]))::BIGINT"
        )
    return "[" + ", ".join(exprs) + "]"


def sql_hyperplane_bucket(qvec: str, n_planes: int, dim: int) -> str:
    terms = []
    for q in range(n_planes):
        plane_lit = "[" + ", ".join(str(p) for p in _plane(q, dim)) + "]"
        dot = (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> {qvec}[i] * ({plane_lit})[i]))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << q} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::BIGINT"
