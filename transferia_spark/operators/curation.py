"""Corpus-curation operators for training-data pipelines: PII
scrubbing, repetition-based quality signals, and deterministic
stratified sampling.

Beyond the reference's surface (transferia moves data; these are the
standard curation passes a 100 TB pretraining pipeline runs on top —
the same family as ``textstats``/``dedup``). All three are pure
Catalyst expression pipelines: no UDFs, no shuffle, O(len(text)) per
row, so they fuse into whatever scan feeds them and scale linearly
with executors.

Exactness contract: every regex stays inside the syntax subset Java
regex and RE2 (DuckDB) interpret identically (no lookaround, no
backrefs); every numeric output is an integer (basis points via
``floor``) so the oracle compare is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID

# patterns shared VERBATIM with the DuckDB oracle (RE2 ∩ Java regex)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{7,}\d", "<PHONE>"),
]


def sql_pii_scrub(expr: str) -> str:
    """DuckDB face of the scrub chain (same patterns, same order,
    global replace)."""
    out = expr
    for _, pat, token in PII_PATTERNS:
        pat_sql = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{pat_sql}', '{token}', 'g')"
    return out


@register
class PiiScrub(Transformer):
    """Mask emails / IPv4 addresses / international phone numbers in a
    text column; emit per-kind match counts for audit.

    Chain order is part of the contract (email before IPv4: an address
    inside an email's domain is already masked). Counting happens
    BEFORE scrubbing, on the original text.
    """

    TYPE = "pii_scrub"

    def __init__(self, text_col: str, out_col: str | None = None):
        self.text_col = text_col
        self.out_col = out_col or text_col

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        scrubbed: Column = F.col(self.text_col)
        counts = []
        for name, pat, token in PII_PATTERNS:
            counts.append(
                F.regexp_count(F.col(self.text_col), F.lit(pat))
                .cast("long")
                .alias(f"n_{name}")
            )
            scrubbed = F.regexp_replace(scrubbed, pat, token)
        out = df.withColumns(
            {f"n_{name}": c for (name, _, _), c in zip(PII_PATTERNS, counts)}
        ).withColumn(self.out_col, scrubbed)
        return [(table, out)]


# ---------------------------------------------------------------------------
# Gopher-style repetition signals
# ---------------------------------------------------------------------------

BULLET_RE = r"^\s*[-*]"
ELLIPSIS_RE = r"\.\.\.\s*$"


def _frac_bp(hits: Column, total: Column) -> Column:
    return (
        F.when(total > 0, F.floor(hits * 10000 / total)).otherwise(0).cast("long")
    )


@register
class QualityGopher(Transformer):
    """Repetition / formatting quality signals in the style of the
    Gopher rules (Rae et al. 2021, "Scaling Language Models", table A1):
    duplicate-line fraction, duplicate-word fraction, bullet-point and
    ellipsis line fractions, max and mean word length. Filtering is the
    caller's policy — the operator only measures, so one pass can feed
    many thresholds.

    Outputs are integer basis points; at 100 TB this is one projection
    fused into the scan.
    """

    TYPE = "quality_gopher"

    def __init__(self, text_col: str):
        self.text_col = text_col

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        s = F.col(self.text_col)
        # materialized arrays (referenced ≥2 times → CollapseProject
        # keeps them; see operators/dedup.py on the inlining trap)
        with_arrays = df.withColumns(
            {
                "_lines": F.split(s, r"\n"),
                "_w": F.filter(F.split(F.lower(s), r"\s+"), lambda w: w != ""),
            }
        )
        lines, w = F.col("_lines"), F.col("_w")
        n_lines, n_words = F.size(lines), F.size(w)
        word_chars = F.aggregate(
            w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        out = with_arrays.withColumns(
            {
                "dup_line_bp": _frac_bp(
                    n_lines - F.size(F.array_distinct(lines)), n_lines
                ),
                "dup_word_bp": _frac_bp(
                    n_words - F.size(F.array_distinct(w)), n_words
                ),
                "bullet_line_bp": _frac_bp(
                    F.size(F.filter(lines, lambda x: x.rlike(BULLET_RE))), n_lines
                ),
                "ellipsis_line_bp": _frac_bp(
                    F.size(F.filter(lines, lambda x: x.rlike(ELLIPSIS_RE))), n_lines
                ),
                "max_word_len": F.coalesce(
                    F.array_max(F.transform(w, F.length)).cast("long"), F.lit(0)
                ),
                "mean_word_len_x100": F.when(
                    n_words > 0, F.floor(word_chars * 100 / n_words)
                )
                .otherwise(0)
                .cast("long"),
            }
        ).drop("_lines", "_w")
        return [(table, out)]


def sql_quality_gopher(text: str) -> str:
    """DuckDB face of the signal set (bind in a CTE: lines + words)."""
    return f"""
  SELECT *,
    CASE WHEN len(_lines) > 0
         THEN floor((len(_lines) - len(list_distinct(_lines))) * 10000 / len(_lines))
         ELSE 0 END::BIGINT AS dup_line_bp,
    CASE WHEN len(_w) > 0
         THEN floor((len(_w) - len(list_distinct(_w))) * 10000 / len(_w))
         ELSE 0 END::BIGINT AS dup_word_bp,
    CASE WHEN len(_lines) > 0
         THEN floor(len(list_filter(_lines, x -> regexp_matches(x, '{BULLET_RE}'))) * 10000 / len(_lines))
         ELSE 0 END::BIGINT AS bullet_line_bp,
    CASE WHEN len(_lines) > 0
         THEN floor(len(list_filter(_lines, x -> regexp_matches(x, '{ELLIPSIS_RE.replace("'", "''")}'))) * 10000 / len(_lines))
         ELSE 0 END::BIGINT AS ellipsis_line_bp,
    coalesce(list_max(list_transform(_w, x -> length(x))), 0)::BIGINT AS max_word_len,
    CASE WHEN len(_w) > 0
         THEN floor(list_sum(list_transform(_w, x -> length(x))) * 100 / len(_w))
         ELSE 0 END::BIGINT AS mean_word_len_x100
  FROM (
    SELECT *,
           str_split({text}, chr(10)) AS _lines,
           list_filter(regexp_split_to_array(lower({text}), '\\s+'), w -> w <> '') AS _w
    FROM __SRC__
  )
"""


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------

SAMPLE_A = 2_654_435_761
SAMPLE_B = 12_345
SAMPLE_P = 1_000_000_007


def sample_bucket(id_col: Column) -> Column:
    """Deterministic bucket in [0, 10000) from an integer id — pure
    arithmetic, identical in both engines, stable across retries (the
    property ``rand()``-based sampling lacks: a recomputed partition
    resamples differently mid-write)."""
    return (F.pmod(F.pmod(id_col, SAMPLE_P) * SAMPLE_A + SAMPLE_B, SAMPLE_P)) % 10000


def sql_sample_bucket(id_expr: str) -> str:
    return f"((({id_expr} % {SAMPLE_P}) * {SAMPLE_A} + {SAMPLE_B}) % {SAMPLE_P}) % 10000"


@register
class SampleStratified(Transformer):
    """Keep a per-stratum fraction of rows: row survives iff its
    deterministic hash bucket < the stratum's rate (basis points).

    ``rates_bp`` maps stratum values (e.g. language) to keep-rates;
    unlisted strata use ``default_bp``. Rebalancing a multilingual
    corpus — downsample the dominant language, keep the tail — is one
    filter, no shuffle, reproducible bit-for-bit on rerun.
    """

    TYPE = "sample_stratified"

    def __init__(
        self,
        id_col: str,
        stratum_col: str,
        rates_bp: dict[str, int],
        default_bp: int = 10000,
    ):
        self.id_col = id_col
        self.stratum_col = stratum_col
        self.rates_bp = rates_bp
        self.default_bp = default_bp

    def rate(self) -> Column:
        r: Column = F.lit(self.default_bp)
        for k in sorted(self.rates_bp):
            r = F.when(F.col(self.stratum_col) == k, F.lit(self.rates_bp[k])).otherwise(r)
        return r

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        keep = sample_bucket(F.col(self.id_col)) < self.rate()
        return [(table, df.filter(keep))]


@register
class MixSources(Transformer):
    """Compose a training mixture to target source proportions — the
    Pile/Dolma-style mixing step: given weights per source and a total
    document budget, select ≈ ``total·w_s/Σw`` documents from each
    source, deterministically.

    Selection is a HASH THRESHOLD, not a ranking: with n_s documents
    in source s and quota q_s, a doc survives iff
    ``pt_ihash(id, seed) % M  <  min(M, M·q_s // n_s)`` — pure integer
    arithmetic, bit-identical in both engines, stable across task
    retries. Counts land within binomial noise (±√q_s) of the quota;
    the exact-count alternative is a per-source ``row_number`` ≤ q_s,
    which funnels each source through ONE reducer — a non-starter when
    a single source holds 10^10 documents. Sources smaller than their
    quota keep everything (threshold caps at M); no redistribution.

    Plan shape: one tiny per-source count aggregate, broadcast back,
    then a map-side filter. The corpus shuffles zero times.
    """

    TYPE = "mix_sources"

    M = 1_000_000

    def __init__(
        self,
        id_col: str,
        source_col: str,
        weights: dict[str, float],
        total: int,
        seed: int = 0,
    ):
        self.id_col, self.source_col = id_col, source_col
        self.weights, self.total, self.seed = weights, total, seed

    def quotas(self) -> dict[str, int]:
        sw = sum(self.weights.values())
        return {
            s: int(self.total * w / sw) for s, w in self.weights.items()
        }

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        from transferia_spark.functions.portable import pt_ihash

        counts = F.broadcast(
            df.groupBy(self.source_col).agg(
                F.count(F.lit(1)).cast("long").alias("_n")
            )
        )
        quota: Column = F.lit(None).cast("long")
        for s, q in sorted(self.quotas().items()):
            quota = F.when(F.col(self.source_col) == s, F.lit(q)).otherwise(quota)
        out = (
            df.join(counts, self.source_col)
            .withColumn("_q", quota)
            .filter(F.col("_q").isNotNull())
            .withColumn(
                "_thr",
                F.least(
                    F.lit(self.M).cast("long"),
                    # M·q exact in double below 2^53; both engines then
                    # perform the same IEEE division and floor
                    F.floor(F.lit(self.M) * F.col("_q") / F.col("_n")).cast(
                        "long"
                    ),
                ),
            )
            .filter(pt_ihash(F.col(self.id_col), self.seed) % self.M < F.col("_thr"))
            .drop("_n", "_q", "_thr")
        )
        return [(table, out)]

    def oracle_sql(self, table: str = "documents") -> str:
        from transferia_spark.functions.portable import sql_pt_ihash

        cases = " ".join(
            f"WHEN '{s}' THEN {q}::BIGINT"
            for s, q in sorted(self.quotas().items())
        )
        return f"""
            WITH counts AS (
              SELECT {self.source_col} AS s, count(*)::BIGINT AS n
              FROM {table} GROUP BY 1
            ),
            q AS (
              SELECT t.*, counts.n,
                     CASE t.{self.source_col} {cases} ELSE NULL END AS quota
              FROM {table} t JOIN counts ON t.{self.source_col} = counts.s
            )
            SELECT * EXCLUDE (n, quota) FROM q
            WHERE quota IS NOT NULL
              AND {sql_pt_ihash(self.id_col, self.seed)} % {self.M}
                  < least({self.M}::BIGINT,
                          floor({self.M}::BIGINT * quota / n)::BIGINT)
        """


@register
class ChunkDocuments(Transformer):
    """Split documents into token-bounded, optionally overlapping chunks
    — the RAG / context-window prep that sits between curation and
    embedding in a training-data pipeline.

    Chunking is whitespace-token based (swap in a BPE count column when
    available): chunk ``i`` covers words
    ``[i * stride, i * stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the last chunk may be short,
    and a document shorter than one chunk yields exactly one chunk.
    Deterministic and purely positional, so the DuckDB oracle
    reproduces every chunk byte-for-byte.

    Output: (id, chunk_idx, chunk_text, n_tok).

    Scale shape: one map-side pass — ``sequence`` + ``explode`` +
    ``slice`` are Catalyst built-ins fused into the scan; no shuffle,
    no UDF. Chunk explosion multiplies rows by ~doc_tokens/stride;
    project payload columns away before any downstream shuffle.
    """

    TYPE = "chunk_documents"

    def __init__(
        self,
        text_col: str,
        id_col: str,
        chunk_tokens: int = 512,
        overlap: int = 0,
    ):
        if not 0 <= overlap < chunk_tokens:
            raise ValueError("need 0 <= overlap < chunk_tokens")
        self.text_col, self.id_col = text_col, id_col
        self.chunk_tokens, self.overlap = chunk_tokens, overlap

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        from transferia_spark.functions.portable import words

        ct, stride = self.chunk_tokens, self.chunk_tokens - self.overlap
        w = words(F.col(self.text_col))
        n = F.size(w)
        # number of chunks: ceil(max(n - overlap, 1) / stride), >= 1
        n_chunks = F.greatest(
            F.lit(1),
            F.ceil((n - F.lit(self.overlap)) / F.lit(stride)).cast("int"),
        )
        base = df.select(
            self.id_col, w.alias("_w"), n.alias("_n"), n_chunks.alias("_k")
        )
        out = base.select(
            self.id_col,
            F.explode(F.sequence(F.lit(0), F.col("_k") - 1)).alias("chunk_idx"),
            "_w",
            "_n",
        ).select(
            self.id_col,
            "chunk_idx",
            F.array_join(
                F.slice(F.col("_w"), F.col("chunk_idx") * stride + 1, ct), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(ct), F.col("_n") - F.col("chunk_idx") * stride
            ).cast("long").alias("n_tok"),
        )
        return [(table, out)]

    def oracle_sql(self, table: str = "documents") -> str:
        from transferia_spark.functions.portable import sql_words

        ct, stride = self.chunk_tokens, self.chunk_tokens - self.overlap
        return f"""
            WITH d AS (
              SELECT {self.id_col}, {sql_words(self.text_col)} AS w
              FROM {table}
            ),
            k AS (
              SELECT {self.id_col}, w, len(w) AS n,
                     greatest(1, ceil((len(w) - {self.overlap})
                                      / {stride}.0)::INT) AS n_chunks
              FROM d
            )
            SELECT {self.id_col}, i.i AS chunk_idx,
                   array_to_string(
                     list_slice(w, i.i * {stride} + 1,
                                i.i * {stride} + {ct}), ' ') AS chunk_text,
                   least({ct}, n - i.i * {stride})::BIGINT AS n_tok
            FROM k, unnest(range(0, n_chunks)) AS i(i)
        """


__all__ = [
    "ChunkDocuments",
    "PiiScrub",
    "QualityGopher",
    "SampleStratified",
    "MixSources",
    "PII_PATTERNS",
    "sql_pii_scrub",
    "sql_quality_gopher",
    "sample_bucket",
    "sql_sample_bucket",
]
