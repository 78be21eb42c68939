"""Text-analysis operators for training-data curation.

- ``lang_id``        — n-gram/lexicon language heuristic.
- ``quality_score``  — length / punctuation / stopword-ratio scoring.
- ``token_count``    — whitespace tokens + BPE-ish regex tokens.
- ``fingerprint``    — polynomial full-text hash + rolling-window
                       min-hash (Rabin-Karp style) per document.

All are pure Catalyst expression pipelines (no UDFs, no shuffle):
per-row cost O(len(text)), runs inside WholeStageCodegen, scales
linearly with executors. Integer outputs (basis points / hashes) so
the DuckDB oracle compare is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transferia_spark.functions.portable import pt_hash, words
from transferia_spark.operators.base import Routed, Transformer, register
from transferia_spark.schema.colschema import TableID

# tiny lexicons for the heuristic: real pipelines plug fastText etc.
# via a Pandas UDF; the heuristic IS the operator contract here.
LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "que", "por", "para"),
}
CJK_START = 0x4E00
CJK_END = 0x9FFF

# regex token classes shared verbatim with the DuckDB oracle (keep to
# constructs RE2 and Java regex interpret identically)
TOKEN_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

PUNCT_CHARS = ".,;:!?'\"()-"


def lexicon_hits(w: Column, lang: str) -> Column:
    lex = LEXICONS[lang]
    return F.size(F.filter(w, lambda x: x.isin(*lex)))


def cjk_ratio(s: Column) -> Column:
    chars = F.split(s, "")
    hits = F.size(
        F.filter(
            chars,
            lambda c: (F.ascii(c) >= CJK_START) & (F.ascii(c) <= CJK_END),
        )
    )
    return F.when(F.length(s) > 0, hits * 10000 / F.length(s)).otherwise(0)


@register
class LangId(Transformer):
    """Lexicon-vote language heuristic: CJK-ratio short-circuit for
    'zh', else the lexicon with the most word hits wins (ties break
    alphabetically — deterministic in both engines)."""

    TYPE = "lang_id"

    def __init__(self, text_col: str, out_col: str = "lang_pred"):
        self.text_col, self.out_col = text_col, out_col

    def pred(self) -> Column:
        s = F.col(self.text_col)
        w = words(s)
        best = F.lit("und")
        best_hits = F.lit(0)
        # iterate in reverse-alphabetical order so the final winner on
        # ties is the alphabetically first (strict > comparison)
        for lang in sorted(LEXICONS, reverse=True):
            h = lexicon_hits(w, lang)
            take = (h > 0) & (h >= best_hits)
            best = F.when(take, F.lit(lang)).otherwise(best)
            best_hits = F.when(take, h).otherwise(best_hits)
        return F.when(F.floor(cjk_ratio(s)) >= 3000, F.lit("zh")).otherwise(best)

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        return [(table, df.withColumn(self.out_col, self.pred()))]


@register
class QualityScore(Transformer):
    """Heuristic document-quality score in basis points.

    Components (each an integer): word count, mean word length (bp),
    English-stopword ratio (bp), punctuation ratio (bp). score_bp
    rewards mid-length docs with a sane stopword ratio and penalizes
    punctuation soup — the standard cheap pre-filter shape.
    """

    TYPE = "quality_score"

    def __init__(self, text_col: str):
        self.text_col = text_col

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        s = F.col(self.text_col)
        w = words(s)
        n_words = F.size(w)
        char_total = F.aggregate(
            F.transform(w, F.length), F.lit(0), lambda a, x: a + x
        )
        mean_wlen_bp = F.when(
            n_words > 0, F.floor(char_total * 10000 / n_words)
        ).otherwise(0).cast("long")
        stop_bp = F.when(
            n_words > 0, F.floor(lexicon_hits(w, "en") * 10000 / n_words)
        ).otherwise(0).cast("long")
        punct = F.size(
            F.filter(F.split(s, ""), lambda c: c.isin(*list(PUNCT_CHARS)))
        )
        punct_bp = F.when(
            F.length(s) > 0, F.floor(punct * 10000 / F.length(s))
        ).otherwise(0).cast("long")
        length_ok = (n_words >= 10) & (n_words <= 1000)
        score = (
            F.when(length_ok, F.lit(4000)).otherwise(F.lit(0))
            + F.when((stop_bp >= 200) & (stop_bp <= 6000), F.lit(3000)).otherwise(0)
            + F.when(punct_bp <= 1500, F.lit(2000)).otherwise(0)
            + F.when(
                (mean_wlen_bp >= 30000) & (mean_wlen_bp <= 120000), F.lit(1000)
            ).otherwise(0)
        )
        out = df.select(
            "*",
            n_words.cast("long").alias("n_words"),
            mean_wlen_bp.alias("mean_wlen_bp"),
            stop_bp.alias("stopword_bp"),
            punct_bp.alias("punct_bp"),
            score.cast("long").alias("score_bp"),
        )
        return [(table, out)]


@register
class TokenCount(Transformer):
    """Whitespace token count + BPE-ish regex token count (letters
    runs, digit runs, single punctuation — the usual pre-tokenizer
    estimate for LLM token budgeting)."""

    TYPE = "token_count"

    def __init__(self, text_col: str):
        self.text_col = text_col

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        s = F.col(self.text_col)
        out = df.select(
            "*",
            F.size(words(s)).cast("long").alias("ws_tokens"),
            F.size(F.regexp_extract_all(F.lower(s), F.lit(TOKEN_REGEX), 0))
            .cast("long")
            .alias("re_tokens"),
        )
        return [(table, out)]


@register
class Fingerprint(Transformer):
    """Document fingerprints: full-text polynomial hash plus the min
    over all rolling 8-char window hashes (Rabin-Karp / winnowing
    lite) of the whitespace-normalized lower-cased text."""

    TYPE = "fingerprint"

    WINDOW = 8

    def __init__(self, text_col: str):
        self.text_col = text_col

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        norm = F.trim(
            F.regexp_replace(F.lower(F.col(self.text_col)), r"\s+", " ")
        )
        win = self.WINDOW
        starts = F.sequence(F.lit(1), F.length(norm) - (win - 1))
        rolling = F.when(
            F.length(norm) >= win,
            F.array_min(
                F.transform(starts, lambda i: pt_hash(F.substring(norm, i, win)))
            ),
        ).otherwise(pt_hash(norm))
        out = df.select(
            "*",
            pt_hash(norm).alias("full_hash"),
            rolling.cast("long").alias("min_window_hash"),
        )
        return [(table, out)]


__all__ = ["LangId", "QualityScore", "TokenCount", "Fingerprint", "LEXICONS", "TOKEN_REGEX"]


@register
class Bm25Rank(Transformer):
    """Top-k keyword search: BM25-shaped ranking of documents for a
    small term set — the retrieval primitive of corpus QA /
    decontamination triage ("which documents dominate this query?").

    Log-free idf (``idf_mode="odds"``, default): the classic idf is
    ln((N-df+0.5)/(df+0.5)); libm logs differ by ulps across engines,
    which can flip a floor boundary and poison value hashes. The raw
    odds ratio is strictly monotone in it and needs only IEEE +,*,/ —
    bit-identical everywhere. NOTE the deviation this buys: per-term
    orderings are identical to BM25, but the per-doc SUM weights rare
    terms linearly rather than logarithmically, so multi-term rankings
    can differ from classic BM25 (a single rare-term hit outweighs
    many common-term hits more aggressively). ``idf_mode="ln"`` gives
    the classic formula (deterministic within one engine; its floor
    boundaries are not guaranteed bit-stable across engines, so the
    shipped oracle covers "odds" only). Each per-term score is
    quantized to an int (floor(score·10^6)) BEFORE the per-doc sum, so
    the sum is integer arithmetic — order-free, hash-exact vs the
    oracle.

    Scale shape (100 TB corpus):
    - tokenize + term filter are map-side (the term set is a literal
      in the plan; no shuffle touches non-matching tokens)
    - per-(doc, term) tf is one map-side-combinable groupBy
    - corpus stats (N, Σdl) are a one-row aggregate cross-joined
      back broadcast; per-term document frequencies are a tiny
      broadcast join — the corpus never shuffles on content
    - final per-doc sum + global top-k (TakeOrderedAndProject —
      per-partition heaps, no global sort)
    """

    TYPE = "bm25_rank"

    def __init__(
        self,
        text_col: str,
        id_col: str,
        terms: list[str],
        k1_milli: int = 1200,
        b_milli: int = 750,
        top_k: int = 20,
        idf_mode: str = "odds",
    ):
        if idf_mode not in ("odds", "ln"):
            raise ValueError(f"idf_mode must be odds|ln, got {idf_mode!r}")
        self.text_col, self.id_col = text_col, id_col
        self.terms = [t.lower() for t in terms]
        self.k1_milli, self.b_milli, self.top_k = k1_milli, b_milli, top_k
        self.idf_mode = idf_mode

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        k1 = F.lit(self.k1_milli / 1000.0)
        b = F.lit(self.b_milli / 1000.0)
        toks = df.select(
            self.id_col, words(F.col(self.text_col)).alias("_w")
        ).select(self.id_col, "_w", F.size("_w").alias("_dl"))
        stats = F.broadcast(
            toks.agg(
                F.count(F.lit(1)).alias("_n0"),
                F.sum("_dl").cast("long").alias("_sumdl"),
            )
        )
        tf = (
            toks.select(
                self.id_col, "_dl", F.explode("_w").alias("_t")
            )
            .filter(F.col("_t").isin(*self.terms))
            .groupBy(self.id_col, "_dl", "_t")
            .agg(F.count(F.lit(1)).cast("long").alias("_tf"))
            # dual consumer (dft aggregates it, the scoring join reads
            # it) and the dft branch sits behind a BroadcastExchange,
            # which defeats ReusedExchange — without this the WHOLE
            # tokenize+explode+groupBy subtree runs twice (verified in
            # the plan: two identical parquet scans). The checkpoint is
            # term-filtered rows only — bounded by term selectivity,
            # not corpus size (r14; the _bucket_pairs trade).
            .localCheckpoint(eager=False)
        )
        dft = F.broadcast(
            tf.groupBy("_t").agg(F.count(F.lit(1)).cast("long").alias("_df"))
        )
        # arithmetic mirrored token-for-token in sql_bm25_oracle — the
        # evaluation order must match so every IEEE op rounds alike
        idf = (F.col("_n0") - F.col("_df") + F.lit(0.5)) / (
            F.col("_df") + F.lit(0.5)
        )
        if self.idf_mode == "ln":
            idf = F.log(idf)  # classic BM25; see docstring caveat
        tfn = (F.col("_tf") * (k1 + F.lit(1.0))) / (
            F.col("_tf")
            + k1
            * (
                (F.lit(1.0) - b)
                + b * ((F.col("_dl") * F.col("_n0")) / F.col("_sumdl"))
            )
        )
        per_term = F.floor(idf * tfn * F.lit(1000000.0)).cast("long")
        scored = (
            tf.join(dft, "_t")
            .crossJoin(stats)
            .select(self.id_col, per_term.alias("_s"))
            .groupBy(self.id_col)
            .agg(F.sum("_s").alias("score_bp"))
            .orderBy(F.col("score_bp").desc(), F.col(self.id_col).asc())
            .limit(self.top_k)
        )
        return [(table, scored)]

    def oracle_sql(self, table: str = "documents") -> str:
        """DuckDB-equivalent statement (same constants, same op order)."""
        if self.idf_mode != "odds":
            raise ValueError(
                "oracle_sql covers idf_mode='odds' only — ln floors are "
                "not bit-stable across libm implementations"
            )
        from transferia_spark.functions.portable import sql_words

        terms = ", ".join(f"'{t}'" for t in self.terms)
        k1 = repr(self.k1_milli / 1000.0)
        b = repr(self.b_milli / 1000.0)
        return f"""
            WITH toks AS (
              SELECT {self.id_col}, {sql_words(self.text_col)} AS w
              FROM {table}
            ),
            dl AS (SELECT {self.id_col}, len(w)::BIGINT AS dl FROM toks),
            n0 AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl FROM dl),
            tf AS (
              SELECT {self.id_col}, t.t AS term, count(*)::BIGINT AS tf
              FROM toks, unnest(w) AS t(t)
              WHERE t.t IN ({terms})
              GROUP BY 1, 2
            ),
            dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
            SELECT tf.{self.id_col},
                   sum(floor(
                     ((n0.n - dft.df + 0.5) / (dft.df + 0.5))
                     * ((tf.tf * ({k1} + 1.0))
                        / (tf.tf + {k1} * ((1.0 - {b})
                           + {b} * ((dl.dl * n0.n) / n0.sumdl))))
                     * 1000000.0)::BIGINT)::BIGINT AS score_bp
            FROM tf
              JOIN dft ON tf.term = dft.term
              JOIN dl ON tf.{self.id_col} = dl.{self.id_col}
              CROSS JOIN n0
            GROUP BY 1
            ORDER BY score_bp DESC, tf.{self.id_col} ASC
            LIMIT {self.top_k}
        """


@register
class LmFamiliarity(Transformer):
    """CCNet-lite statistical quality signal: how 'familiar' a
    document's tokens are under the corpus's own unigram distribution.

    CCNet ranks documents by KenLM perplexity; the log-prob form needs
    libm logs, which differ by ulps across engines and poison value
    hashes. The monotone stand-in: per token, the quantized unigram
    probability ``floor(10^12 · count(w) / total_tokens)``; per doc,
    the integer sum and the token count (callers divide for the mean).
    High-sum docs are common-language text; near-zero docs are noise,
    code soup, or the wrong language. All arithmetic is one IEEE
    division + floor per DISTINCT (doc, token) pair times an exact
    integer multiply — hash-exact vs the oracle.

    Scale shape (the part that matters at 10^12 tokens):
    - unigram counts: explode + groupBy(token) — map-side combinable,
      one shuffle keyed by the word (hot stopwords are just big
      COUNTERS, not big groups — partial aggregation absorbs them)
    - scoring joins the per-(doc, token) tf rows to the (word, count)
      table on the token — a shuffle join; the vocabulary is unbounded
      at corpus scale so the count table is NOT broadcast
    - final per-doc sum: map-side combinable groupBy(doc)
    """

    TYPE = "lm_familiarity"

    SCALE = 10**12

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        toks = df.select(
            self.id_col, F.explode(words(F.col(self.text_col))).alias("_w")
        )
        tf = toks.groupBy(self.id_col, "_w").agg(
            F.count(F.lit(1)).cast("long").alias("_tf")
        )
        counts = toks.groupBy("_w").agg(
            F.count(F.lit(1)).cast("long").alias("_n")
        ).localCheckpoint(eager=False)
        # ^ dual consumer (total aggregates it, the per-token join
        # reads it) and total sits behind a BroadcastExchange, which
        # defeats ReusedExchange — without this the corpus is
        # tokenized+exploded a THIRD time just to recount the vocab
        # (verified in the plan). The checkpoint is the narrow
        # (word, count) vocabulary frame — sublinear in corpus size
        # (Heaps' law), never the token stream (r14).
        total = F.broadcast(
            counts.agg(F.sum("_n").cast("long").alias("_tot"))
        )
        per_tok = (
            tf.join(counts, "_w")
            .crossJoin(total)
            .select(
                self.id_col,
                (
                    F.col("_tf")
                    * F.floor(
                        F.lit(float(self.SCALE)) * F.col("_n") / F.col("_tot")
                    ).cast("long")
                ).alias("_s"),
                F.col("_tf"),
            )
        )
        out = per_tok.groupBy(self.id_col).agg(
            F.sum("_s").cast("long").alias("familiarity_sum"),
            F.sum("_tf").cast("long").alias("n_tok"),
        )
        return [(table, out)]

    def oracle_sql(self, table: str = "documents") -> str:
        from transferia_spark.functions.portable import sql_words

        return f"""
            WITH toks AS (
              SELECT {self.id_col}, t.w AS w
              FROM (
                SELECT {self.id_col}, {sql_words(self.text_col)} AS ws
                FROM {table}
              ), unnest(ws) AS t(w)
            ),
            tf AS (
              SELECT {self.id_col}, w, count(*)::BIGINT AS tf
              FROM toks GROUP BY 1, 2
            ),
            counts AS (SELECT w, count(*)::BIGINT AS n FROM toks GROUP BY 1),
            total AS (SELECT sum(n)::BIGINT AS tot FROM counts)
            SELECT tf.{self.id_col},
                   sum(tf.tf * floor({float(self.SCALE)} * counts.n / total.tot)::BIGINT)::BIGINT
                     AS familiarity_sum,
                   sum(tf.tf)::BIGINT AS n_tok
            FROM tf JOIN counts USING (w) CROSS JOIN total
            GROUP BY 1
        """


@register
class RepetitionScore(Transformer):
    """The two Gopher repetition rules QualityGopher doesn't cover
    (Rae et al. 2021, table A1): the fraction of characters inside the
    document's MOST FREQUENT word n-gram (default n=2), and the
    fraction of characters inside n-grams that occur MORE THAN ONCE
    (default n=5). Character coverage follows the public
    implementations' convention occurrences x len(gram), capped at
    10000 bp (overlapping occurrences are not character-deduplicated).

    Output: (id, top_ngram_bp, dup_ngram_bp). The top gram is picked by
    (max count, then max length): the coverage product count x length
    is unique under that rule, so no further tie-break can change the
    result in either engine.

    Scale shape: explode n-grams → count per (doc, gram) → per-doc
    aggregate — two doc-keyed shuffles, both map-side-combinable, keys
    uniform (doc ids). No broadcast, no driver state; the gram strings
    never leave their doc's groups.
    """

    TYPE = "repetition_score"

    def __init__(
        self,
        text_col: str,
        id_col: str,
        n_top: int = 2,
        n_dup: int = 5,
    ):
        self.text_col, self.id_col = text_col, id_col
        self.n_top, self.n_dup = n_top, n_dup

    def _gram_counts(self, df: DataFrame, n: int) -> DataFrame:
        from transferia_spark.functions.portable import shingles, words

        w = words(F.col(self.text_col))
        return (
            df.select(
                self.id_col,
                F.explode_outer(shingles(w, n)).alias("_g"),
            )
            .filter(F.col("_g").isNotNull())  # gram-less docs rejoin via base
            .groupBy(self.id_col, "_g")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )

    @staticmethod
    def _cap_bp(chars: Column, total: Column) -> Column:
        return F.when(
            total > 0, F.least(F.floor(chars * 10000 / total), F.lit(10000))
        ).otherwise(0).cast("long")

    def apply(self, table: TableID, df: DataFrame) -> Routed:
        base = df.select(
            self.id_col, F.length(F.col(self.text_col)).alias("_chars")
        )
        # top n-gram: per-doc (max count, then max length) — the
        # coverage product cnt*len is unique under that rule, so no
        # further tie-break can change the output
        top = (
            self._gram_counts(df, self.n_top)
            .groupBy(self.id_col)
            .agg(
                F.max(
                    F.struct(
                        F.col("_cnt"), F.length("_g").alias("_glen")
                    )
                ).alias("_top")
            )
            .select(
                self.id_col,
                (F.col("_top._cnt") * F.col("_top._glen")).alias("_top_chars"),
            )
        )
        dup = (
            self._gram_counts(df, self.n_dup)
            .filter(F.col("_cnt") > 1)
            .groupBy(self.id_col)
            .agg(
                F.sum(F.col("_cnt") * F.length("_g")).alias("_dup_chars")
            )
        )
        out = (
            base.join(top, self.id_col, "left")
            .join(dup, self.id_col, "left")
            .select(
                self.id_col,
                self._cap_bp(
                    F.coalesce("_top_chars", F.lit(0)), F.col("_chars")
                ).alias("top_ngram_bp"),
                self._cap_bp(
                    F.coalesce("_dup_chars", F.lit(0)), F.col("_chars")
                ).alias("dup_ngram_bp"),
            )
        )
        return [(table, out)]

    def oracle_sql(self, table: str = "documents") -> str:
        from transferia_spark.functions.portable import sql_shingles, sql_words

        w = sql_words(self.text_col)
        g_top = sql_shingles("w", self.n_top)
        g_dup = sql_shingles("w", self.n_dup)
        cap = (
            "CASE WHEN chars > 0 THEN "
            "least(floor({x} * 10000 / chars), 10000)::BIGINT ELSE 0 END"
        )
        return f"""
            WITH d AS (
              SELECT {self.id_col}, length({self.text_col}) AS chars,
                     {w} AS w
              FROM {table}
            ),
            topg AS (
              SELECT {self.id_col}, (cnt * glen)::BIGINT AS top_chars
              FROM (
                SELECT {self.id_col}, cnt, length(g) AS glen,
                       row_number() OVER (
                         PARTITION BY {self.id_col}
                         ORDER BY cnt DESC, length(g) DESC) AS rn
                FROM (
                  SELECT {self.id_col}, g.g AS g, count(*) AS cnt
                  FROM d, unnest({g_top}) AS g(g)
                  GROUP BY 1, 2
                )
              ) WHERE rn = 1
            ),
            dupg AS (
              SELECT {self.id_col}, sum(cnt * length(g))::BIGINT AS dup_chars
              FROM (
                SELECT {self.id_col}, g.g AS g, count(*) AS cnt
                FROM d, unnest({g_dup}) AS g(g)
                GROUP BY 1, 2
              ) WHERE cnt > 1
              GROUP BY 1
            )
            SELECT d.{self.id_col},
                   {cap.format(x="COALESCE(top_chars, 0)")} AS top_ngram_bp,
                   {cap.format(x="COALESCE(dup_chars, 0)")} AS dup_ngram_bp
            FROM d LEFT JOIN topg USING ({self.id_col})
                   LEFT JOIN dupg USING ({self.id_col})
        """
