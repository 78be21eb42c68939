"""Memoized Column-tree construction for the per-batch CDC hot path.

pyspark Column objects are immutable, unresolved expression trees —
they bind to a DataFrame only at analysis, so the SAME Column list is
reusable across every micro-batch that shares a schema. Building them
is NOT free though: each ``F.col``/``F.when``/``F.struct`` is a py4j
round trip, and the collapse+merge plan for one batch costs ~0.4 s of
pure driver-side expression construction (profiled r11 — 25% of
steady-state addBatch). The shapes depend only on (schema, keys,
flags), so they memoize perfectly.

Entries key on the active SparkContext's identity: a stopped/replaced
context invalidates its gateway objects, so stale entries must never
be served across sessions (tests create several)."""

from __future__ import annotations

_CACHE: dict = {}
_MAX = 512


def cached_exprs(key: tuple, build):
    """Return ``build()``, memoized per (SparkContext, key)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        return build()  # no session — don't cache unbindable objects
    # id() alone can be REUSED after the old context is GC'd
    # (code-review r11) — pair it with the context's own identity so a
    # same-address successor can never serve the predecessor's entries.
    # The identity is memoized ON the context instance: applicationId/
    # startTime are immutable py4j PROPERTY calls (two gateway round
    # trips per cache lookup, ~15 lookups per micro-batch — profiled
    # r12), and an instance attribute dies with the instance, so id
    # reuse can never serve a stale memo
    ident = getattr(sc, "_transferia_exprcache_ident", None)
    if ident is None:
        try:
            ident = (sc.applicationId, sc.startTime)
        except Exception:
            # transient (mid-init/gateway hiccup): with NO identity we
            # cannot key safely at all — an (id(sc), None, key) entry
            # could be served to a same-address successor whose first
            # lookup also failed (code-review r12 pass 3). Build
            # uncached like the sc-is-None branch.
            return build()
        try:
            sc._transferia_exprcache_ident = ident
        except Exception:
            pass
    full = (id(sc), ident, key)
    hit = _CACHE.get(full)
    if hit is None:
        if len(_CACHE) >= _MAX:
            _CACHE.clear()
        hit = _CACHE[full] = build()
    return hit


__all__ = ["cached_exprs"]


def _jseq(df, cols, ckey: tuple):
    """Java ``Seq[Column]`` memoized under ``ckey`` — py4j's
    ListConverter costs one gateway ROUND TRIP PER ELEMENT on every
    ``select``/``agg``/``groupBy`` call (profiled r12: ~90 of the ~300
    per-merge gateway calls were list-element converts of the SAME
    cached Column objects). The seq is a plain JVM object holding
    references to the memoized Columns, so it is exactly as reusable
    as they are."""
    spark = df.sparkSession

    def build():
        sc = spark.sparkContext
        return sc._jvm.PythonUtils.toSeq([c._jc for c in cols])

    return cached_exprs(("jseq",) + ckey, build)


def fast_select(df, cols, ckey: tuple):
    """``df.select(*cols)`` through one gateway call with a cached
    Seq; falls back to the public API on any internals mismatch."""
    try:
        cls = type(df)
        return cls(df._jdf.select(_jseq(df, cols, ckey)),
                   df.sparkSession)
    except Exception:
        return df.select(*cols)


def fast_group_agg(df, group_cols, aggs, ckey: tuple):
    """``df.groupBy(*group_cols).agg(*aggs)`` in two gateway calls
    (cached Seqs; Scala's ``agg(expr, exprs*)`` takes head + tail)."""
    try:
        cls = type(df)
        jgd = df._jdf.groupBy(_jseq(df, group_cols, ckey + ("g",)))
        jdf = jgd.agg(aggs[0]._jc,
                      _jseq(df, aggs[1:], ckey + ("a",)))
        return cls(jdf, df.sparkSession)
    except Exception:
        return df.groupBy(*group_cols).agg(*aggs)


def fast_sort_within(df, cols, ckey: tuple):
    """``df.sortWithinPartitions(*cols)`` through one gateway call."""
    try:
        cls = type(df)
        return cls(
            df._jdf.sortWithinPartitions(_jseq(df, cols, ckey)),
            df.sparkSession,
        )
    except Exception:
        return df.sortWithinPartitions(*cols)
