"""Per-phase profiler for the two anti-scaling bench rows (r14 verdict
item 1): dedup_incremental_store and dedup_ngram_jaccard. Runs each
query's phases with individual wall-clock timing at the current
$SPARK_GRAFT_CPUS so the 8-core vs 32-core gap can be attributed to a
phase, not guessed at.

Usage: python scripts/profile_store_r15.py [store|jaccard|both] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transferia_spark import get_spark  # noqa: E402
from transferia_spark.operators import build  # noqa: E402
from transferia_spark.session import load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MINHASH = dict(n=3, k=32, bands=8)
INCR_NEW_MOD = 7


def t(label, fn, out):
    t0 = time.time()
    r = fn()
    dt = round(time.time() - t0, 3)
    out[label] = out.get(label, 0.0) + dt
    return r


def profile_store(spark, out):
    from pyspark.sql import functions as F

    from transferia_spark.operators.dedup import BandIndexStore

    d = load_tables(spark, SF_DIR, ["documents"])["documents"]
    base = d.filter(f"doc_id % {INCR_NEW_MOD} NOT IN (0, 3)")
    batch_a = d.filter(f"doc_id % {INCR_NEW_MOD} = 3")
    batch_b = d.filter(f"doc_id % {INCR_NEW_MOD} = 0")
    dd = build("dedup_incremental", text_col="text", id_col="doc_id", **MINHASH)
    store = BandIndexStore(
        spark, tempfile.mkdtemp(prefix="prof_band_"),
        n_shards=int(os.environ.get("PROF_N_SHARDS", "0")) or None,
    )
    t("seed_append", lambda: store.append(dd.band_index(base)), out)
    t("ingest_a", lambda: store.ingest(dd, batch_a), out)
    t("compact", lambda: store.compact(), out)
    pairs_b = t("ingest_b", lambda: store.ingest(dd, batch_b), out)
    t("final_count", lambda: pairs_b.count(), out)


def profile_jaccard(spark, out):
    from pyspark.sql import functions as F

    from transferia_spark.operators.dedup import (
        _bucket_pairs,
        shingled_docs,
    )

    d = load_tables(spark, SF_DIR, ["documents"])["documents"]
    shd = shingled_docs(d, "text", "doc_id", 3).select(
        "doc_id", F.array_distinct("_sh").alias("_shd")
    )
    postings = shd.select(
        "doc_id", F.size("_shd").alias("_sz"), F.explode_outer("_shd").alias("_s")
    )
    t(
        "postings_noop",
        lambda: postings.write.format("noop").mode("overwrite").save(),
        out,
    )
    bp = _bucket_pairs(postings, "_s", ["doc_id", "_sz"], 1000)
    t(
        "bucket_pairs_noop",
        lambda: bp.write.format("noop").mode("overwrite").save(),
        out,
    )
    full = build(
        "dedup_ngram_jaccard", text_col="text", id_col="doc_id",
        n=3, min_bp=200,
    ).apply_df(d)
    t("full_count", lambda: full.count(), out)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("profile_r15")
    load_tables(spark, SF_DIR, ["region"])["region"].count()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    for rep in range(reps):
        out: dict = {"cpus": cpus, "rep": rep}
        if which in ("store", "both"):
            profile_store(spark, out)
        if which in ("jaccard", "both"):
            profile_jaccard(spark, out)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
