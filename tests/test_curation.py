"""PII scrubbing, Gopher-style quality signals, stratified sampling."""

from pyspark.sql import functions as F

from transferia_spark.operators import build
from transferia_spark.operators.curation import sample_bucket
from transferia_spark.schema.colschema import TableID

T = TableID("", "docs")


def test_pii_scrub_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@x.io and alice@y.org, ip 192.168.0.1, call +1 800-555-0100"),
            (2, "clean text, version 1.2 is not an ip"),
        ],
        ["doc_id", "text"],
    )
    out = build("pii_scrub", text_col="text").apply_df(df).orderBy("doc_id").collect()
    assert out[0].n_email == 2 and out[0].n_ipv4 == 1 and out[0].n_phone == 1
    assert "<EMAIL>" in out[0].text and "<IP>" in out[0].text and "<PHONE>" in out[0].text
    assert "bob@x.io" not in out[0].text and "192.168.0.1" not in out[0].text
    assert out[1].n_email == 0 and out[1].n_ipv4 == 0 and out[1].n_phone == 0
    assert out[1].text == "clean text, version 1.2 is not an ip"


def test_quality_gopher_signals(spark):
    df = spark.createDataFrame(
        [
            (1, "same line\nsame line\nother"),          # 1 dup line of 3
            (2, "- a bullet\n- more...\nplain text"),    # bullets + ellipsis
            (3, "word word word word"),                  # all-dup words
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in build("quality_gopher", text_col="text").apply_df(df).collect()
    }
    assert rows[1].dup_line_bp == 3333
    assert rows[2].bullet_line_bp == 6666 and rows[2].ellipsis_line_bp == 3333
    assert rows[3].dup_word_bp == 7500  # 4 words, 1 distinct
    assert rows[3].max_word_len == 4 and rows[3].mean_word_len_x100 == 400


def test_sample_stratified_rates_and_determinism(spark):
    df = spark.range(0, 10000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    t = build(
        "sample_stratified",
        id_col="doc_id",
        stratum_col="lang",
        rates_bp={"en": 1000, "de": 9000},
    )
    out = t.apply_df(df)
    counts = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    # 5000 per stratum; hash buckets are near-uniform
    assert 350 < counts["en"] < 650
    assert 4300 < counts["de"] < 4700
    # deterministic: re-running selects exactly the same rows
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in t.apply_df(df).collect())
    assert a == b


def test_sample_bucket_matches_formula():
    import pyspark.sql.functions as F  # noqa: F811

    # spot-check the arithmetic against pure Python
    def py_bucket(i):
        return ((i % 1_000_000_007) * 2_654_435_761 + 12_345) % 1_000_000_007 % 10000

    assert py_bucket(0) == 12345 % 10000
    assert py_bucket(7) != py_bucket(8)


def test_mix_sources_hits_target_proportions(spark):
    from transferia_spark.operators import build

    df = spark.range(0, 30000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END AS source",
    )
    op = build(
        "mix_sources",
        id_col="doc_id",
        source_col="source",
        weights={"a": 3.0, "b": 1.0},
        total=4000,
        seed=5,
    )
    out = op.apply_df(df)
    counts = {r.source: r.n for r in out.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert "c" not in counts  # unweighted source drops entirely
    # quotas: a=3000, b=1000 of 10000 each; binomial tolerance ~3sigma
    assert abs(counts["a"] - 3000) < 3 * (3000 ** 0.5)
    assert abs(counts["b"] - 1000) < 3 * (1000 ** 0.5)


def test_mix_sources_small_source_keeps_everything(spark):
    from transferia_spark.operators import build

    df = spark.range(0, 100).selectExpr("id AS doc_id", "'tiny' AS source")
    out = build(
        "mix_sources", id_col="doc_id", source_col="source",
        weights={"tiny": 1.0}, total=5000, seed=0,
    ).apply_df(df)
    assert out.count() == 100  # quota 5000 > n=100: threshold caps at M


def test_mix_sources_retry_stable(spark):
    from transferia_spark.operators import build

    df = spark.range(0, 5000).selectExpr("id AS doc_id", "'s' AS source")
    op = build(
        "mix_sources", id_col="doc_id", source_col="source",
        weights={"s": 1.0}, total=1000, seed=3,
    )
    a = {r.doc_id for r in op.apply_df(df).collect()}
    b = {r.doc_id for r in op.apply_df(df.repartition(13)).collect()}
    assert a == b  # selection is content-derived, not partition-derived
