"""The north-rule per-row invariant: HTML→text extraction byte-identical
per url to the goquery-based reference semantics (BASELINE input_hint).

``pages.text`` is the golden column; the distributed mapInPandas
extractor must reproduce it exactly for EVERY page in the corpus —
compared as raw bytes, no normalization."""

import pyspark.sql.functions as F

from gocrawler_spark.datagen import crawl_corpus
from gocrawler_spark.operators.extraction import extract_fetched

from .conftest import pages_df


def test_extracted_text_byte_identical_per_url(spark):
    pages, seeds, robots, hosts, profile = crawl_corpus(300, 10)
    pdf = pages_df(spark, pages)
    fetched = pdf.select(
        "url",
        F.md5("url").alias("url_hash"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("priority"),
        F.lit(1).alias("fetch_rank"),
        "html",
    )
    extracted = extract_fetched(fetched, profile).select(
        "url", F.col("text").alias("spark_text")
    )
    joined = pdf.select("url", "text").join(extracted, "url", "inner")
    assert joined.count() == len(pages)
    mismatches = joined.filter(
        F.encode("spark_text", "utf-8") != F.encode("text", "utf-8")
    ).count()
    assert mismatches == 0


def test_extracted_text_parity_documents_bridge(spark):
    """Same invariant over the driver-testdata bridge corpus."""
    from gocrawler_spark.datagen import pages_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pdf, seeds, robots, profile = pages_from_documents(docs, n_hosts=8)
    pdf = pdf.cache()
    n = pdf.count()
    fetched = pdf.select(
        "url",
        F.md5("url").alias("url_hash"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("priority"),
        F.lit(1).alias("fetch_rank"),
        "html",
    )
    extracted = extract_fetched(fetched, profile).select(
        "url", F.col("text").alias("spark_text")
    )
    joined = pdf.select("url", "text").join(extracted, "url", "inner")
    rows = joined.filter(F.col("spark_text") != F.col("text")).count()
    assert joined.count() == n and rows == 0


def test_script_profile(spark):
    """Writing-system routing: dominant script, letter-only fractions,
    tie and no-letter edge cases, against hand-computed expectations."""
    from gocrawler_spark.functions.text import script_profile

    cases = [
        # (text, dominant script, expected latin_frac6)
        ("Hello world café", "latin", 1.0),       # Latin incl. accents
        ("你好世界", "cjk", 0.0),                   # Han
        ("ひらがな カタカナ 漢字", "cjk", 0.0),      # kana+han fold into cjk
        ("한국어 텍스트", "cjk", 0.0),               # Hangul folds too
        ("Привет мир", "cyrillic", 0.0),
        ("مرحبا بالعالم", "arabic", 0.0),
        ("你好 hello there", "latin", 10 / 12),     # mixed: latin majority
        ("hi 你好", "latin", 0.5),                  # exact tie -> latin
        ("123 !!!", "und", 0.0),                   # no letters
        ("αβγ δέλτα", "other", 0.0),               # Greek: outside all four
    ]
    df = spark.createDataFrame([(t,) for t, *_ in cases], "t string")
    got = {
        r["t"]: r
        for r in df.select("t", script_profile("t").alias("sp"))
        .select("t", "sp.*").collect()
    }
    for t, script, lat in cases:
        r = got[t]
        assert r["script"] == script, (t, r["script"], script)
        if lat is not None:
            assert abs(r["latin_frac6"] - round(lat, 6)) < 1e-9, (t, r)
    # fractions are over letters only
    assert got["123 !!!"]["n_letters"] == 0
    assert got["Hello world café"]["n_letters"] == 14
