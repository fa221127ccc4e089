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
