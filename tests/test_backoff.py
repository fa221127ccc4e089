"""Adaptive politeness: error_backoff_credits unit battery + a crawl
where one host's products all 404 — with adaptive_backoff the dead host
throttles to the probe rate instead of burning budget every round."""

from pyspark.sql import functions as F

from gocrawler_spark.datagen import crawl_corpus
from gocrawler_spark.operators.politeness import error_backoff_credits
from gocrawler_spark.plans.crawl import CrawlConfig, CrawlJob
from gocrawler_spark.tables.catalog import SnapshotCatalog

from .conftest import pages_df, robots_df, seeds_df


def test_error_backoff_credits_unit(spark):
    rows = []
    # host A: 100% errors in window; B: clean; C: 50/50; D: only OLD
    # rounds (outside the window -> absent from output)
    for r in (3, 4):
        rows += [(f"https://a.example/p{r}{i}", r, "OnError") for i in range(4)]
        rows += [(f"https://b.example/p{r}{i}", r, "OnResponse") for i in range(4)]
        rows += [(f"https://c.example/p{r}{i}", r,
                  "OnResponse" if i % 2 else "OnError") for i in range(4)]
    rows += [(f"https://d.example/p{i}", 1, "OnError") for i in range(4)]
    log = spark.createDataFrame(rows, "url string, round int, callback string")
    got = {
        r["host"]: r["_ad_credit"]
        for r in error_backoff_credits(
            log, base_credit=4, current_round=4, lookback_rounds=2
        ).collect()
    }
    assert got == {"a.example": 1, "b.example": 4, "c.example": 2}


def _run(spark, tmp_path, tag, **cfg_extra):
    pages, seeds, robots, hosts, profile = crawl_corpus(90, 3)
    dead = hosts[1]
    kept = [
        p for p in pages
        if not (dead in p["url"] and "detproducto" in p["url"])
    ]
    cat = SnapshotCatalog(str(tmp_path / tag), spark)
    job = CrawlJob(
        spark, cat, profile,
        CrawlConfig(credit_per_host=4, max_rounds=12, salt_parts=4,
                    n_buckets=8, **cfg_extra),
    )
    job.init_run(seeds_df(spark, seeds), robots_df(spark, robots))
    job.run(pages_df(spark, kept))
    errs_by_round = {
        r["round"]: r["n"]
        for r in cat.read("fetch_log")
        .where((F.col("callback") == "OnError")
               & F.col("url").contains(dead))
        .groupBy("round").agg(F.count("*").alias("n")).collect()
    }
    return errs_by_round


def test_crawl_adaptive_backoff_throttles_dead_host(spark, tmp_path):
    plain = _run(spark, tmp_path, "plain")
    adaptive = _run(
        spark, tmp_path, "adaptive",
        adaptive_backoff=True, backoff_lookback=2, backoff_min_credit=1,
    )
    # the dead host errors in both runs, but adaptive spends strictly
    # less budget on it overall and reaches the 1-per-round probe rate
    assert sum(plain.values()) > 0 and sum(adaptive.values()) > 0
    assert sum(adaptive.values()) < sum(plain.values())
    assert min(adaptive.values()) == 1  # throttled to backoff_min_credit
    # the static run keeps burning full credit on some round
    assert max(plain.values()) == 4
