"""The round-4 verdict's #4: the standalone frontier-analytics operators
(crawl-trap detection, host-PageRank priorities, recrawl scheduling)
wired into the crawl loop as opt-in CrawlConfig knobs — matching the
reference, where every admission gate acts inside the fetch loop
(/root/reference/pkg/scraper/scraper.go:80-105). Each test drives a
full CrawlJob and asserts through fetch_log lineage; the default path
is pinned unchanged by tests/test_crawl_parity.py."""

from pyspark.sql import functions as F

from gocrawler_spark.datagen import crawl_corpus
from gocrawler_spark.plans.crawl import CrawlConfig, CrawlJob
from gocrawler_spark.tables.catalog import SnapshotCatalog

from .conftest import pages_df, robots_df, seeds_df

TRAP_N = 160


def _trap_seeds(seeds, hosts):
    """Plant a crawler trap on hosts[1]: TRAP_N admission-passing
    product URLs that all collapse to ONE url template (the sku digits
    are the only difference). No pages exist for them, so without trap
    detection they burn budget as OnError fetches."""
    trap_host = hosts[1]
    planted = [
        {
            "url": f"https://{trap_host}/Mixup/detproducto.aspx?sku="
            f"{900000000000 + i}",
            "priority": 0,
        }
        for i in range(TRAP_N)
    ]
    return seeds + planted, trap_host


def _run_crawl(spark, tmp_path, tag, seeds, pages, robots, profile, **cfg):
    cat = SnapshotCatalog(str(tmp_path / tag), spark)
    job = CrawlJob(
        spark,
        cat,
        profile,
        CrawlConfig(
            credit_per_host=4, max_rounds=6, salt_parts=4, n_buckets=8, **cfg
        ),
    )
    job.init_run(seeds_df(spark, seeds), robots_df(spark, robots))
    job.run(pages_df(spark, pages))
    return cat


def test_trap_detection_starves_trap_host(spark, tmp_path):
    pages, seeds, robots, hosts, profile = crawl_corpus(60, 3)
    seeds, trap_host = _trap_seeds(seeds, hosts)

    # control: without detection the planted URLs ARE selected and
    # burn politeness budget as 404s
    plain = _run_crawl(
        spark, tmp_path, "plain", seeds, pages, robots, profile
    )
    plain_trap_fetches = (
        plain.read("fetch_log")
        .where(F.col("url").contains("sku=9000"))
        .count()
    )
    assert plain_trap_fetches > 0

    # guarded: the trap host (TRAP_N urls, 1 template) is anti-joined
    # out of every round's selection — zero lineage rows for the whole
    # host, planted or legit
    guarded = _run_crawl(
        spark,
        tmp_path,
        "guarded",
        seeds,
        pages,
        robots,
        profile,
        trap_detection=True,
        trap_min_urls=100,
        trap_max_per_template=50,
    )
    log = guarded.read("fetch_log")
    assert log.where(F.col("url").contains(trap_host)).count() == 0
    # non-trap hosts crawl normally
    assert log.where(~F.col("url").contains(trap_host)).count() > 0
    # starved, not dropped: the trap host's URLs stay in the frontier
    assert (
        guarded.read("frontier").where(F.col("host") == trap_host).count()
        >= TRAP_N
    )


def test_rank_hosts_orders_fetches_by_pagerank_tier(spark, tmp_path):
    from gocrawler_spark.operators.graph import pagerank, rank_priorities

    pages, seeds, robots, hosts, profile = crawl_corpus(90, 3)
    cfg = dict(rank_hosts=True, rank_levels=10, rank_iters=20)
    cat = _run_crawl(
        spark, tmp_path, "ranked", seeds, pages, robots, profile, **cfg
    )

    # For each round r the loop ranked with the edges of rounds < r
    # (the append carries a round column exactly so this is replayable).
    # Find a round whose product-class fetches span >= 2 hosts with
    # different tiers and assert the seq order matches the tier order:
    # product URLs are all static class 0, so within the class a
    # higher-tier host's first fetch must precede every lower-tier
    # host's first fetch.
    all_edges = cat.read("host_edges").cache()
    log = cat.read("fetch_log").cache()
    checked = 0
    for rnd in range(2, 7):
        edges = (
            all_edges.where(F.col("round") < rnd)
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
        )
        if edges.count() == 0:
            continue
        tiers = {
            r["id"]: r["priority"]
            for r in rank_priorities(
                pagerank(edges, fixed_iters=20), levels=10
            ).collect()
        }
        by_host = {
            r["h"]: r["min_seq"]
            for r in log.where(
                (F.col("round") == rnd) & F.col("url").contains("detproducto")
            )
            .withColumn("h", F.regexp_extract("url", r"https://([^/]+)/", 1))
            .groupBy("h")
            .agg(F.min("seq").alias("min_seq"))
            .collect()
        }
        ranked_hosts = [h for h in by_host if h in tiers]
        if len(ranked_hosts) < 2 or len({tiers[h] for h in ranked_hosts}) < 2:
            continue
        for a in ranked_hosts:
            for b in ranked_hosts:
                if tiers[a] > tiers[b]:  # a more important than b
                    assert by_host[a] < by_host[b], (rnd, a, b, tiers, by_host)
        checked += 1
    all_edges.unpersist()
    log.unpersist()
    assert checked >= 1  # at least one round exercised the ordering

    # selection-only: the frontier table keeps static priorities
    mx = cat.read("frontier").agg(F.max("priority")).first()[0]
    assert mx is None or mx <= 1


def test_recrawl_budget_refetches_seen_urls(spark, tmp_path):
    pages, seeds, robots, hosts, profile = crawl_corpus(60, 3)

    plain = _run_crawl(
        spark, tmp_path, "norecrawl", seeds, pages, robots, profile
    )
    # the seen-set guarantees the default path never re-fetches a URL
    assert (
        plain.read("fetch_log")
        .groupBy("url")
        .count()
        .where(F.col("count") > 1)
        .count()
        == 0
    )

    cat = _run_crawl(
        spark,
        tmp_path,
        "recrawl",
        seeds,
        pages,
        robots,
        profile,
        recrawl_budget=2,
    )
    log = cat.read("fetch_log").where(F.col("callback") == "OnResponse")
    redone = (
        log.groupBy("url")
        .agg(F.count("*").alias("n"), F.count_distinct("round").alias("r"))
        .where((F.col("n") > 1) & (F.col("r") > 1))
    )
    assert redone.count() > 0  # same URL fetched OK in two different rounds
    # digest history exists and carries one row per (url, round) fetch
    dig = cat.read("page_digests")
    assert dig.count() > 0
    assert dig.select("url", "fetch_ts").distinct().count() == dig.count()
    # transient: re-fetch candidates never leak into the frontier table
    # — no frontier row is a URL that has already been fetched (the
    # default loop holds this too: selected rows leave the frontier)
    leaked = cat.read("frontier").join(
        cat.read("fetch_log").select("url").distinct(), "url", "inner"
    )
    assert leaked.count() == 0
