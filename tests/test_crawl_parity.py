"""Crawl-loop parity: the Spark round job must reproduce the golden
single-threaded simulator exactly — seen set, fetch order, items store,
fetch_log, final frontier (SURVEY §5.3, north rule)."""

import pytest

from gocrawler_spark.datagen import crawl_corpus
from gocrawler_spark.plans.crawl import CrawlConfig, CrawlJob
from gocrawler_spark.sim.simulator import SimConfig, SimResult, simulate
from gocrawler_spark.tables.catalog import SnapshotCatalog

from .conftest import pages_df, robots_df, seeds_df

N_PAGES, N_HOSTS, CREDIT = 240, 8, 6


@pytest.fixture(scope="module")
def corpus():
    pages, seeds, robots, hosts, profile = crawl_corpus(N_PAGES, N_HOSTS)
    # drop some product pages to exercise the OnError path (keep seeds)
    seed_urls = {s["url"] for s in seeds}
    kept = [p for i, p in enumerate(pages) if i % 17 != 0 or p["url"] in seed_urls]
    return kept, seeds, robots, profile


@pytest.fixture(scope="module")
def golden(corpus) -> SimResult:
    kept, seeds, robots, profile = corpus
    return simulate(
        {p["url"]: p["html"] for p in kept},
        seeds,
        robots,
        profile,
        SimConfig(credit_per_host=CREDIT, max_rounds=60),
    )


def run_spark_crawl(spark, tmpdir, corpus, bloom_min_seen=10**9, max_rounds=60, **cfg_extra):
    kept, seeds, robots, profile = corpus
    cat = SnapshotCatalog(str(tmpdir), spark)
    job = CrawlJob(
        spark,
        cat,
        profile,
        CrawlConfig(
            credit_per_host=CREDIT,
            max_rounds=max_rounds,
            salt_parts=4,
            n_buckets=8,
            bloom_min_seen=bloom_min_seen,
            bloom_bits=1 << 18,
            **cfg_extra,
        ),
    )
    pages = pages_df(spark, kept)
    job.init_run(seeds_df(spark, seeds), robots_df(spark, robots))
    history = job.run(pages)
    return cat, job, history


def _quarantine(cat):
    if not cat.exists("quarantine"):
        return set()
    return {r["url"] for r in cat.read("quarantine").collect()}


def _spark_state(cat):
    seen = {r["url"] for r in cat.read("seen").collect()}
    log = sorted(
        (r["round"], r["seq"], r["url"], r["callback"]) for r in cat.read("fetch_log").collect()
    )
    items = {}
    for r in cat.read("items").collect():
        items[r["id"]] = (
            r["name"], r["brand"], r["description"], r["price_cents"],
            r["rating"],
            tuple((v["title"], v["content"], v["author"], v["stars"]) for v in r["reviews"]),
            r["source_store"], r["url"], dict(r["details"]),
        )
    frontier = {r["url"] for r in cat.read("frontier").collect()}
    return seen, log, items, frontier


def _golden_state(g: SimResult):
    seen = set(g.seen.keys())
    log = sorted(
        (r["round"], r["seq"], r["url"], r["callback"]) for r in g.fetch_log
    )
    items = {}
    for iid, it in g.items.items():
        items[iid] = (
            it["name"], it["brand"], it["description"], it["price_cents"],
            it["rating"],
            tuple((v["title"], v["content"], v["author"], v["stars"]) for v in it["reviews"]),
            it["source_store"], it["url"], dict(it["details"]),
        )
    frontier = {r["url"] for r in g.frontier}
    return seen, log, items, frontier


def test_crawl_matches_golden_exact_antijoin(spark, tmp_path, corpus, golden):
    cat, job, history = run_spark_crawl(spark, tmp_path / "exact", corpus)
    s_seen, s_log, s_items, s_frontier = _spark_state(cat)
    g_seen, g_log, g_items, g_frontier = _golden_state(golden)
    assert s_seen == g_seen
    assert s_frontier == g_frontier == set()  # crawl drains
    assert s_log == g_log  # fetch order parity (round, seq, url, callback)
    assert s_items.keys() == g_items.keys()
    for iid in g_items:
        assert s_items[iid] == g_items[iid], iid
    assert golden.rounds == len(history)
    # S9 quarantine path: captcha pages exist in the corpus and both sides
    # quarantine the same URLs
    assert _quarantine(cat) == set(golden.quarantine) != set()


def test_crawl_matches_golden_with_bloom(spark, tmp_path, corpus, golden):
    # bloom prefilter path must be result-identical (bloom = perf only)
    cat, job, history = run_spark_crawl(spark, tmp_path / "bloom", corpus, bloom_min_seen=0)
    s_seen, s_log, _, s_frontier = _spark_state(cat)
    g_seen, g_log, _, g_frontier = _golden_state(golden)
    assert s_seen == g_seen
    assert s_log == g_log
    assert s_frontier == g_frontier == set()


def test_crawl_no_broadcast_path_and_lineage(spark, tmp_path, corpus, golden):
    """broadcast_fetch_max=0 forces the shuffle fetch join (the 10^8-host
    path) — results must be identical; and the fetch_log must carry the
    full requestTracker lineage row (requestTracker.go:14-27): method,
    start/end/duration, E18 headers, J5 cookies."""
    cat, job, _ = run_spark_crawl(
        spark, tmp_path / "nobc", corpus, broadcast_fetch_max=0
    )
    s_seen, s_log, _, s_frontier = _spark_state(cat)
    g_seen, g_log, _, g_frontier = _golden_state(golden)
    assert s_seen == g_seen
    assert s_log == g_log
    assert s_frontier == g_frontier == set()

    log = cat.read("fetch_log")
    cols = set(log.columns)
    assert {"method", "start_at", "end_at", "duration_ms",
            "user_agent", "headers", "cookies"} <= cols
    rows = log.collect()
    assert all(r["method"] == "GET" for r in rows)
    for r in rows:
        # duration consistency + timeout bound (scraper.go:92-99)
        ms = (r["end_at"] - r["start_at"]).total_seconds() * 1000
        assert round(ms) == r["duration_ms"]
        assert 50 <= r["duration_ms"] < 30_000
        assert r["headers"]["DNT"] == "1" and "Accept" in r["headers"]
        assert r["user_agent"].startswith("Mozilla/5.0")
        assert r["cookies"] == {}
    # timing is a pure function of (url, round): same url+round -> same
    # start_at across OnResponse/OnError and across reruns
    by_key = {}
    for r in rows:
        by_key.setdefault((r["url"], r["round"]), set()).add(r["start_at"])
    assert all(len(v) == 1 for v in by_key.values())


def test_resume_from_checkpoint(spark, tmp_path, corpus, golden):
    kept, seeds, robots, profile = corpus
    cfg = dict(credit_per_host=CREDIT, salt_parts=4, n_buckets=8, bloom_bits=1 << 18)
    cat = SnapshotCatalog(str(tmp_path / "resume"), spark)
    pages = pages_df(spark, kept)

    job1 = CrawlJob(spark, cat, profile, CrawlConfig(max_rounds=3, **cfg))
    job1.init_run(seeds_df(spark, seeds), robots_df(spark, robots))
    job1.run(pages)

    # simulate a crash mid-round-4: frontier got clobbered after the last
    # complete checkpoint — resume must roll back to the round-3 vector
    import pyspark.sql.functions as F

    garbage = cat.read("frontier").limit(1).withColumn("url", F.lit("x"))
    cat.overwrite("frontier", garbage)

    job2 = CrawlJob(spark, cat, profile, CrawlConfig(max_rounds=60, **cfg))
    job2.resume(pages, robots_df(spark, robots))

    s_seen, s_log, s_items, s_frontier = _spark_state(cat)
    g_seen, g_log, g_items, g_frontier = _golden_state(golden)
    assert s_seen == g_seen
    assert s_log == g_log
    assert s_items == g_items
    assert s_frontier == g_frontier == set()


def test_crawl_with_maintenance_parity_and_resume(spark, tmp_path, corpus, golden):
    """maintenance_every=1 (compact + expire after every round) must be
    result-invisible — full golden parity — while bounding the state
    tables' data-dir count, and resume must still roll back to the last
    checkpoint even though maintenance committed snapshots after it."""
    import json
    import os

    import pyspark.sql.functions as F

    from gocrawler_spark.tables.catalog import SnapshotCatalog as Cat

    cat, job, history = run_spark_crawl(
        spark, tmp_path / "maint", corpus, maintenance_every=1
    )
    s_seen, s_log, s_items, s_frontier = _spark_state(cat)
    g_seen, g_log, g_items, g_frontier = _golden_state(golden)
    assert s_seen == g_seen
    assert s_log == g_log
    assert s_items == g_items
    assert s_frontier == g_frontier == set()
    # dir growth is bounded: after the final maintenance at most the
    # compact root plus the last (done-probe) round's deltas remain —
    # NOT one spray per round
    for t in ("seen", "fetch_log", "items"):
        man = cat._manifest(t, cat.current_snapshot(t))
        assert len(man["dirs"]) <= 3, (t, man["dirs"])
        roots = os.listdir(os.path.join(cat._tdir(t), "data"))
        assert len(roots) <= 4, (t, len(roots), golden.rounds)
        # expired history really is gone from _meta
        assert len(cat.snapshots(t)) < golden.rounds + 2

    # resume after a crash: maintenance ran after the last checkpoint,
    # so current > checkpointed snapshot; rollback target must be alive
    cfg = dict(credit_per_host=CREDIT, salt_parts=4, n_buckets=8,
               bloom_bits=1 << 18, maintenance_every=1)
    cat2 = Cat(str(tmp_path / "maint_resume"), spark)
    job1 = CrawlJob(spark, cat2, corpus[3], CrawlConfig(max_rounds=3, **cfg))
    job1.init_run(seeds_df(spark, corpus[1]), robots_df(spark, corpus[2]))
    job1.run(pages_df(spark, corpus[0]))
    ck = json.loads(
        cat2.read(f"checkpoints_{job1.run_id}")
        .orderBy(F.col("round").desc()).limit(1).collect()[0]["snapshots"]
    )
    for t, snap in ck.items():
        assert cat2.current_snapshot(t) >= snap  # maintenance committed after
        assert snap in cat2.snapshots(t)  # ...but the rollback target is retained
    garbage = cat2.read("frontier").limit(1).withColumn("url", F.lit("x"))
    cat2.overwrite("frontier", garbage)
    job2 = CrawlJob(spark, cat2, corpus[3], CrawlConfig(max_rounds=60, **cfg))
    job2.resume(pages_df(spark, corpus[0]), robots_df(spark, corpus[2]))
    r_seen, r_log, r_items, r_frontier = _spark_state(cat2)
    assert r_seen == g_seen
    assert r_log == g_log
    assert r_items == g_items
    assert r_frontier == set()


def test_amazon_profile_crawl(spark, tmp_path):
    """End-to-end loop with the AMAZON profile: exercises the pandas-UDF
    admission path (non-java_safe regexes), result-slot link extraction,
    review extraction, and captcha quarantine."""
    from gocrawler_spark.datagen import (
        AMAZON_CAPTCHA_HTML,
        AMAZON_PRODUCT_HTML,
        AMAZON_PRODUCT_URL,
    )
    from gocrawler_spark.profiles import AMAZON

    search_url = "https://www.amazon.com.mx/s?k=macbook"
    prod2 = "https://www.amazon.com.mx/Gildan-Camiseta/dp/B077ZKK9YB/ref=sr_1_1"
    captcha_url = "https://www.amazon.com.mx/errors/x/dp/B000000000/y"
    search_html = f"""<html><body>
<div class="s-main-slot s-result-list s-search-results sg-row">
  <a href="{AMAZON_PRODUCT_URL}">macbook</a>
  <a href="/Gildan-Camiseta/dp/B077ZKK9YB/ref=sr_1_1">camiseta</a>
  <a href="{captcha_url}">weird</a>
  <a href="https://other.example/dp/XXXXXXXXXX/x">offsite</a>
</div>
<a href="https://www.amazon.com.mx/s?k=ignored&page=2&x">next</a>
</body></html>"""
    prod2_html = AMAZON_PRODUCT_HTML.replace('Apple MacBook Air 13"', "Camiseta Gildan")
    pages = {
        search_url: search_html.encode(),
        AMAZON_PRODUCT_URL: AMAZON_PRODUCT_HTML.encode(),
        prod2: prod2_html.encode(),
        captcha_url: AMAZON_CAPTCHA_HTML.encode(),
    }
    seeds = [{"url": search_url, "priority": 0}]
    robots = [{"host": "www.amazon.com.mx", "agent": "*", "rule": "allow",
               "path_prefix": "/", "crawl_delay_ms": 0}]
    golden = simulate(pages, seeds, robots, AMAZON,
                      SimConfig(credit_per_host=4, max_rounds=10))
    assert set(golden.quarantine) == {captcha_url}
    assert len(golden.items) == 2

    cat = SnapshotCatalog(str(tmp_path), spark)
    job = CrawlJob(spark, cat, AMAZON,
                   CrawlConfig(credit_per_host=4, max_rounds=10, salt_parts=2, n_buckets=4))
    pages_rows = [{"url": u, "warc_ts": __import__("datetime").datetime(2024, 1, 1),
                   "html": h, "text": "", "lang": "es"} for u, h in pages.items()]
    job.init_run(seeds_df(spark, seeds), robots_df(spark, robots))
    job.run(pages_df(spark, pages_rows))

    s_seen, s_log, s_items, s_frontier = _spark_state(cat)
    g_seen, g_log, g_items, g_frontier = _golden_state(golden)
    assert s_seen == g_seen
    assert s_log == g_log
    assert s_items == g_items
    assert _quarantine(cat) == {captcha_url}


def test_budgeted_politeness_parity(spark, tmp_path, corpus):
    """Per-host credits from crawl_delay_ms (round budget semantics):
    heterogeneous delays still match the golden simulator exactly."""
    kept, seeds, robots, profile = corpus
    # heterogeneous delays: 500..4000ms by host index
    robots2 = []
    for k, r in enumerate(robots):
        r2 = dict(r)
        r2["crawl_delay_ms"] = 500 * (1 + k % 8)
        robots2.append(r2)
    budget = 6000  # credits 12,6,4,3,2,2,1,1
    golden = simulate(
        {p["url"]: p["html"] for p in kept}, seeds, robots2, profile,
        SimConfig(credit_per_host=CREDIT, max_rounds=80, round_budget_ms=budget),
    )
    cat = SnapshotCatalog(str(tmp_path / "budget"), spark)
    job = CrawlJob(
        spark, cat, profile,
        CrawlConfig(credit_per_host=CREDIT, max_rounds=80, salt_parts=4,
                    n_buckets=8, round_budget_ms=budget),
    )
    job.init_run(seeds_df(spark, seeds), robots_df(spark, robots2))
    job.run(pages_df(spark, kept))
    s_seen, s_log, _, s_frontier = _spark_state(cat)
    g_seen, g_log, _, g_frontier = _golden_state(golden)
    assert s_seen == g_seen
    assert s_log == g_log
    assert s_frontier == g_frontier == set()


def test_entry_default_crawl_respects_crawl_delay(spark):
    """VERDICT r3 #3: the flagship entry() crawl must let parsed
    Crawl-delay shape per-host credits by default. The entry fixture's
    slow hosts (3000 ms, k%5==2) may fetch at most 12000/3000 = 4 URLs
    per round while base-delay hosts (1500 ms) may fetch 8 — and both
    caps must actually bind somewhere in the run."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from gocrawler_spark.operators.frontier import _host_of

    cat = entrymod._run_crawl(spark, "/root/testdata/sf0.001", max_rounds=3)
    log = cat.read("fetch_log").filter(F.col("callback") == "OnResponse")
    per = (
        log.select(_host_of(F.col("url")).alias("host"), "round")
        .groupBy("host", "round")
        .count()
        .collect()
    )
    assert per, "entry crawl fetched nothing"

    def host_k(host: str) -> int:
        import re

        return int(re.search(r"(\d+)", host).group(1))

    slow_max = fast_max = 0
    for r in per:
        k = host_k(r["host"])
        cap = 4 if k % 5 == 2 else 8
        assert r["count"] <= cap, f"{r['host']} round {r['round']}: {r['count']} > {cap}"
        if k % 5 == 2:
            slow_max = max(slow_max, r["count"])
        else:
            fast_max = max(fast_max, r["count"])
    assert slow_max == 4, f"slow-host cap never bound (max {slow_max})"
    assert fast_max == 8, f"fast-host cap never bound (max {fast_max})"


def test_crawl_parity_with_ipv6_host(spark, tmp_path):
    """VERDICT r3 #8: a bracketed-IPv6 host runs the FULL crawl —
    admission, robots grouping, politeness windows, seq assignment,
    item extraction — and matches the golden simulator exactly."""
    from gocrawler_spark.datagen import crawl_corpus
    from gocrawler_spark.profiles import synthetic_profile

    V6 = "[2001:db8::7]"
    pages, seeds, robots, hosts, _ = crawl_corpus(80, 4)
    old = hosts[1]

    def fix(s: str) -> str:
        return s.replace(old, V6)

    pages2 = [
        {**p, "url": fix(p["url"]), "html": fix(p["html"].decode()).encode(),
         "text": fix(p["text"])}
        for p in pages
    ]
    seeds2 = [{**s, "url": fix(s["url"])} for s in seeds]
    robots2 = [{**r, "host": fix(r["host"])} for r in robots]
    hosts2 = [fix(h) for h in hosts]
    profile = synthetic_profile(tuple(hosts2))
    assert V6 in profile.allowed_domains

    golden = simulate(
        {p["url"]: p["html"] for p in pages2}, seeds2, robots2, profile,
        SimConfig(credit_per_host=CREDIT, max_rounds=60),
    )
    # the IPv6 host must actually participate (seed host 0 links cross-host)
    v6_fetches = [r for r in golden.fetch_log if V6 in r["url"]]
    assert v6_fetches, "IPv6 host never crawled — fixture broken"

    cat = SnapshotCatalog(str(tmp_path / "v6"), spark)
    job = CrawlJob(
        spark, cat, profile,
        CrawlConfig(credit_per_host=CREDIT, max_rounds=60, salt_parts=4,
                    n_buckets=8),
    )
    job.init_run(seeds_df(spark, seeds2), robots_df(spark, robots2))
    job.run(pages_df(spark, pages2))
    s_seen, s_log, s_items, s_frontier = _spark_state(cat)
    g_seen, g_log, g_items, g_frontier = _golden_state(golden)
    assert s_seen == g_seen
    assert s_log == g_log
    assert s_items == g_items
    assert s_frontier == g_frontier == set()
