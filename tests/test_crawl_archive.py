"""CrawlConfig.archive_dir: a crawl run emits the Common Crawl artifact
set — per-round WARC segments plus a SURT-keyed CDX index over all
rounds — and every index row ranged-fetches exactly its record."""

import os

from gocrawler_spark.datagen import crawl_corpus
from gocrawler_spark.plans.crawl import CrawlConfig, CrawlJob
from gocrawler_spark.sources.cdx import cdx_lookup, fetch_warc_record, read_cdx
from gocrawler_spark.tables.catalog import SnapshotCatalog

from .conftest import pages_df, robots_df, seeds_df


def test_crawl_archive_warc_and_cdx(spark, tmp_path):
    pages, seeds, robots, hosts, profile = crawl_corpus(60, 3)
    arch = str(tmp_path / "archive")
    cat = SnapshotCatalog(str(tmp_path / "cat"), spark)
    job = CrawlJob(
        spark, cat, profile,
        CrawlConfig(
            credit_per_host=4, max_rounds=10, salt_parts=4, n_buckets=8,
            archive_dir=arch, archive_cdx_shards=2,
        ),
    )
    pdf = pages_df(spark, pages)
    job.init_run(seeds_df(spark, seeds), robots_df(spark, robots))
    history = job.run(pdf)
    n_fetched = sum(m["fetched"] for m in history)
    assert n_fetched > 0 and len(history) >= 2  # multi-round crawl

    # one segment dir per fetching round, r{round}-prefixed .warc.gz files
    seg_root = os.path.join(arch, "segments")
    rounds = sorted(os.listdir(seg_root))
    assert rounds == [f"round-{m['round']:05d}" for m in history]
    for m in rounds:
        files = os.listdir(os.path.join(seg_root, m))
        assert files and all(f.endswith(".warc.gz") for f in files)

    # CDX index covers every fetched record exactly once
    idx = read_cdx(spark, os.path.join(arch, "cdx", "cdx-*")).collect()
    assert len(idx) == n_fetched
    assert os.path.exists(os.path.join(arch, "cdx", "cluster.idx"))
    assert len({r["url"] for r in idx}) == n_fetched  # raw-url dedup upstream

    # every index row ranged-fetches its own record; payload matches the
    # corpus html byte-for-byte
    body_of = {
        p["url"]: (p["html"].encode() if isinstance(p["html"], str)
                   else bytes(p["html"]))
        for p in pages
    }
    for r in idx:
        seg_dir = os.path.join(
            arch, "segments", f"round-{int(r['filename'][1:6]):05d}"
        )
        headers, payload = fetch_warc_record(
            seg_dir, r["filename"], r["offset"], r["length"]
        )
        assert headers["warc-target-uri"] == r["url"]
        assert payload.endswith(body_of[r["url"]])

    # pruned per-domain lookup works against the crawl's own index
    host0 = hosts[0]
    key = ",".join(reversed(host0.split("."))) + ")"
    hits = cdx_lookup(spark, os.path.join(arch, "cdx"), key).collect()
    want = {r["url"] for r in idx if r["url"].split("/")[2] == host0}
    assert {r["url"] for r in hits} == want and len(want) > 0

    # finalize is idempotent (rebuilds the same index)
    job.finalize_archive()
    again = read_cdx(spark, os.path.join(arch, "cdx", "cdx-*")).count()
    assert again == n_fetched
