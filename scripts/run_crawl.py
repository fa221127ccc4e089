"""spark-submit entrypoint for the crawl job (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

Local sandbox:
    python scripts/run_crawl.py --warehouse /tmp/crawl_wh --sf-dir /root/testdata/sf0.01

Cluster:
    zip -r gocrawler_spark.zip gocrawler_spark
    spark-submit --py-files gocrawler_spark.zip scripts/run_crawl.py \
        --warehouse s3://bucket/crawl_wh --pages-table <iceberg pages> ...

The script is idempotent: if the warehouse already holds a checkpointed
run it resumes from the last complete round (snapshot rollback), else it
initializes from the seed list.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from gocrawler_spark.datagen import pages_from_documents
from gocrawler_spark.plans.crawl import CrawlConfig, CrawlJob
from gocrawler_spark.session import get_spark
from gocrawler_spark.tables.catalog import SnapshotCatalog


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--credit", type=int, default=4)
    ap.add_argument("--max-rounds", type=int, default=100)
    ap.add_argument("--max-depth", type=int, default=None)
    ap.add_argument("--n-hosts", type=int, default=16)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--archive-dir", default=None,
                    help="also write WARC segments per round + a CDX index "
                         "over the whole run (Common Crawl artifact set)")
    ap.add_argument("--maintenance-every", type=int, default=0,
                    help="compact state tables and expire pre-checkpoint "
                         "snapshots every N rounds (0 = off); bounds "
                         "file/manifest growth on long runs")
    args = ap.parse_args()

    spark = get_spark(cpus=args.cpus, app_name="gocrawler-crawl")
    cat = SnapshotCatalog(args.warehouse, spark)

    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    pages, seeds, robots, profile = pages_from_documents(docs, n_hosts=args.n_hosts)
    pages = pages.cache()
    pages.count()

    cfg = CrawlConfig(credit_per_host=args.credit, max_rounds=args.max_rounds,
                      max_depth=args.max_depth, archive_dir=args.archive_dir,
                      maintenance_every=args.maintenance_every)
    job = CrawlJob(spark, cat, profile, cfg)
    # production path: rules parsed from rendered /robots.txt bodies
    # (temoto/robotstxt semantics), same as entry()
    from gocrawler_spark.datagen import robots_pages
    from gocrawler_spark.operators.robots_parse import parse_robots_pages
    from gocrawler_spark.plans.crawl import USER_AGENT

    robots_df = parse_robots_pages(robots_pages(spark, robots), user_agent=USER_AGENT)

    if args.resume and cat.exists(job._ckpt_table()):
        history = job.resume(pages, robots_df)
    else:
        seeds_df = spark.createDataFrame(
            [(s["url"], s["priority"]) for s in seeds], "url string, priority int")
        job.init_run(seeds_df, robots_df)
        history = job.run(pages)

    for m in history:
        print(json.dumps(m))
    print(json.dumps({
        "rounds": len(history),
        "fetched_total": sum(m["fetched"] for m in history),
        "items": cat.read("items").count() if cat.exists("items") else 0,
        "seen": cat.read("seen").count(),
        "archive_dir": args.archive_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
