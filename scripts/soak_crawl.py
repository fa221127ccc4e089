"""Long-running-frontier soak: many crawl rounds with maintenance on,
archive on, then a resume — the operational profile of a production
frontier (north rule: "resumable from checkpoint ... long-running").

Evidence captured per round: wall time, fetched count, and the state
tables' file/snapshot footprint. The run executes TWICE — maintenance
on vs off, same inputs — because the footprint of a healthy maintained
run still grows with DATA (the seen set is monotone; bucketed compacts
write one file per populated bucket; the retention window keeps the
rollback target's dirs alive), so the honest invariant is relative:
the maintained run's final file/snapshot counts must be well below the
unmaintained run's O(rounds × buckets) growth, with per-round wall
time stable. The maintained run is then resumed from its final
checkpoint for two more rounds to prove maintenance snapshots never
orphan the rollback target (the Iceberg rewrite_data_files +
expire_snapshots discipline). Two further invariants ride along: both
arms must fetch IDENTICAL totals (maintenance never perturbs crawl
results), and the main runs must stop before frontier exhaustion so
the resume does real work (--rounds must sit below the corpus's
exhaustion point; the sf0.01/16-host corpus exhausts at round 25).

Usage: python scripts/soak_crawl.py [--rounds 20] [--sf-dir .../sf0.01]
Prints one JSON summary line; exits non-zero if the relative-footprint,
round-time-stability, determinism, or resume invariants fail.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gocrawler_spark.datagen import pages_from_documents, robots_pages
from gocrawler_spark.operators.robots_parse import parse_robots_pages
from gocrawler_spark.plans.crawl import USER_AGENT, CrawlConfig, CrawlJob, STATE_TABLES
from gocrawler_spark.session import get_spark
from gocrawler_spark.tables.catalog import SnapshotCatalog


def _footprint(cat, tables):
    files = snaps = 0
    for t in tables:
        if not cat.exists(t):
            continue
        snaps += len(cat.snapshots(t))
        for root, _dirs, names in os.walk(os.path.join(cat._tdir(t), "data")):
            files += sum(1 for n in names if n.endswith(".parquet"))
    return files, snaps


def _soak(spark, args, pages, seeds, robots_df, profile, maintenance_every):
    wh = tempfile.mkdtemp(prefix="gocrawler_soak_")
    cat = SnapshotCatalog(os.path.join(wh, "tables"), spark)
    cfg = CrawlConfig(credit_per_host=2, max_rounds=args.rounds,
                      salt_parts=8, n_buckets=16,
                      maintenance_every=maintenance_every,
                      archive_dir=os.path.join(wh, "archive"))
    job = CrawlJob(spark, cat, profile, cfg)
    seeds_df = spark.createDataFrame(
        [(s["url"], s["priority"]) for s in seeds], "url string, priority int")
    job.init_run(seeds_df, robots_df)

    tables = list(STATE_TABLES)
    times, fetched, files_hist, snaps_hist = [], [], [], []
    done = False
    rnd = 1
    while rnd <= cfg.max_rounds:
        t0 = time.time()
        m = job.run_round(rnd, pages)
        # mirror CrawlJob.run()'s ordering exactly: the done-probe round
        # breaks BEFORE maintenance, so soak footprint numbers match
        # what a production run() produces (ADVICE r5)
        if not m.get("done") and cfg.maintenance_every and rnd % cfg.maintenance_every == 0:
            job.maintain()
        times.append(round(time.time() - t0, 3))
        fetched.append(m["fetched"])
        f, s = _footprint(cat, tables)
        files_hist.append(f)
        snaps_hist.append(s)
        if m.get("done"):
            done = True
            break
        rnd += 1
    job.finalize_archive()
    k = max(1, len(times) // 2)
    return {
        "rounds": len(times),
        "done": done,
        "fetched_total": int(sum(fetched)),
        "sec_per_round_first_half": round(sum(times[:k]) / k, 3),
        "sec_per_round_second_half": round(sum(times[k:]) / max(1, len(times[k:])), 3),
        "files_final": files_hist[-1],
        "files_max": max(files_hist),
        "snapshots_final": snaps_hist[-1],
    }, cat, profile, robots_df


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--maintenance-every", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark(cpus=args.cpus, app_name="gocrawler-soak",
                      shuffle_partitions=max(args.cpus, 8))
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    pages, seeds, robots, profile = pages_from_documents(docs, n_hosts=16)
    pages = pages.cache()
    pages.count()
    robots_df = parse_robots_pages(robots_pages(spark, robots), user_agent=USER_AGENT)

    kept, cat, profile, robots_df = _soak(
        spark, args, pages, seeds, robots_df, profile, args.maintenance_every)
    raw, _cat2, _p, _r = _soak(spark, args, pages, seeds, robots_df, profile, 0)

    # resume the MAINTAINED run from its final checkpoint: two more rounds
    cfg2 = CrawlConfig(credit_per_host=2, max_rounds=kept["rounds"] + 2,
                       salt_parts=8, n_buckets=16,
                       maintenance_every=args.maintenance_every)
    job2 = CrawlJob(spark, cat, profile, cfg2)
    resumed = job2.resume(pages, robots_df)

    out = {
        "maintained": kept,
        "unmaintained": raw,
        "files_ratio": round(kept["files_final"] / max(1, raw["files_final"]), 3),
        "snapshots_ratio": round(
            kept["snapshots_final"] / max(1, raw["snapshots_final"]), 3),
        "resumed_rounds": len(resumed),
        "resumed_fetched": int(sum(m["fetched"] for m in resumed)),
    }
    ok = (
        out["files_ratio"] < 0.5
        and out["snapshots_ratio"] < 0.5
        and kept["sec_per_round_second_half"]
        <= 1.5 * max(0.5, kept["sec_per_round_first_half"])
        and kept["fetched_total"] == raw["fetched_total"]
        and not kept["done"]  # resume below must have frontier work left
        and out["resumed_rounds"] >= 1
        and out["resumed_fetched"] >= 1
    )
    out["pass"] = bool(ok)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
