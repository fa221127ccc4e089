"""Structured Streaming ingestion of frontier candidates.

The crawl loop itself is a driver-side micro-batch loop with atomic
snapshot commits (plans/crawl.py) — the controllable form of
"Structured-Streaming-style" the north rule asks for. This module adds
the genuine ``readStream`` path for the ingestion side: an unbounded
candidate stream (e.g. sitemap pings, queue topics) admitted and
deduped into the frontier incrementally via ``foreachBatch``, with
exactly the same admission + seen anti-join operators as the batch
round — one code path, two arrival modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.frontier import admission_filter, is_product_url, normalize_candidates
from ..operators.robots import compile_robots, robots_filter
from ..profiles import SiteProfile
from ..tables.catalog import BUCKET_COL, SnapshotCatalog, bucket_of


def frontier_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    catalog: SnapshotCatalog,
    profile: SiteProfile,
    robots_df: DataFrame,
    n_buckets: int = 32,
    robots_compiled=None,
):
    """foreachBatch sink: admit candidates, dedup vs seen, MERGE into
    frontier + seen. Batch-mode rounds reuse the same operators.
    ``robots_compiled``: pass :func:`compile_robots` computed once at
    stream start — the strategy probes are driver actions per
    micro-batch otherwise."""
    cand = batch_df.select(
        "url", F.coalesce(F.col("depth"), F.lit(0)).cast("int").alias("depth")
    ).dropDuplicates(["url"])
    c = normalize_candidates(cand)
    c = admission_filter(c, profile)
    c = robots_filter(c, robots_df, compiled=robots_compiled)
    c = is_product_url(c, profile).withColumn(
        "priority", F.when(F.col("is_product"), 0).otherwise(1).cast("int")
    )
    seen = (
        catalog.read("seen")
        if catalog.exists("seen")
        else None
    )
    if seen is not None:
        c = c.join(seen.select("url_hash"), "url_hash", "left_anti")
    rows = c.select(
        "url", "url_hash", "host", "path", "depth", "priority",
        F.lit(int(batch_id)).alias("discovered_round"),
    ).withColumn(BUCKET_COL, bucket_of(F.col("url_hash"), n_buckets)).cache()
    if rows.isEmpty():
        rows.unpersist()
        return
    if catalog.exists("frontier"):
        catalog.merge_upsert("frontier", rows, "url_hash", partition_by=BUCKET_COL,
                             bucket_spec=("url_hash", n_buckets))
    else:
        catalog.overwrite("frontier", rows, partition_by=BUCKET_COL,
                          bucket_spec=("url_hash", n_buckets))
    seen_rows = rows.select(
        "url_hash", "url", F.col("discovered_round").alias("first_round"), BUCKET_COL
    )
    if catalog.exists("seen"):
        catalog.append("seen", seen_rows, partition_by=BUCKET_COL,
                       bucket_spec=("url_hash", n_buckets))
    else:
        catalog.overwrite("seen", seen_rows, partition_by=BUCKET_COL,
                          bucket_spec=("url_hash", n_buckets))
    rows.unpersist()


def host_budget_admit(stream_df: DataFrame, budget_per_host: int) -> DataFrame:
    """Custom stateful streaming operator: a per-host crawl budget
    enforced ACROSS micro-batches via ``applyInPandasWithState``.

    colly's LimitRule caps in-flight requests per domain within one
    process (scraper.go:101-105); the batch crawl's politeness window
    (O3) caps per round. This is the streaming third form: keyed state
    (the cumulative ADMITTED COUNT per host — a bounded counter, not a
    url set) persists in the streaming checkpoint, so a host that
    exhausts its budget stays closed in every later batch — including
    across query restarts. A url replayed in a later batch is NOT
    deduplicated here and consumes budget again: url-level dedup is the
    seen-filter's job (F4), exactly as in the batch pipeline; keeping
    the state a counter is what keeps it O(hosts) instead of O(urls).
    Input: streaming (url, host); output: (url, host, rank) with rank
    the 1-based cumulative admission index per host."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def admit(key, pdfs, state: "GroupState"):
        (host,) = key
        used = state.get[0] if state.exists else 0
        urls: list[str] = []
        for pdf in pdfs:
            urls.extend(pdf["url"].tolist())
        urls = sorted(set(urls))  # deterministic within-batch order
        take = max(0, budget_per_host - used)
        out = urls[:take]
        state.update((used + len(out),))
        if out:
            yield pd.DataFrame(
                {
                    "url": out,
                    "host": host,
                    "rank": [used + i + 1 for i in range(len(out))],
                }
            )

    return stream_df.groupBy("host").applyInPandasWithState(
        admit,
        outputStructType="url string, host string, rank long",
        stateStructType="used long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_frontier_ingest(
    stream_df: DataFrame,
    catalog: SnapshotCatalog,
    profile: SiteProfile,
    robots_df: DataFrame,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Wire a streaming candidate DataFrame (url, depth) into the
    frontier. Use ``trigger(availableNow=True)`` for drain-and-stop
    (tests), default processing-time trigger for continuous ingest."""
    compiled = compile_robots(robots_df)
    writer = stream_df.writeStream.foreachBatch(
        lambda df, bid: frontier_ingest_batch(
            df, bid, catalog, profile, robots_df, robots_compiled=compiled
        )
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
