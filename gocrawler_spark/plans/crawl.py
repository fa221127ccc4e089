"""The crawl round loop — Structured-Streaming-style micro-batches over
snapshot tables (SURVEY §3.1 "Spark lifecycle equivalent").

One round = one DataFrame DAG:

  frontier → politeness window (O3, salted) → fetch join vs pages (J2,
  broadcast the round's fetch set) → mapInPandas extract (E1,E3-E10,F9)
  → explode links → admission (F1/F2/F6 + robots F5 broadcast join J3)
  → exact anti-join seen (J4; bloom prefilter once the seen set is big)
  → MERGE frontier / append seen / MERGE items (S5 semantics) / append
  fetch_log (S7) + quarantine (S9) → checkpoint row (S8).

Semantics are pinned to gocrawler_spark.sim.simulator (the golden
single-threaded reference implementation of colly's synchronous
semantics); tests assert set- and order-equality between the two.

Scale notes (the 10^10-URL design):
* frontier/seen/pages are bucketed on url_hash (BUCKET_COL) — MERGE and
  anti-join shuffles hash-partition on high-cardinality keys, never on
  host, so the mega-host cannot skew them;
* the politeness window IS host-partitioned — that's the salted
  two-phase rank in operators/politeness.py;
* the `html` binary column is only read in the extract stage (column
  pruning does real work: frontier bookkeeping reads ~60 bytes/row);
* ``seen`` is append-only (no rewrite); ``frontier`` is rewritten per
  round but is only the live working set, not the full crawl history.
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..operators.bloom import Bloom, bloom_prefilter, build_bloom
from ..operators.extraction import ITEM_TYPE, extract_fetched
from ..functions.urlnorm import canonical_url
from ..operators.frontier import admission_filter, is_product_url, normalize_candidates
from ..operators.politeness import select_fetch_set
from ..operators.robots import compile_robots, robots_filter
from ..profiles import SiteProfile
from ..tables.catalog import BUCKET_COL, SnapshotCatalog, bucket_of

FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("url_hash", StringType()),
        StructField("host", StringType()),
        StructField("path", StringType()),
        StructField("depth", IntegerType()),
        StructField("priority", IntegerType()),
        StructField("discovered_round", IntegerType()),
    ]
)

SEEN_SCHEMA = StructType(
    [
        StructField("url_hash", StringType()),
        StructField("url", StringType()),
        StructField("first_round", IntegerType()),
    ]
)

STATE_TABLES = ("frontier", "seen", "items", "fetch_log", "quarantine")

# E18 header decoration: the reference injects a rotated header map + UA
# into every request (scrapingHeader.go:11-24 — the pool has exactly one
# entry, so "rotation" is a constant — plus colly.UserAgent at
# scraper.go:83). In the synthetic fetch these are lineage metadata
# columns on the fetch_log, carried per row as the reference serializes
# request headers per tracked request (requestTracker.go:49-112).
USER_AGENT = (
    "Mozilla/5.0 (Macintosh; Intel Mac OS X x.y; rv:42.0) "
    "Gecko/20100101 Firefox/42.0"
)
HEADERS_POOL = {
    "DNT": "1",
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,"
              "image/webp,image/apng,*/*;q=0.8,application/signed-exchange;v=b3;q=0.9",
    "Accept-Encoding": "gzip, deflate, br",
    "Accept-Language": "es-US,es-419;q=0.9,es;q=0.8,en;q=0.7",
    "Cache-Control": "max-age=0",
    "Connection": "keep-alive",
}


def _headers_col():
    pairs = []
    for k, v in HEADERS_POOL.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)


@dataclass
class CrawlConfig:
    credit_per_host: int = 4  # colly LimitRule Parallelism (scraper.go:103)
    # optional per-host budgets: credit(host) = max(1, budget/delay_ms)
    # using the host's max crawl_delay_ms from the robots table — the
    # batch form of LimitRule Parallelism=4 / RandomDelay<=6s
    round_budget_ms: int | None = None
    max_depth: int | None = None  # MaxDepth commented out (scraper.go:81)
    max_rounds: int = 1000
    salt_parts: int = 16
    n_buckets: int = 32
    # bloom crossover: below this seen-set size the plain shuffled-hash
    # anti-join wins outright (measured: at 12M seen keys on one node the
    # bloom path costs ~4x the exact join; the bloom pays when the seen
    # shuffle would spill across the cluster, i.e. 10^8+ keys/executor)
    bloom_min_seen: int = 50_000_000
    bloom_bits: int | None = None  # None -> sized from the live seen count
    bloom_hashes: int = 5
    bloom_fpp: float = 0.01
    # J2 broadcast gate: above this row count the fetch set goes through
    # a plain shuffle join (a web-scale round's set is hosts x credit —
    # not broadcastable at 10^8 hosts)
    broadcast_fetch_max: int = 4_000_000
    # host-prefix length for the two-level seq prefix sum (36^K groups
    # upper-bounds the level-2 single-partition window)
    seq_prefix_len: int = 3
    # opt-in URL canonicalization (functions/urlnorm.py) before
    # admission: collapses scheme/host case, default ports, fragments
    # and tracking params into one seen-filter entry. Default off — the
    # reference dedups on the RAW url string (scraper.go:112) and the
    # byte-parity suite pins that
    canonicalize_urls: bool = False
    # opt-in web-archive output: every round's fetched pages written as
    # Common-Crawl-shaped WARC segments (sources/warc.write_warc,
    # per-record index rows kept), and run() finalizes a SURT-keyed CDX
    # index (sources/cdx.write_cdx) over all rounds. Costs one extra
    # (column-pruned: url/html/warc_ts) pages-scan join + one commit
    # action per round; default off. Operational output, not a snapshot
    # table: a resumed run re-archives its replayed rounds.
    archive_dir: str | None = None
    archive_cdx_shards: int = 8
    # opt-in adaptive politeness: per-host credit scaled by the host's
    # recent fetch success rate (operators/politeness.
    # error_backoff_credits) — erroring hosts throttle toward
    # backoff_min_credit, recovered hosts climb back. Composes with
    # round_budget_ms via least(). Default off (reference parity:
    # colly's LimitRule is static).
    adaptive_backoff: bool = False
    backoff_lookback: int = 3
    backoff_min_credit: int = 1
    # ---- opt-in frontier analytics (round-4 verdict #4): the three
    # standalone analytics operators steering the fetch loop itself,
    # mirroring how every admission gate in the reference acts inside
    # its loop (/root/reference/pkg/scraper/scraper.go:80-105). All
    # three act on the ROUND'S SELECTION only — the frontier/seen
    # state tables and the default path stay byte-identical when off.
    #
    # Crawl-trap starvation: hosts whose frontier URLs collapse to few
    # templates with exploding per-template counts (operators/traps)
    # are anti-joined out of the candidate pool each round, exactly
    # like the robots disallow set. Trapped hosts stay in the frontier
    # (they recover if the trap signature clears). Costs one distinct +
    # two map-side-partial aggs over the frontier per round.
    trap_detection: bool = False
    trap_min_urls: int = 1000
    trap_max_per_template: int = 200
    # Host-PageRank priorities: each round appends the extracted
    # host->host link edges to a `host_edges` table (one extra tiny
    # commit riding the pool); the next round runs fixed-iteration
    # PageRank over the accumulated graph and composes the tier into
    # the selection order as priority*levels + (levels-1 - tier) — so
    # the reference's static product-class order is preserved and
    # high-rank hosts come first WITHIN each class. Selection-only:
    # the frontier table keeps the static priority.
    rank_hosts: bool = False
    rank_levels: int = 10
    rank_iters: int = 20
    # Recrawl scheduling (Cho & Garcia-Molina, operators/recrawl):
    # every round appends (url, round, md5(html)) digests of fetched
    # pages; with a budget set, the top-p_changed URLs per host join
    # the candidate pool as TRANSIENT rows (they are already in `seen`
    # and are never written back to the frontier) at static priority 2
    # — after fresh product (0) and non-product (1) URLs. recrawl_min_p
    # floors the candidacy (default 0.0 = pure top-k per host).
    recrawl_budget: int | None = None
    recrawl_min_p: float = 0.0
    # Opt-in charset normalization (operators/encoding): WHATWG-order
    # sniff (BOM > meta prescan > utf-8) + decode of the fetched bytes
    # BEFORE extraction, so gbk/latin-1/shift_jis pages extract the
    # same text a utf-8 copy would (historically ~10-20% of real CC
    # responses are non-utf-8; the default extractor assumes utf-8 with
    # replacement). Adds one mapInPandas decode pass over the round's
    # fetched pages, a `charset` column on fetch_log OnResponse rows,
    # and a per-round charset histogram in the checkpoint metrics.
    # Default off: the reference treats bytes as-is and the byte-parity
    # suite pins that.
    decode_charsets: bool = False
    # Opt-in table maintenance every N rounds (0 = off): compact the
    # append/merge-heavy state tables back to one data root (Iceberg
    # rewrite_data_files) and expire snapshots strictly OLDER than the
    # last complete checkpoint's snapshot vector (expire_snapshots) —
    # resume's rollback target and everything after it stay intact.
    # Without it a long run's table dirs grow O(rounds) in file count
    # and bytes (every round pins its append spray forever); at
    # 10^10-URL scale manifest-entry count alone becomes a driver cost.
    # Default off: maintenance snapshots are extra commits the parity
    # suite's snapshot-count assertions don't expect.
    maintenance_every: int = 0


class CrawlJob:
    def __init__(
        self,
        spark: SparkSession,
        catalog: SnapshotCatalog,
        profile: SiteProfile,
        config: CrawlConfig | None = None,
        run_id: str = "run",
    ):
        self.spark = spark
        self.cat = catalog
        self.profile = profile
        self.cfg = config or CrawlConfig()
        self.run_id = run_id
        self._robots_df: DataFrame | None = None
        self._seen_count: int = 0
        self._round_caches: list[DataFrame] = []
        self._last_ckpt_snaps: dict[str, int] = {}

    # ---------------------------------------------------------------- setup
    def _ckpt_table(self) -> str:
        return f"checkpoints_{self.run_id}"

    def load_robots(self, robots_df: DataFrame):
        self._robots_df = robots_df.cache()
        # probe/compile once: the rules table is static for the whole
        # run, and robots_filter's strategy probes are driver actions
        # per call (tiny single-rule tables additionally get the
        # join-free map-literal plan). The probes' own full-table
        # aggregation materializes the cache — the separate count()
        # that used to precede them was a redundant extra job (r6).
        self._robots_compiled = compile_robots(self._robots_df)
        self._host_delays = self._robots_df.groupBy("host").agg(
            F.max("crawl_delay_ms").alias("crawl_delay_ms")
        )

    def _admit(self, cand: DataFrame) -> DataFrame:
        """F1+F2+F6 then robots (F5). cand must have url/depth columns."""
        if self.cfg.canonicalize_urls:
            # canonical form BEFORE url_hash/admission so every alias of
            # a URL maps to one frontier + seen entry. Non-absolute URLs
            # canonicalize to NULL and are dropped by admission's host
            # allowlist (null host, like the default path) — deliberately
            # NO where(url IS NOT NULL) here: predicate pushdown would
            # substitute the whole canonical_url tree into the filter
            # and evaluate it twice per row (the cdx_lines lesson,
            # sources/cdx.py)
            cand = cand.withColumn("url", canonical_url(F.col("url")))
        c = normalize_candidates(cand)
        c = admission_filter(c, self.profile, self.cfg.max_depth)
        c = robots_filter(c, self._robots_df, compiled=self._robots_compiled)
        return c

    def init_run(self, seeds_df: DataFrame, robots_df: DataFrame):
        """Admission over the seed list -> initial frontier + seen."""
        self.load_robots(robots_df)
        seeds = seeds_df.select(
            "url",
            F.coalesce(F.col("priority"), F.lit(0)).cast("int").alias("priority"),
            F.lit(0).alias("depth"),
        )
        adm = self._admit(seeds).dropDuplicates(["url"])
        # cache: the seen write and seed count would otherwise re-run
        # the full admission plan (regex + robots) two more times
        frontier = adm.select(
            "url", "url_hash", "host", "path",
            F.col("depth").cast("int"),
            F.col("priority").cast("int"),
            F.lit(0).alias("discovered_round"),
        ).withColumn(BUCKET_COL, bucket_of(F.col("url_hash"), self.cfg.n_buckets)).cache()
        seen = frontier.select(
            "url_hash", "url", F.lit(0).alias("first_round"), BUCKET_COL
        )
        # independent tables, cached input: same threaded-commit shape
        # as run_round (cache blocks are compute-once under concurrency)
        with ThreadPoolExecutor(max_workers=3, thread_name_prefix="init") as ex:
            f_fut = ex.submit(self.cat.overwrite, "frontier", frontier,
                              partition_by=BUCKET_COL,
                              bucket_spec=("url_hash", self.cfg.n_buckets))
            s_fut = ex.submit(self.cat.overwrite, "seen", seen,
                              partition_by=BUCKET_COL,
                              bucket_spec=("url_hash", self.cfg.n_buckets))
            n_fut = ex.submit(frontier.count)
            f_fut.result(), s_fut.result()
            self._seen_count = n_fut.result()
        frontier.unpersist()
        self._checkpoint(round_no=0, metrics={"seeds": self._seen_count})

    # gate for the driver-side seq-offset fast path: (priority, host)
    # group counts up to this many rows collect to the driver (a few MB
    # — metadata scale, the same tier as compile_robots' rule probe and
    # the bucket-delta merge's touched-bucket collect); crawls with more
    # live hosts keep the fully distributed two-level prefix sum
    SEQ_DRIVER_MAX_GROUPS = 65_536

    def _assign_seq(self, fetch_set: DataFrame) -> DataFrame:
        """Dense global ``seq`` in the deterministic (priority, host,
        url) order spec (O4).

        Two plans, picked by the fetch set's (priority, host) group
        count (probed by the same aggregation that feeds both):

        * ``<= SEQ_DRIVER_MAX_GROUPS`` (every real politeness-budgeted
          round: the fetch set is hosts×credit by construction) — the
          exclusive prefix sum over group counts is computed DRIVER-side
          from one bounded collect and broadcast back; one aggregation
          job + one broadcast join replace the distributed prefix-sum
          tree's ~6 exchanges of metadata-sized tables, which at local
          round cadence cost more in per-stage latency than the whole
          round's compute (r6 event-log profile: the seq tree was ~1s of
          a 5s round at 1.3k fetched rows).
        * above the gate (a 10^8-host frontier) — the r2 two-level
          prefix sum: level 1 groups hosts by a lexicographic host
          PREFIX (order-preserving, unlike hash salting, so group
          offsets concatenate in host order) and windows within each
          (priority, prefix) group in parallel; level 2 chains one row
          per group / per priority (tiny windows). No collect anywhere.

        Both plans produce byte-identical seq values (the parity suite
        pins exact (round, seq) against the golden simulator): the
        driver path sorts groups by (priority, host) — the same total
        order the prefix-grouped windows realize — and the final
        within-host ranking window is shared.
        """
        k = self.cfg.seq_prefix_len
        counts = (
            fetch_set.groupBy("priority", "host")
            .agg(F.count("*").alias("_cnt"))
            .withColumn("_grp", F.substring("host", 1, k))
        )
        head = counts.limit(self.SEQ_DRIVER_MAX_GROUPS + 1).collect()
        if len(head) <= self.SEQ_DRIVER_MAX_GROUPS:
            head.sort(key=lambda r: (r["priority"], r["host"]))
            rows, off = [], 0
            for r in head:
                rows.append((int(r["priority"]), r["host"], off))
                off += r["_cnt"]
            off_df = self.spark.createDataFrame(
                rows, "priority int, host string, _off long"
            )
            w_host = Window.partitionBy("priority", "host").orderBy("url")
            return (
                fetch_set.join(F.broadcast(off_df), ["priority", "host"])
                .withColumn(
                    "seq",
                    (F.col("_off") + F.row_number().over(w_host)).cast("int"),
                )
                .drop("_off")
            )
        # cached: the counts subtree feeds three branches (within-group
        # window, group totals, final join) — without the cache each
        # branch re-aggregates fetch_set
        counts = counts.cache()
        self._round_caches.append(counts)
        w_in = (
            Window.partitionBy("priority", "_grp")
            .orderBy("host")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        within = counts.withColumn(
            "_within", F.coalesce(F.sum("_cnt").over(w_in), F.lit(0))
        )
        grp_tot = counts.groupBy("priority", "_grp").agg(F.sum("_cnt").alias("_gtot"))
        w_grp = (
            Window.partitionBy("priority")
            .orderBy("_grp")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        grp_off = grp_tot.withColumn(
            "_goff", F.coalesce(F.sum("_gtot").over(w_grp), F.lit(0))
        )
        # priority-level exclusive prefix via a tiny theta self-join
        # (priorities² rows) — avoids a no-partition global window
        prio_tot = grp_tot.groupBy("priority").agg(F.sum("_gtot").alias("_ptot"))
        earlier = prio_tot.select(F.col("priority").alias("_p2"), "_ptot")
        prio_off = (
            prio_tot.select("priority")
            .join(F.broadcast(earlier), F.col("_p2") < F.col("priority"), "left")
            .groupBy("priority")
            .agg(F.coalesce(F.sum("_ptot"), F.lit(0)).alias("_poff"))
        )
        off = (
            within.join(grp_off.select("priority", "_grp", "_goff"), ["priority", "_grp"])
            .join(prio_off.select("priority", "_poff"), "priority")
            .select(
                "priority", "host",
                (F.col("_poff") + F.col("_goff") + F.col("_within")).alias("_off"),
            )
        )
        w_host = Window.partitionBy("priority", "host").orderBy("url")
        return (
            fetch_set.join(off, ["priority", "host"])
            .withColumn("seq", (F.col("_off") + F.row_number().over(w_host)).cast("int"))
            .drop("_off")
        )

    # ---------------------------------------------------------------- round
    def run_round(self, rnd: int, pages: DataFrame) -> dict:
        cfg = self.cfg
        frontier = self.cat.read("frontier")

        # ---- opt-in frontier analytics (see CrawlConfig): recrawl
        # union, then trap starvation, then rank composition — so
        # re-fetch candidates are trap-checked and rank-ordered too.
        recrawl_active = cfg.recrawl_budget is not None and self.cat.exists(
            "page_digests"
        )
        if recrawl_active:
            from ..operators.recrawl import (
                recrawl_priorities,
                select_recrawl_set,
            )

            pri = recrawl_priorities(
                self.cat.read("page_digests"), now=float(rnd)
            ).where(F.col("p_changed") >= F.lit(float(cfg.recrawl_min_p)))
            rec_rows = (
                normalize_candidates(
                    select_recrawl_set(pri, cfg.recrawl_budget)
                    .select(
                        "url",
                        F.lit(0).cast("int").alias("depth"),
                        F.lit(2).cast("int").alias("priority"),
                    )
                )
                .select(
                    "url", "url_hash", "host", "path", "depth", "priority",
                    F.lit(rnd).cast("int").alias("discovered_round"),
                )
                .withColumn(
                    BUCKET_COL, bucket_of(F.col("url_hash"), cfg.n_buckets)
                )
            )
            frontier = frontier.withColumn(
                "_recrawl", F.lit(False)
            ).unionByName(rec_rows.withColumn("_recrawl", F.lit(True)))
        starved = None
        if cfg.trap_detection:
            from ..operators.traps import trap_hosts

            traps = trap_hosts(
                frontier,
                min_urls=cfg.trap_min_urls,
                max_urls_per_template=cfg.trap_max_per_template,
            ).withColumn("_trap", F.lit(True))
            # one flag join (tiny right side, AQE-broadcast) instead of
            # a semi+anti pair that would run the trap aggregation twice
            flagged = frontier.join(traps, "host", "left")
            # starved rows skip selection but MUST survive the round's
            # frontier overwrite — they recover when the trap clears
            starved = flagged.where(F.col("_trap")).drop("_trap")
            if recrawl_active:
                starved = starved.where(~F.col("_recrawl"))
            frontier = flagged.where(F.col("_trap").isNull()).drop("_trap")
        ranked = cfg.rank_hosts and self.cat.exists("host_edges")
        if ranked:
            from ..operators.graph import pagerank, rank_priorities

            edges = (
                self.cat.read("host_edges")
                .groupBy("src", "dst")
                .agg(F.sum("weight").alias("weight"))
            )
            pri_map = rank_priorities(
                pagerank(edges, fixed_iters=cfg.rank_iters),
                levels=cfg.rank_levels,
            ).select(
                F.col("id").alias("host"), F.col("priority").alias("_rpri")
            )
            # selection-order priority only: the static priority is kept
            # aside and restored on the frontier write-back below
            frontier = (
                frontier.withColumnRenamed("priority", "_static_pri")
                .join(pri_map, "host", "left")
                .withColumn(
                    "priority",
                    (
                        F.col("_static_pri") * cfg.rank_levels
                        + (
                            F.lit(cfg.rank_levels - 1)
                            - F.coalesce(F.col("_rpri"), F.lit(0))
                        )
                    ).cast("int"),
                )
                .drop("_rpri")
            )

        # O3 politeness: salted two-phase per-host credit selection.
        # Two opt-in per-host credit shapers compose via least(): the
        # crawl-delay budget (robots Crawl-delay -> budget/delay) and
        # the adaptive error backoff (recent fetch_log success rate —
        # failing hosts throttle to a probe rate). Default: uniform.
        credit_parts = []
        if cfg.round_budget_ms is not None:
            from ..operators.politeness import host_credit_col

            frontier = frontier.join(
                F.broadcast(self._host_delays), "host", "left"
            )
            credit_parts.append(
                host_credit_col(cfg.credit_per_host, cfg.round_budget_ms)
            )
        if cfg.adaptive_backoff and rnd > 1 and self.cat.exists("fetch_log"):
            from ..operators.politeness import error_backoff_credits

            ad = error_backoff_credits(
                self.cat.read("fetch_log"), cfg.credit_per_host,
                current_round=rnd - 1,
                lookback_rounds=cfg.backoff_lookback,
                min_credit=cfg.backoff_min_credit,
            )
            # plain join: AQE broadcasts the host-count side while small
            frontier = frontier.join(ad, "host", "left")
            credit_parts.append(
                F.coalesce(F.col("_ad_credit"), F.lit(cfg.credit_per_host))
            )
        if credit_parts:
            credit = (
                credit_parts[0] if len(credit_parts) == 1
                else F.least(*credit_parts)
            )
            frontier = frontier.withColumn(
                "_credit", credit.cast("int")
            ).drop("crawl_delay_ms", "_ad_credit")
            sel = select_fetch_set(
                frontier, cfg.credit_per_host, cfg.salt_parts, credit_col="_credit"
            ).drop("_credit").cache()
        else:
            sel = select_fetch_set(
                frontier, cfg.credit_per_host, cfg.salt_parts
            ).cache()
        selected = sel.filter(F.col("is_selected"))
        # count BEFORE assigning seq: the drained final round skips the
        # whole prefix-sum job tree (sel is cached; this is a cache scan)
        n_fetch = selected.count()
        if n_fetch == 0:
            sel.unpersist()
            self._drop_round_caches()
            return {"round": rnd, "fetched": 0, "done": True}
        # cached lazily: the fetch join materializes it, the OnError
        # anti-join reads the cache — an eager count() here only added a
        # per-round job (seq assignment is executor-deterministic, so a
        # recompute-on-eviction cannot change values)
        fetch_set = self._assign_seq(selected).cache()

        # J2 fetch join — the pages scan reads only (url, html). Broadcast
        # the fetch set only while it actually fits (size-gated: at 10^8
        # hosts x credit the per-round set is NOT broadcastable); above
        # the gate, a plain equi-join lets AQE pick sort-merge/shuffled-
        # hash on url, aligned with the url_hash bucketing.
        pages_kv = pages.select("url", "html")
        if n_fetch <= cfg.broadcast_fetch_max:
            found = pages_kv.join(F.broadcast(fetch_set), "url", "inner")
        else:
            found = pages_kv.join(fetch_set, "url", "inner")

        passthrough: tuple[str, ...] = ()
        if cfg.decode_charsets:
            from ..operators.encoding import decode_html

            # decode to proper utf-8 BEFORE the extract kernel (which
            # reads bytes as utf-8-with-replacement); the charset rides
            # through the kernel as a passthrough column so lineage
            # records it without a second pages-scan join
            found = decode_html(found, html_col="html").withColumn(
                "html", F.encode(F.col("html_text"), "UTF-8")
            ).drop("html_text")
            passthrough = ("charset",)
        extracted = extract_fetched(
            found.drop("fetch_rank").withColumnRenamed("seq", "fetch_rank"),
            self.profile,
            passthrough=passthrough,
        ).withColumnRenamed("fetch_rank", "seq").cache()

        # OnError rows: anti-join against the cached extracted set — never
        # a second scan of the pages table; same broadcast size gate
        ex_urls = extracted.select("url")
        if n_fetch <= cfg.broadcast_fetch_max:
            ex_urls = F.broadcast(ex_urls)
        missing = fetch_set.join(ex_urls, "url", "left_anti")

        # ------------------------------------------------ frontier expansion
        links = (
            extracted.select(
                F.explode("links").alias("url"),
                (F.col("depth") + 1).alias("depth"),
            )
            .groupBy("url")
            .agg(F.min("depth").cast("int").alias("depth"))  # order-free min-depth
        )
        adm = self._admit(links)
        adm = is_product_url(adm, self.profile).withColumn(
            "priority", F.when(F.col("is_product"), 0).otherwise(1).cast("int")
        )

        # J4 seen anti-join (+ bloom prefilter when the seen set is large)
        seen = self.cat.read("seen")
        if self._seen_count >= cfg.bloom_min_seen:
            if cfg.bloom_bits is None:
                sized = Bloom.sized_for(self._seen_count, cfg.bloom_fpp)
                n_bits, n_hashes = sized.n_bits, sized.n_hashes
            else:
                n_bits, n_hashes = cfg.bloom_bits, cfg.bloom_hashes
            bloom = build_bloom(seen, "url_hash", n_bits, n_hashes)
            flagged = bloom_prefilter(adm, "url_hash", bloom).cache()
            definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
            confirmed = maybe.join(seen.select("url_hash"), "url_hash", "left_anti")
            new_cands = definite_new.unionByName(confirmed)
        else:
            # shuffled-hash beats sort-merge here: the seen side is a bag of
            # unique hashes (no sort benefit), and AQE keeps skew in check
            new_cands = adm.join(
                seen.select("url_hash").hint("shuffle_hash"), "url_hash", "left_anti"
            )

        new_rows = new_cands.select(
            "url", "url_hash", "host", "path",
            F.col("depth").cast("int"),
            F.col("priority").cast("int"),
            F.lit(rnd).cast("int").alias("discovered_round"),
        ).withColumn(BUCKET_COL, bucket_of(F.col("url_hash"), cfg.n_buckets)).cache()

        # ------------------------------------------------- state commits
        # The five state tables are independent (different catalog
        # tables, inputs all cached above), so their commit jobs are
        # submitted from driver THREADS: Spark schedules concurrent jobs
        # fine, and what overlaps is the per-action driver latency
        # (Catalyst analysis + commit bookkeeping), which the job
        # timeline shows is ~half the round at small scale. On a real
        # cluster the same shape keeps executors busy across the
        # commits' barrier instead of draining between five serial jobs.
        rem = sel.filter(~F.col("is_selected"))
        if recrawl_active:
            # transient re-fetch candidates never enter the frontier
            rem = rem.filter(~F.col("_recrawl"))
        rem_cols = [
            F.col("_static_pri").cast("int").alias("priority")
            if ranked and f.name == "priority"
            else f.name
            for f in FRONTIER_SCHEMA.fields
        ]
        remainder = rem.select(*rem_cols, BUCKET_COL)
        frontier2 = remainder.unionByName(new_rows)
        if starved is not None:
            frontier2 = frontier2.unionByName(
                starved.select(
                    *[f.name for f in FRONTIER_SCHEMA.fields], BUCKET_COL
                )
            )
        seen_append = new_rows.select("url_hash", "url", F.lit(rnd).alias("first_round"), BUCKET_COL)

        # DEADLOCK INVARIANT: the items/quarantine lambdas BLOCK their
        # worker on stats_fut.result(), so (a) stats must be submitted
        # before them and (b) max_workers must be >= the total number of
        # submitted tasks (7 today: n_new, stats, 5 commits; +1 with
        # archive_dir) so every task gets a worker up front and the
        # blocked dependents can never starve stats out of a slot.
        # Adding a task? Bump N_COMMIT_TASKS.
        # frontier-drain probe (r6): when the opt-in analytics that can
        # re-inject candidates are OFF, next round's selection input is
        # exactly remainder + new_rows — counting it now (one cache-scan
        # count riding the pool) lets run() skip the final all-fixed-
        # cost probe round that would select 0 and return done. Gated
        # off under trap_detection (starved hosts can un-trap) and
        # recrawl (transient re-fetch candidates join at selection).
        probe_drain = starved is None and cfg.recrawl_budget is None
        N_COMMIT_TASKS = (
            7
            + (1 if cfg.archive_dir else 0)
            + (1 if cfg.rank_hosts else 0)
            + (1 if cfg.recrawl_budget is not None else 0)
            + (1 if cfg.decode_charsets else 0)
            + (1 if probe_drain else 0)
        )
        with ThreadPoolExecutor(max_workers=N_COMMIT_TASKS,
                                thread_name_prefix="commit") as ex:
            # the new-candidate count rides the pool too (NB: tried
            # folding it into the frontier write via Observation —
            # Spark 4.1 returns a schema-less metrics row for this plan
            # shape and toPyRow asserts; a plain count is the reliable
            # form). Concurrent first-consumers of the new_rows cache
            # are safe AND compute-once: BlockInfoManager write-locks
            # each cached block, so whichever job gets there first
            # computes it and the others block on the lock, not redo it.
            n_new_fut = ex.submit(new_rows.count)
            # one cache-scan aggregation answers every per-round "how
            # many" the sub-commits used to probe separately (errs
            # count, items batch count, quarantine isEmpty — 3 driver
            # actions -> 1), and it runs in the pool too: only the
            # items/quarantine commits need its result, so it overlaps
            # the frontier/seen/fetch_log commits instead of serializing
            # in front of all five
            stats_fut = ex.submit(
                lambda: extracted.agg(
                    F.count_distinct("url").alias("n_ok_urls"),
                    F.count_if(F.col("is_captcha")).alias("n_captcha"),
                    F.count_distinct(
                        F.when(F.col("item").isNotNull(), F.col("item.id"))
                    ).alias("n_item_ids"),
                ).first()
            )
            futs = [
                ex.submit(self.cat.overwrite, "frontier", frontier2,
                          partition_by=BUCKET_COL,
                          bucket_spec=("url_hash", cfg.n_buckets)),
                ex.submit(self.cat.append, "seen", seen_append,
                          partition_by=BUCKET_COL,
                          bucket_spec=("url_hash", cfg.n_buckets)),
                ex.submit(lambda: self._commit_items(
                    extracted, stats_fut.result()["n_item_ids"])),
                ex.submit(self._commit_fetch_log, rnd, extracted, missing, n_fetch),
                ex.submit(lambda: self._commit_quarantine(
                    rnd, extracted, stats_fut.result()["n_captcha"])),
            ]
            if cfg.archive_dir:
                # one more pages-scan join (pruned to url/html/warc_ts;
                # same broadcast gate) — the fetched bytes themselves,
                # which extract() never keeps
                arch_cols = ["url", "html"] + (
                    ["warc_ts"] if "warc_ts" in pages.columns else []
                )
                aset = fetch_set.select("url")
                afound = pages.select(*arch_cols).join(
                    F.broadcast(aset) if n_fetch <= cfg.broadcast_fetch_max
                    else aset,
                    "url", "inner",
                )
                futs.append(ex.submit(self._commit_archive, rnd, afound))
            if cfg.rank_hosts:
                # host->host link edges from this round's extractions:
                # tiny after the groupBy (hosts², not links), reads the
                # extracted cache — no extra pages scan
                from ..operators.frontier import _host_of
                from ..operators.graph import host_link_graph

                edelta = host_link_graph(
                    extracted.select(
                        F.col("host").alias("src_host"),
                        F.explode("links").alias("_dst"),
                    ).withColumn("dst_host", _host_of(F.col("_dst")))
                ).withColumn("round", F.lit(rnd).cast("int"))
                futs.append(ex.submit(self.cat.append, "host_edges", edelta))
            if cfg.recrawl_budget is not None:
                # (url, round, digest) history rows for change-rate
                # estimation — one more pruned pages-scan join, same
                # broadcast gate as the fetch join
                dset = fetch_set.select("url")
                digests = pages.select("url", "html").join(
                    F.broadcast(dset)
                    if n_fetch <= cfg.broadcast_fetch_max
                    else dset,
                    "url", "inner",
                ).select(
                    "url",
                    F.lit(float(rnd)).alias("fetch_ts"),
                    F.md5(F.col("html")).alias("content_hash"),
                )
                futs.append(
                    ex.submit(self.cat.append, "page_digests", digests)
                )
            ch_fut = None
            if cfg.decode_charsets:
                # charset histogram for the round's metrics — a tiny
                # cache-scan groupBy (few distinct codecs), pool-ridden
                ch_fut = ex.submit(
                    lambda: extracted.groupBy("charset").count().collect()
                )
            rem_fut = ex.submit(rem.count) if probe_drain else None
            # .result() re-raises any commit failure before checkpoint
            n_items = [f.result() for f in futs][2]
            stats = stats_fut.result()
            n_new = n_new_fut.result()
            charsets = (
                ",".join(
                    f"{r['charset']}={r['count']}"
                    for r in sorted(ch_fut.result(), key=lambda r: str(r["charset"]))
                )
                if ch_fut is not None
                else None
            )
        n_err = n_fetch - stats["n_ok_urls"]
        self._seen_count += n_new

        metrics = {
            "round": rnd,
            "fetched": n_fetch,
            "errors": n_err,
            "new_candidates": n_new,
            "items_upserted": n_items,
            "seen_total": self._seen_count,
            "done": False,
        }
        if charsets is not None:
            metrics["charsets"] = charsets
        if rem_fut is not None:
            # next round's selection input size (remainder + fresh
            # candidates): run() drains without the final probe round
            # when this is 0 (q45's from_json schema ignores extra keys)
            metrics["frontier_next"] = rem_fut.result() + n_new
        self._checkpoint(rnd, metrics)
        sel.unpersist()
        fetch_set.unpersist()
        extracted.unpersist()
        new_rows.unpersist()
        self._drop_round_caches()
        return metrics

    def _drop_round_caches(self):
        for df in self._round_caches:
            df.unpersist()
        self._round_caches.clear()

    # ------------------------------------------------------------ sub-commits
    def _commit_archive(self, rnd: int, found: DataFrame) -> None:
        """Archive the round's fetched pages as WARC segments and append
        their per-record (filename, offset, length, digest) index rows —
        run() folds all rounds' rows into one CDX index at the end. One
        Spark action (the parquet append executes the segment writes)."""
        import os as _os

        from ..sources.warc import write_warc

        seg_dir = _os.path.join(
            self.cfg.archive_dir, "segments", f"round-{rnd:05d}"
        )
        _os.makedirs(seg_dir, exist_ok=True)
        idx = write_warc(
            found, seg_dir, per_record_index=True, prefix=f"r{rnd:05d}"
        )
        idx.write.mode("append").parquet(
            _os.path.join(self.cfg.archive_dir, "_index_rows")
        )

    def finalize_archive(self) -> list[dict]:
        """SURT-keyed, range-sorted CDX index + cluster.idx over every
        archived round's records (sources/cdx.write_cdx). Idempotent:
        the cdx dir is rebuilt from _index_rows each call."""
        import os as _os
        import shutil as _shutil

        from ..sources.cdx import write_cdx

        cdx_dir = _os.path.join(self.cfg.archive_dir, "cdx")
        _shutil.rmtree(cdx_dir, ignore_errors=True)
        records = self.spark.read.parquet(
            _os.path.join(self.cfg.archive_dir, "_index_rows")
        )
        # a resumed run re-archives its replayed rounds: same segment
        # files rewritten byte-identical, index rows appended twice —
        # (filename, offset) names a unique record, so dedup here
        records = records.dropDuplicates(["filename", "offset"])
        return write_cdx(records, cdx_dir, n_shards=self.cfg.archive_cdx_shards)

    def _commit_items(self, extracted: DataFrame, n: int) -> int:
        """``n`` is the distinct-item-id count from run_round's single
        stats aggregation (== the post-window batch size, since the
        window keeps exactly one row per id)."""
        if n == 0:
            return 0
        items = (
            extracted.filter(F.col("item").isNotNull())
            .select("seq", "item.*")
        )
        # within-batch Redis-write-order semantics keyed by canonical seq:
        # HMSET scalars last-wins, RPUSH reviews appended, HSETNX details
        # first-wins (repository.go:25-93). Ordered-window collect_list
        # gives seq-ordered arrays (structs with maps aren't sortable).
        w = (
            Window.partitionBy("id")
            .orderBy("seq")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        wdesc = Window.partitionBy("id").orderBy(F.col("seq").desc())
        annotated = (
            items.withColumn("_reviews_all", F.flatten(F.collect_list("reviews").over(w)))
            .withColumn("_details_list", F.collect_list("details").over(w))
            .withColumn("_rn", F.row_number().over(wdesc))
        )
        batch = annotated.filter(F.col("_rn") == 1).select(
            "id", "name", "brand", "description", "price_cents", "rating",
            F.col("_reviews_all").alias("reviews"),
            "source_store", "url",
            F.aggregate(
                "_details_list",
                F.create_map().cast("map<string,string>"),
                lambda acc, m: F.map_zip_with(acc, m, lambda k, v1, v2: F.coalesce(v1, v2)),
            ).alias("details"),
        ).withColumn(BUCKET_COL, bucket_of(F.col("id"), self.cfg.n_buckets))

        def when_matched(old: DataFrame, new: DataFrame) -> DataFrame:
            o = old.select(
                "id",
                F.col("reviews").alias("_o_reviews"),
                F.col("details").alias("_o_details"),
            )
            j = new.join(o, "id", "left")
            return j.select(
                "id", "name", "brand", "description", "price_cents", "rating",
                F.concat(
                    F.coalesce("_o_reviews", F.array().cast(ITEM_TYPE["reviews"].dataType)),
                    "reviews",
                ).alias("reviews"),
                "source_store", "url",
                F.map_zip_with(
                    F.coalesce("_o_details", F.create_map().cast("map<string,string>")),
                    "details",
                    lambda k, v1, v2: F.coalesce(v1, v2),
                ).alias("details"),
                BUCKET_COL,
            )

        # bucketed on md5 id -> bucket-delta MERGE rewrites only the
        # buckets this round touched (O(delta), not O(items table))
        self.cat.merge_upsert(
            "items", batch, "id", when_matched=when_matched, partition_by=BUCKET_COL,
            bucket_spec=("id", self.cfg.n_buckets),
        )
        return n

    def _commit_fetch_log(self, rnd: int, extracted: DataFrame,
                          missing: DataFrame, n_fetch: int) -> None:
        """Request lineage rows per requestTracker.go:14-27: id, url,
        callback, error, depth, method, status, start/end/duration, plus
        the E18 header metadata and the J5 cookie-propagation column
        (scraper.go:191-194 — a no-op in the synthetic fetch, carried as
        an empty map so the schema surface matches)."""
        from ..functions.timing import request_timing
        from ..operators.frontier import response_revalidation

        # decode_charsets runs append the sniffed charset per OnResponse
        # row (null on OnError — nothing was decoded); default runs keep
        # the reference-parity schema, no column at all
        has_charset = "charset" in extracted.columns

        def lineage(df: DataFrame, callback: str, error: str, status: int) -> DataFrame:
            start_at, end_at, duration_ms = request_timing(F.col("url"), F.lit(rnd))
            cols = [
                F.col("url_hash").alias("req_id"), "url",
                F.lit(rnd).alias("round"), "seq",
                F.lit(callback).alias("callback"), F.lit(error).alias("error"),
                "depth", F.lit("GET").alias("method"),
                F.lit(status).alias("status_code"),
                start_at, end_at, duration_ms,
                F.lit(USER_AGENT).alias("user_agent"),
                _headers_col().alias("headers"),
                F.create_map().cast("map<string,string>").alias("cookies"),
                F.spark_partition_id().alias("partition_id"),
            ]
            if has_charset:
                cols.append(
                    (
                        F.col("charset")
                        if "charset" in df.columns
                        else F.lit(None).cast("string")
                    ).alias("charset")
                )
            return df.select(*cols)

        ok_cols = ["url", "url_hash", "depth", "seq"] + (
            ["charset"] if has_charset else []
        )
        ok = response_revalidation(extracted.select(*ok_cols), self.profile)
        resp = lineage(ok, "OnResponse", "", 200)
        errs = lineage(missing, "OnError", "Not Found", 404)
        # (no errs.count() here — run_round derives the OnError count
        # from its one stats aggregation, so the missing anti-join runs
        # exactly once, inside this append)
        # every selected URL yields exactly one lineage row (OnResponse
        # xor OnError), so n_fetch sizes the round's file count exactly
        self.cat.append("fetch_log", resp.unionByName(errs), n_rows=n_fetch)

    def _commit_quarantine(self, rnd: int, extracted: DataFrame, n_captcha: int):
        # captcha count comes from run_round's stats aggregation — no
        # per-round isEmpty() probe job on captcha-free rounds
        if n_captcha:
            q = extracted.filter(F.col("is_captcha")).select(
                "url", F.lit(rnd).alias("round")
            )
            self.cat.append("quarantine", q, n_rows=n_captcha)

    def _checkpoint(self, round_no: int, metrics: dict):
        snaps = {
            t: self.cat.current_snapshot(t)
            for t in STATE_TABLES
            if self.cat.exists(t)
        }
        # one driver-local row per round: written driver-side (pyarrow),
        # not through a Spark job — the checkpoint IS commit metadata,
        # same tier as the manifest files themselves
        self.cat.append_local_rows(
            self._ckpt_table(),
            [(self.run_id, round_no, json.dumps(snaps), json.dumps(metrics))],
            "run_id string, round int, snapshots string, metrics string",
        )
        self._last_ckpt_snaps = snaps

    def maintain(self) -> dict:
        """Between-rounds table maintenance (CrawlConfig.maintenance_every):
        fold each state table's accumulated per-round data sprays back to
        one root (``SnapshotCatalog.compact``) and expire snapshots no
        resume can reach — everything strictly older than the last
        complete checkpoint's snapshot vector (``expire_snapshots``).
        Compaction commits AFTER the checkpoint, so a crash mid-
        maintenance resumes from the checkpointed (pre-compact) snapshot,
        whose dirs the retention bound keeps alive."""
        stats = {}
        # host_edges / page_digests (opt-in analytics) also append one
        # spray per round; they are not checkpointed (resume never rolls
        # them back), so retain_from defaults to their current snapshot
        for t in STATE_TABLES + ("host_edges", "page_digests"):
            if not self.cat.exists(t):
                continue
            retain = self._last_ckpt_snaps.get(t, self.cat.current_snapshot(t))
            self.cat.compact(t)
            stats[t] = self.cat.expire_snapshots(t, retain_from=retain)
        # the checkpoint table itself accumulates one 1-row file per
        # round; fold it too, then expire its superseded snapshots: the
        # compacted CURRENT snapshot carries the full resume log, and
        # resume only ever reads the current snapshot, so older
        # checkpoint-table roots/manifests are unreachable — without
        # this the checkpoint dir's file count still grew O(rounds) on
        # exactly the long runs maintenance bounds (ADVICE r5)
        if self.cat.exists(self._ckpt_table()):
            self.cat.compact(self._ckpt_table())
            stats[self._ckpt_table()] = self.cat.expire_snapshots(
                self._ckpt_table(), keep_last=1
            )
        return stats

    # ---------------------------------------------------------------- loop
    def run(self, pages: DataFrame, start_round: int = 1) -> list[dict]:
        history = []
        rnd = start_round
        while rnd <= self.cfg.max_rounds:
            m = self.run_round(rnd, pages)
            if m.get("done"):
                break
            history.append(m)
            if self.cfg.maintenance_every and rnd % self.cfg.maintenance_every == 0:
                self.maintain()
            if m.get("frontier_next") == 0:
                # the round proved next round's selection input is empty
                # (no re-injecting analytics active): the loop is drained
                # — skip the probe round that would select 0 and return
                # done, which at metadata-bounded round sizes costs a
                # full selection pass of pure fixed latency. State and
                # history are byte-identical: the probe round writes no
                # checkpoint, no commits, and is never appended.
                break
            rnd += 1
        if self.cfg.archive_dir and any(m["fetched"] for m in history):
            self.finalize_archive()
        return history

    def resume(self, pages: DataFrame, robots_df: DataFrame) -> list[dict]:
        """Resume from the last complete checkpoint: roll every state table
        back to the recorded snapshot vector, then continue the loop."""
        self.load_robots(robots_df)
        ck = (
            self.cat.read(self._ckpt_table())
            .orderBy(F.col("round").desc())
            .limit(1)
            .collect()[0]
        )
        snaps = json.loads(ck["snapshots"])
        for t, snap in snaps.items():
            if self.cat.current_snapshot(t) != snap:
                self.cat.rollback(t, snap)
        self._seen_count = self.cat.read("seen").count()
        return self.run(pages, start_round=ck["round"] + 1)
