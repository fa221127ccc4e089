"""Link-graph analytics over crawl output: host-level graph + PageRank.

The reference crawler prioritizes URLs with a static product-URL
classifier (pkg/scraper/scraper.go priority rules); a web-scale frontier
additionally wants a *global* importance signal so politeness budgets go
to hosts the web itself points at. This module derives a host-level link
graph from the extracted `links` output of the crawl (src page -> href)
and runs power-iteration PageRank on it, all with DataFrame joins and
aggregations — no UDFs, no driver-side adjacency.

Scale notes (100 TB / 10^10 edges):
 - The edge list is grouped to (src, dst, weight) once, so the per-iter
   join touches each unique edge once regardless of link multiplicity.
 - Each iteration is one equi-join (edges x ranks, shuffle on src) and
   one groupBy(dst) — both partial-aggregated map-side. Edges are
   localCheckpoint'd once and the shuffle partitioning on src is reused
   every iteration.
 - Iterative lineage is truncated per round (localCheckpoint), same
   invariant as connected_components (operators/dedup.py): without it
   Catalyst re-analyzes an ever-deeper plan. A multi-hour cluster run
   would use setCheckpointDir + .checkpoint() for fault tolerance.
 - Dangling mass (hosts with no out-links) is folded back uniformly each
   round, so ranks stay a probability distribution and the result is
   independent of how many sink hosts the crawl frontier happened to
   stop at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["host_link_graph", "pagerank", "rank_priorities", "anchor_text_topk"]


def host_link_graph(
    links: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Collapse page->page links to a weighted host->host edge list.

    Input columns are host names (use frontier._host_of / normalize_
    candidates upstream to derive them from URLs). Self-loops are
    dropped — a host linking to itself carries no ranking information
    and would only slow mixing. Output: (src, dst, weight).
    """
    return (
        links.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = "weight",
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iters: int = 250,
    fixed_iters: int | None = None,
) -> DataFrame:
    """Weighted PageRank by power iteration. Returns (id, rank), ranks
    summing to 1 over all vertices (sources and sinks alike).

    The L1 step delta contracts by ~`damping` per iteration, so reaching
    tol=1e-9 from a cold start takes ~130 rounds — the default budget
    leaves headroom; tighter tolerances need proportionally more.

    `fixed_iters` runs EXACTLY that many iterations (no convergence test,
    no tol raise) — deterministic replay for audits and for twin checks
    against an independent fixed-iteration implementation, where both
    sides must take the same number of power steps to agree.

    Per iteration the driver runs exactly ONE scalar aggregation: the
    L1 delta of the step (the convergence test) fused with the dangling
    mass of the NEW ranks, which the next iteration needs — power
    iteration requires the dangling scalar before the following step can
    be formed, so it is carried forward rather than re-probed.
    Everything else is executor-side.
    Raises if `max_iters` is exhausted before the L1 delta falls under
    `tol` — silently-unconverged ranks are worse than no ranks.

    `weight_col=None` treats every edge as weight 1.
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        (F.col(weight_col) if weight_col else F.lit(1)).cast("double").alias("w"),
    )
    # out-strength per source; edges carry their contribution fraction
    out = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = (
        e.join(out, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
        .localCheckpoint()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))
    src_ids = e.select(F.col("src").alias("id")).distinct()
    # is_dangling is a static property of the graph — compute once
    ranks = (
        verts.join(src_ids.withColumn("_has_out", F.lit(True)), "id", "left")
        .select(
            "id",
            F.lit(1.0 / n).alias("rank"),
            F.coalesce(F.col("_has_out"), F.lit(False)).alias("has_out"),
        )
        .localCheckpoint()
    )
    base = (1.0 - damping) / n
    dangling = (
        ranks.where(~F.col("has_out")).agg(F.sum("rank")).collect()[0][0] or 0.0
    )
    for _ in range(fixed_iters if fixed_iters is not None else max_iters):
        contrib = (
            e.join(
                ranks.select(F.col("id").alias("src"), "rank"),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum(F.col("frac") * F.col("rank")).alias("_in"))
            .withColumnRenamed("dst", "id")
        )
        stepped = (
            ranks.join(contrib, "id", "left")
            .select(
                "id",
                "has_out",
                "rank",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("_new"),
            )
            .localCheckpoint()
        )
        row = stepped.agg(
            F.sum(F.abs(F.col("_new") - F.col("rank"))).alias("_delta"),
            F.sum(F.when(~F.col("has_out"), F.col("_new")).otherwise(0.0)).alias(
                "_dangling"
            ),
        ).collect()[0]
        delta, dangling = row["_delta"] or 0.0, row["_dangling"] or 0.0
        # stepped is checkpointed; this select keeps lineage depth 1, so
        # no second checkpoint job is needed per iteration
        ranks = stepped.select("id", F.col("_new").alias("rank"), "has_out")
        if fixed_iters is None and delta < tol:
            return ranks.select("id", "rank")
    if fixed_iters is not None:
        return ranks.select("id", "rank")
    raise RuntimeError(f"pagerank did not converge in {max_iters} iterations")


def rank_priorities(
    ranks: DataFrame, levels: int = 10, exact: bool = False
) -> DataFrame:
    """Discretize PageRank scores into integer frontier priorities
    0..levels-1 (higher = more important), joinable onto frontier rows
    by host — the global analogue of the reference's static product-URL
    priority (pkg/scraper/scraper.go priority rules).

    A global percent_rank/ntile window would funnel every vertex through
    one partition; instead the level boundaries come from one
    quantile pass (driver gets `levels-1` doubles) and each row
    buckets itself against the broadcast thresholds with an array
    comparison — one scan, no global shuffle, scale-indifferent.

    ``exact=False`` (default) uses approxQuantile (Greenwald-Khanna,
    single streaming pass, bounded memory — the 10^9-host default);
    ``exact=True`` uses the exact ``percentile`` aggregate (linear
    interpolation, same definition as SQL quantile_cont), which buffers
    per-partition values and is for audit-grade tiering at dim-table
    scale. Same output contract either way.
    """
    if levels < 2:
        raise ValueError("levels must be >= 2")
    ps = [i / levels for i in range(1, levels)]
    if exact:
        row = ranks.agg(
            F.percentile("rank", F.array(*[F.lit(p) for p in ps]))
        ).first()
        qs = list(row[0]) if row and row[0] is not None else []
    else:
        qs = ranks.approxQuantile("rank", ps, 1e-4)
    thresholds = F.array(*[F.lit(float(q)) for q in qs])
    return ranks.withColumn(
        "priority",
        F.size(F.filter(thresholds, lambda t: F.col("rank") > t)).cast("int"),
    )


def anchor_text_topk(
    links: DataFrame,
    k: int = 5,
    dst_col: str = "dst_url",
    text_col: str = "anchor_text",
    src_host_col: str | None = "src_host",
) -> DataFrame:
    """Top-k anchor texts per link target — the classic off-page signal
    (anchor text describes the TARGET better than the target's own page;
    every large-scale web corpus and search stack aggregates it).

    Input: one row per extracted link (target URL, anchor text, and
    optionally the linking host). Anchor text is normalized (trim +
    whitespace collapse + lowercase); empty/null anchors are dropped.
    Output: (dst, anchor, n_links, n_hosts, rn) — the k most frequent
    anchors per target, rn = 1 the most frequent, n_hosts the number of
    DISTINCT linking hosts backing the anchor (1 when `src_host_col` is
    None), so downstream quality filters can ignore single-host anchor
    spam.

    Scale notes (10^10 links): one (dst, anchor) aggregation with
    map-side partial count + count_distinct, then a top-k window whose
    literal bound plans as WindowGroupLimit (map-side partial top-k
    below the dst shuffle) — never a global sort. Ordering inside a
    target is deterministic: count desc, hosts desc, anchor asc.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    anchor = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    rows = links.select(
        F.col(dst_col).alias("dst"),
        anchor.alias("anchor"),
        (
            F.col(src_host_col) if src_host_col else F.lit("")
        ).alias("_src_host"),
    ).where(F.col("anchor").isNotNull() & (F.col("anchor") != ""))
    agg = rows.groupBy("dst", "anchor").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.count_distinct(F.col("_src_host")).alias("n_hosts"),
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("n_links").desc(), F.col("n_hosts").desc(), F.col("anchor").asc()
    )
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.lit(k))
    )
