"""Politeness-aware per-host fetch-set selection (O3) — window-ranked,
salt-split for skew.

The reference caps in-flight requests per domain at 4 with a random
0-6 s delay (colly LimitRule, /root/reference/pkg/scraper/scraper.go:101-105).
In batch form the budget becomes a per-host **credit**: each round may
fetch at most ``credit`` URLs per host, chosen deterministically by
``(priority, url)`` — the deterministic-order spec (SURVEY §2.6 O4).

Skew: a mega-host (30% of the frontier in our fixture) would make the
single ``Window.partitionBy(host)`` rank a straggler task at scale. So
selection is two-phase and exact:

1. rank within ``(host, salt)`` where ``salt = pmod(xxhash64(url), S)``
   — S-way parallel, each salt keeps its best ``credit`` rows, so phase
   2 sees at most ``S * credit`` rows per host;
2. re-rank the survivors within ``host`` and keep ``credit``.

Phase 2's partitions are tiny by construction (bounded by S*credit),
so the global sort per host never concentrates a mega-host's frontier
on one task. Result is byte-identical to the unsalted single window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_fetch_set(
    candidates: DataFrame,
    credit_per_host: int,
    salt_parts: int = 16,
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("priority", "url"),
) -> DataFrame:
    """Annotate candidates with ``fetch_rank``; rows with
    ``fetch_rank <= credit_per_host`` are this round's fetch set, the
    rest stay in the frontier (caller splits on ``is_selected``)."""
    order = [F.col(c) for c in order_cols]

    salted = candidates.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_parts))
    )
    w1 = Window.partitionBy(host_col, "_salt").orderBy(*order)
    phase1 = salted.withColumn("_r1", F.row_number().over(w1))

    survivors = phase1.filter(F.col("_r1") <= credit_per_host)
    rest = phase1.filter(F.col("_r1") > credit_per_host).withColumn(
        "fetch_rank", F.lit(None).cast("int")
    )

    w2 = Window.partitionBy(host_col).orderBy(*order)
    ranked = survivors.withColumn("fetch_rank", F.row_number().over(w2))

    out = ranked.unionByName(rest).drop("_salt", "_r1")
    return out.withColumn(
        "is_selected",
        F.coalesce(F.col("fetch_rank") <= credit_per_host, F.lit(False)),
    )


def host_stats(frontier: DataFrame, host_col: str = "host") -> DataFrame:
    """A7 — per-host frontier stats feeding credit allocation."""
    return frontier.groupBy(host_col).agg(
        F.count("*").alias("pending_urls"),
        F.min("discovered_round").alias("oldest_round"),
        F.min("depth").alias("min_depth"),
    )
