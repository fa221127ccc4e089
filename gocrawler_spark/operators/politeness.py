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


def host_credit_col(
    default_credit: int,
    round_budget_ms: int | None = None,
    delay_col: str = "crawl_delay_ms",
):
    """Per-host politeness credit: with a round budget, a host with
    crawl-delay d may sustain budget/d fetches per round (the batch form
    of colly's Parallelism+RandomDelay budget); hosts without a delay
    rule get the default."""
    if round_budget_ms is None:
        return F.lit(default_credit)
    return F.when(
        F.col(delay_col).isNotNull() & (F.col(delay_col) > 0),
        F.greatest(F.floor(F.lit(round_budget_ms) / F.col(delay_col)), F.lit(1)),
    ).otherwise(F.lit(default_credit)).cast("int")


def select_fetch_set(
    candidates: DataFrame,
    credit_per_host: int,
    salt_parts: int = 16,
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("priority", "url"),
    credit_col: str | None = None,
) -> DataFrame:
    """Annotate candidates with ``fetch_rank``; rows with
    ``fetch_rank <= credit`` are this round's fetch set, the rest stay
    in the frontier (caller splits on ``is_selected``). ``credit_col``
    names a per-row (per-host) credit column; otherwise the uniform
    ``credit_per_host`` applies."""
    order = [F.col(c) for c in order_cols]
    credit = F.col(credit_col) if credit_col else F.lit(credit_per_host)

    salted = candidates.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_parts))
    )
    w1 = Window.partitionBy(host_col, "_salt").orderBy(*order)
    phase1 = salted.withColumn("_r1", F.row_number().over(w1))

    survivors = phase1.filter(F.col("_r1") <= credit)
    rest = phase1.filter(F.col("_r1") > credit).withColumn(
        "fetch_rank", F.lit(None).cast("int")
    )

    w2 = Window.partitionBy(host_col).orderBy(*order)
    ranked = survivors.withColumn("fetch_rank", F.row_number().over(w2))

    # is_selected is decided PER BRANCH before the union (r6). Values
    # are identical to the old post-union coalesce(fetch_rank <= credit,
    # false) — survivors' fetch_rank is never null, rest's was null ->
    # false — but the branch-local predicate keeps the selection filter
    # a plain `row_number <= literal` comparison, which is the shape
    # Spark's InsertWindowGroupLimit rule needs: a downstream
    # .filter("is_selected") now plans phase 2 with a WindowGroupLimit
    # (partial top-k below the host shuffle) instead of fully ranking
    # every survivor. (The old coalesce() wrapper suppressed the rule —
    # plan-diffed in plans/r06/schedule_dedupe_{before,after}.txt.)
    # The per-row credit-column path keeps the coalesce: its credit can
    # be nullable (so the bare comparison would loosen the column's
    # nullability), and a non-literal bound never group-limits anyway.
    sel = (
        F.col("fetch_rank") <= credit
        if credit_col is None
        else F.coalesce(F.col("fetch_rank") <= credit, F.lit(False))
    )
    ranked = ranked.withColumn("is_selected", sel)
    rest = rest.withColumn("is_selected", F.lit(False))
    return ranked.unionByName(rest).drop("_salt", "_r1")


def host_stats(frontier: DataFrame, host_col: str = "host") -> DataFrame:
    """A7 — per-host frontier stats feeding credit allocation."""
    return frontier.groupBy(host_col).agg(
        F.count("*").alias("pending_urls"),
        F.min("discovered_round").alias("oldest_round"),
        F.min("depth").alias("min_depth"),
    )


def error_backoff_credits(
    fetch_log: DataFrame,
    base_credit: int,
    current_round: int,
    lookback_rounds: int = 3,
    min_credit: int = 1,
) -> DataFrame:
    """Per-host ADAPTIVE politeness credit from recent fetch outcomes:
    ``credit = max(min_credit, round(base * success_rate))`` over the
    last ``lookback_rounds`` rounds — a host throwing errors (timeouts,
    404 storms, blocks, rate-limit pages) is throttled toward a probe
    rate instead of burning the round's budget on it; a recovered host
    climbs back to the full base as clean responses re-enter the
    window. This is the batch form of the backoff every production
    crawler layers onto its rate limiter (the reference's colly setup
    has only the static LimitRule — scraper.go:101-105 — this is part
    of the web-scale frontier extension).

    Input: fetch_log lineage rows (url, round, callback — 'OnResponse'
    / 'OnError', plans/crawl._commit_fetch_log). Output: one row per
    host seen in the window, ``(host, _ad_credit int)``; hosts absent
    from the window keep the caller's base (left join + coalesce).

    Scale: one filter + groupBy(host) over the window's lineage rows —
    host-count output, joinable via AQE (broadcasts while small). At
    10^10-row logs, partition fetch_log by round so the window filter
    prunes files, or maintain a rolling per-host outcome table.
    """
    from ..operators.frontier import _host_of

    window = fetch_log.filter(
        (F.col("round") > current_round - lookback_rounds)
        & (F.col("round") <= current_round)
    )
    return (
        window.groupBy(_host_of(F.col("url")).alias("host"))
        .agg(F.avg((F.col("callback") == "OnResponse").cast("double")).alias("_ok"))
        .select(
            "host",
            F.greatest(
                F.lit(min_credit),
                F.round(F.lit(base_credit) * F.col("_ok")).cast("int"),
            ).alias("_ad_credit"),
        )
    )
