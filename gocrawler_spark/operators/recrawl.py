"""Recrawl scheduling: change-rate estimation + revisit prioritization.

The reference is a single-shot scraper (pkg/scraper/scraper.go runs a
seed list to exhaustion), but a production frontier re-visits: the
question "which of 10^10 known URLs deserve this round's fetch budget"
is answered by estimating each page's change rate from its own fetch
history and prioritizing by probability-of-having-changed.

Estimator: Cho & Garcia-Molina, "Estimating Frequency of Change" (ACM
TOIT 3(3), 2003). Changes between visits are Poisson; with n compared
revisits of which X detected a change, the bias-corrected MLE of the
per-interval change intensity is

    lambda_hat = -ln((n - X + 0.5) / (n + 0.5))        [per interval]

(the +0.5 Jeffreys correction keeps X = n finite). Divided by the mean
revisit interval it becomes a rate per time unit, and the probability a
page changed since its last fetch at age `a` is 1 - exp(-rate * a).

Everything is DataFrame built-ins: one lag window partitioned by url
(each partition = one URL's short fetch history), one groupBy(url).

Scale notes (100 TB / 10^10 URLs):
 - The window partitions by url: 10^10 tiny partitions spread evenly —
   no global sort, no skew pivot (a URL's history is tens of rows).
 - The per-host top-k selection reuses the frontier's WindowGroupLimit
   shape (operators/politeness.py / select_fetch_set): the literal
   rank bound makes Spark push a map-side partial top-k below the
   shuffle, so per-host budgets never materialize a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .frontier import _host_of

__all__ = ["change_rates", "recrawl_priorities", "select_recrawl_set"]


def change_rates(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Per-URL change statistics from a fetch-history table.

    Input rows: one per (url, fetch), with a monotonic numeric/timestamp
    column and a content hash (the crawl's fetch_log carries both; any
    digest column works — exact-dedup's content hash, a simhash, an
    ETag). Output: (url, n_fetches, n_changes, span, lambda_hat,
    change_rate, last_ts, last_hash) where

      n_changes   = revisits whose hash differs from the previous fetch
      lambda_hat  = -ln((n - X + 0.5)/(n + 0.5)), n = n_fetches - 1
      change_rate = lambda_hat / mean revisit interval (0 when a URL
                    was fetched once or all fetches share one timestamp)
    """
    # timestamps become seconds-since-epoch doubles up front, so span /
    # interval arithmetic is plain subtraction whatever the input type
    cmp = history.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("double").alias("ts"),
        F.col(hash_col).alias("h"),
    )
    # h as tiebreak: two fetches sharing a timestamp still compare in a
    # deterministic order under any partition layout
    w = Window.partitionBy("url").orderBy(F.col("ts").asc(), F.col("h").asc())
    cmp = cmp.withColumn("prev_h", F.lag("h").over(w))
    agg = cmp.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(
            F.when(
                F.col("prev_h").isNotNull() & (F.col("h") != F.col("prev_h")), 1
            ).otherwise(0)
        ).alias("n_changes"),
        (F.max("ts") - F.min("ts")).alias("span"),
        F.max("ts").alias("last_ts"),
        F.max_by("h", "ts").alias("last_hash"),
    )
    n = (F.col("n_fetches") - 1).cast("double")
    x = F.col("n_changes").cast("double")
    lam = F.when(n > 0, -F.log((n - x + 0.5) / (n + 0.5))).otherwise(F.lit(0.0))
    mean_interval = F.when(n > 0, F.col("span") / n).otherwise(F.lit(0.0))
    return agg.withColumn("lambda_hat", lam).withColumn(
        "change_rate",
        F.when(mean_interval > 0, F.col("lambda_hat") / mean_interval).otherwise(
            F.lit(0.0)
        ),
    )


def recrawl_priorities(
    history: DataFrame,
    now,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    hash_col: str = "content_hash",
    cold_start_p: float = 0.5,
) -> DataFrame:
    """Adds p_changed = P[page changed since its last fetch, at `now`].

    `now` is an explicit parameter (same time unit as `ts_col`), never
    wall-clock — scheduling must be deterministic and replayable. URLs
    without an estimable rate (single fetch, or zero observed span) get
    `cold_start_p`: they carry no evidence either way, and 0.5 keeps
    them competitive without starving measured URLs.
    """
    rates = change_rates(history, url_col, ts_col, hash_col)
    age = (F.lit(now) - F.col("last_ts")).cast("double")
    estimable = (F.col("n_fetches") > 1) & (F.col("span") > 0)
    return rates.withColumn(
        "p_changed",
        F.when(
            estimable,
            F.lit(1.0) - F.exp(-F.col("change_rate") * F.greatest(age, F.lit(0.0))),
        ).otherwise(F.lit(float(cold_start_p))),
    )


def select_recrawl_set(
    priorities: DataFrame,
    per_host_budget: int,
    url_col: str = "url",
) -> DataFrame:
    """Politeness-aware selection: top `per_host_budget` URLs per host by
    p_changed (descending; md5(url) tiebreak keeps the pick deterministic
    under any partition layout). The literal rank bound plans as
    WindowGroupLimit — map-side partial top-k before the host shuffle,
    the same shape the crawl's select_fetch_set relies on.
    """
    if per_host_budget < 1:
        raise ValueError("per_host_budget must be >= 1")
    w = Window.partitionBy("host").orderBy(
        F.col("p_changed").desc(), F.md5(F.col(url_col)).asc()
    )
    return (
        priorities.withColumn("host", _host_of(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.lit(per_host_budget))
        .drop("_rn")
    )
