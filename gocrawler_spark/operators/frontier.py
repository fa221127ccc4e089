"""Frontier candidate normalization + admission control (F1-F8).

The reference checks, *before* fetching: allowed domain (F1,
scraper.go:80), URLFilters regex (F2, scraper.go:84-86), visited set
(F4) and robots (F5) — colly requestCheck order [colly v1.2.0]. Depth
(F6) exists but is commented out (scraper.go:81).

Dialect note: the Go admission regexes are RE2; Spark ``rlike`` is Java
regex, and Java parses ``[...[...]...]`` character classes as *unions*
(a literal ``[`` inside a class means something different than in RE2).
The amazon pattern hits exactly that construct, so parity-critical
regex evaluation happens in a **vectorized pandas UDF running Python
``re``** (RE2-compatible for these patterns) — per input_hint all
per-row logic is pandas/Arrow vectorized, never JVM-dialect rlike.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..profiles import SiteProfile

FRONTIER_COLS = ["url", "url_hash", "host", "path", "depth", "priority", "discovered_round"]


def normalize_candidates(df: DataFrame) -> DataFrame:
    """Add url_hash (md5(url), scraper.go:112), host, path columns —
    all JVM-side built-ins (no UDF)."""
    return (
        df.withColumn("url_hash", F.md5(F.col("url")))
        .withColumn("host", F.parse_url(F.col("url"), F.lit("HOST")))
        .withColumn("path", F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("")))
    )


def admission_filter(
    df: DataFrame, profile: SiteProfile, max_depth: int | None = None
) -> DataFrame:
    """F1 (domain allowlist) + F2 (URL regex, Go-dialect) + F6 (depth)."""
    pattern = profile.link_extraction_query
    allowed = [d for d in profile.allowed_domains if "//" not in d]

    @pandas_udf("boolean")
    def url_admitted(urls: pd.Series) -> pd.Series:
        rx = re.compile(pattern)
        return urls.map(lambda u: bool(rx.search(u)) if u else False)

    out = df.filter(F.col("host").isin(allowed)).filter(url_admitted(F.col("url")))
    if max_depth is not None:
        out = out.filter(F.col("depth") <= max_depth)
    return out


def is_product_url(df: DataFrame, profile: SiteProfile) -> DataFrame:
    """F3 — product-page classifier column (mixup.go:29, amazon.go:46)."""
    pattern = profile.link_product_query

    @pandas_udf("boolean")
    def matches(urls: pd.Series) -> pd.Series:
        rx = re.compile(pattern)
        return urls.map(lambda u: bool(rx.search(u)) if u else False)

    return df.withColumn("is_product", matches(F.col("url")))


def response_revalidation(df: DataFrame, profile: SiteProfile) -> DataFrame:
    """F7 — post-fetch re-check (scraper.go:153-159): keep responses whose
    URL matches F2 OR contains '?sku='. Gates only the fetch_log
    (OnResponse tracking), not the HTML callbacks."""
    pattern = profile.link_extraction_query

    @pandas_udf("boolean")
    def ok(urls: pd.Series) -> pd.Series:
        rx = re.compile(pattern)
        return urls.map(lambda u: bool(rx.search(u)) or "?sku=" in u)

    return df.filter(ok(F.col("url")))
