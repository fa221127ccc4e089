"""Vectorized page extraction — one ``mapInPandas`` pass per fetched batch.

SURVEY §2.9: the reference re-matches CSS selectors once per registered
callback; here each page's html crosses the Arrow boundary once and is
parsed once, with ALL extractors (E1, E3-E10, F9) running over the
single DOM. Output is fully columnar: links array, meta struct fields,
canonical text, captcha flag, nested item struct.

The heavy ``html`` binary column is touched ONLY here — frontier
bookkeeping never reads it, so parquet/Iceberg column pruning keeps
every other stage cheap (SURVEY §4).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..extract import extract_page
from ..profiles import PROFILES, SiteProfile, synthetic_profile

REVIEW_TYPE = StructType(
    [
        StructField("title", StringType()),
        StructField("content", StringType()),
        StructField("author", StringType()),
        StructField("stars", DoubleType()),
        StructField("date", TimestampType()),
    ]
)

ITEM_TYPE = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("brand", StringType()),
        StructField("description", StringType()),
        StructField("price_cents", LongType()),
        StructField("rating", DoubleType()),
        StructField("reviews", ArrayType(REVIEW_TYPE)),
        StructField("source_store", StringType()),
        StructField("url", StringType()),
        StructField("details", MapType(StringType(), StringType())),
    ]
)

EXTRACT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("url_hash", StringType()),
        StructField("host", StringType()),
        StructField("depth", IntegerType()),
        StructField("priority", IntegerType()),
        StructField("fetch_rank", IntegerType()),
        StructField("links", ArrayType(StringType())),
        StructField("text", StringType()),
        StructField("og_image", StringType()),
        StructField("twitter_image", StringType()),
        StructField("keywords", StringType()),
        StructField("description", StringType()),
        StructField("is_captcha", BooleanType()),
        StructField("item", ITEM_TYPE),
    ]
)


def _profile_spec(profile: SiteProfile):
    """Serializable profile reference for executor-side reconstruction."""
    if profile.name in PROFILES:
        return ("named", profile.name)
    return ("synthetic", tuple(profile.allowed_domains))


def _resolve_profile(spec) -> SiteProfile:
    kind, arg = spec
    if kind == "named":
        return PROFILES[arg]
    return synthetic_profile(arg)


def extract_fetched(
    fetched: DataFrame,
    profile: SiteProfile,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """fetched(url, url_hash, host, depth, priority, fetch_rank, html) ->
    EXTRACT_SCHEMA rows. html=null rows must be filtered out by the
    caller (they are the OnError path).

    ``passthrough``: extra input columns carried through the kernel
    verbatim (appended after the EXTRACT_SCHEMA fields) — e.g. the
    decode stage's ``charset`` so fetch_log lineage can record it
    without a second pages-scan join. Strings only (the crawl's use);
    the rows keep their batch order so the columns attach positionally.
    """
    spec = _profile_spec(profile)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        prof = _resolve_profile(spec)
        for pdf in batches:
            rows = []
            for url, uh, host, depth, prio, rank, html in zip(
                pdf["url"], pdf["url_hash"], pdf["host"], pdf["depth"],
                pdf["priority"], pdf["fetch_rank"], pdf["html"],
            ):
                ex = extract_page(url, bytes(html), prof)
                item = ex["item"]
                if item is not None:
                    item = dict(item)
                    item["reviews"] = [
                        (r["title"], r["content"], r["author"], r["stars"], r["date"])
                        for r in item["reviews"]
                    ]
                    item = (
                        item["id"], item["name"], item["brand"], item["description"],
                        item["price_cents"], item["rating"], item["reviews"],
                        item["source_store"], item["url"], item["details"],
                    )
                rows.append(
                    (
                        url, uh, host, depth, prio, rank,
                        ex["links"], ex["text"], ex["og_image"], ex["twitter_image"],
                        ex["keywords"], ex["description"], ex["is_captcha"], item,
                    )
                )
            out = pd.DataFrame(
                rows, columns=[f.name for f in EXTRACT_SCHEMA.fields]
            )
            for p in passthrough:
                out[p] = pd.Series(list(pdf[p]), dtype=object)
            yield out

    cols = ["url", "url_hash", "host", "depth", "priority", "fetch_rank", "html"]
    schema = EXTRACT_SCHEMA
    if passthrough:
        schema = StructType(
            list(EXTRACT_SCHEMA.fields)
            + [StructField(p, StringType()) for p in passthrough]
        )
    return fetched.select(*cols, *passthrough).mapInPandas(run, schema)


PROXY_SCHEMA = StructType(
    [
        StructField("src_url", StringType()),
        StructField("ip", StringType()),
        StructField("port", LongType()),  # Go int is 64-bit (Atoi clamp)
        StructField("code", StringType()),
        StructField("country", StringType()),
        StructField("anonymity", StringType()),
        StructField("google", BooleanType()),
        StructField("ssl", BooleanType()),
    ]
)


def proxy_list_rows(pages: DataFrame) -> DataFrame:
    """S11 — proxy-list scrape source (switcher.go:75-146), structurally
    S2+E1: 'fetch' = the pages table, extraction = the proxylisttable
    parse. One mapInPandas pass; html touched only here."""
    from ..extract import extract_proxy_list

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                for p in extract_proxy_list(bytes(html)):
                    rows.append(
                        (url, p["ip"], p["port"], p["code"], p["country"],
                         p["anonymity"], p["google"], p["ssl"])
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in PROXY_SCHEMA.fields])

    return pages.select("url", "html").mapInPandas(run, PROXY_SCHEMA)
