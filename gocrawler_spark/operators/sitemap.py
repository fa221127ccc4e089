"""Sitemap XML parsing — sitemaps.org protocol documents into frontier
candidates.

``robots_sitemaps`` (operators/robots_parse.py) surfaces ``Sitemap:``
URLs from robots.txt; once the crawl fetches those documents they land
in ``pages`` like any other response, and this module finishes the
discovery arc: ``<urlset>`` entries become frontier candidates (with
``<lastmod>`` for recrawl scheduling — operators/recrawl.py consumes
exactly such freshness hints), ``<sitemapindex>`` entries are FURTHER
sitemap fetches, i.e. rows to route back into the fetch frontier. The
reference crawler has no sitemap stage (colly's loop is link-following
only — pkg/scraper/scraper.go); this is part of the web-scale frontier
extension, same tier as URL canonicalization.

Parsing is the whole sitemaps.org grammar that matters at corpus scale
and nothing more: ``<url>``/``<sitemap>`` blocks, ``<loc>`` (required,
XML-entity-unescaped, whitespace-trimmed per spec), optional
``<lastmod>`` in W3C datetime (date-only or full timestamp with 'Z' or
numeric offset). Namespaced/malformed blocks without a ``<loc>`` are
dropped. It is deliberately NOT a general XML parser — sitemap files
are machine-generated, the protocol pins the element names, and a
regexp-block scan stays entirely JVM-side (regexp_extract_all +
explode: one vectorized stage, no Python UDF), which is what lets a
10^6-file sitemap sweep run as a plain column pipeline over fetched
pages. Entity handling covers the five XML built-ins (&amp; &lt; &gt;
&quot; &apos;) — the only escapes the protocol requires in <loc>.

A 50k-URL sitemap (the spec's max) explodes to 50k rows from one page
row — fine: explode is generated columnar-side, and the downstream
admission/seen pipeline is exactly the one crawl candidates already
take.

Relation to ``robots_parse.sitemap_candidates``: that one is the FLAT
streaming feed (url+depth only, loc-regex single pass — the minimal
shape ``start_frontier_ingest`` consumes); this one is the structured
parser (entry kind, lastmod, per-host rows) for recrawl scheduling and
index-vs-frontier bookkeeping. Same grammar, same entity/CDATA
handling, different output contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .frontier import _host_of
from .robots_parse import _body_str

__all__ = ["parse_sitemap_pages"]

# one <url> or <sitemap> block; (?s) so entries may span lines
_BLOCK_RE = r"(?s)<(?:url|sitemap)>.*?</(?:url|sitemap)>"
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"


def _xml_unescape(col):
    # &amp; last, so '&amp;lt;' decodes to '&lt;' (one level), not '<'
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _lastmod_ms(col):
    """W3C datetime -> epoch ms: date-only, 'Z' suffix, or numeric
    offset; anything else (or absent) -> NULL."""
    ts = F.coalesce(
        # try_*: a malformed lastmod is NULL, never a failed job (ANSI-safe)
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")),
    )
    return (ts.cast("double") * 1000).cast("long")


def parse_sitemap_pages(
    pages: DataFrame, url_col: str = "url", body_col: str = "html"
) -> DataFrame:
    """Fetched sitemap documents -> one row per entry:
    (host, sitemap_url, kind, loc, lastmod_ms).

    * ``kind`` = 'url' (a ``<urlset>`` member: a frontier candidate) or
      'sitemap' (a ``<sitemapindex>`` member: fetch it next round);
    * ``loc`` — trimmed, XML-unescaped target;
    * ``lastmod_ms`` — epoch ms of ``<lastmod>`` or NULL; candidates
      with a fresher lastmod than their stored fetch time are exactly
      what recrawl_schedule re-enqueues first.

    Feed rows whose URLs are known sitemaps (e.g. the output of
    ``robots_sitemaps`` joined onto fetched pages); the parser itself
    keys nothing on the URL shape.
    """
    body = _body_str(pages, body_col)
    blocks = pages.select(
        _host_of(F.col(url_col)).alias("host"),
        F.col(url_col).alias("sitemap_url"),
        F.explode(F.regexp_extract_all(body, F.lit(_BLOCK_RE), F.lit(0))).alias(
            "block"
        ),
    )
    loc = F.regexp_extract("block", _LOC_RE, 1)
    # unwrap CDATA (the protocol allows it; escapes don't apply inside)
    loc = F.regexp_replace(
        F.regexp_replace(loc, r"^<!\[CDATA\[\s*", ""), r"\s*\]\]>$", ""
    )
    return (
        blocks.select(
            "host",
            "sitemap_url",
            F.when(F.col("block").startswith("<sitemap>"), F.lit("sitemap"))
            .otherwise(F.lit("url"))
            .alias("kind"),
            _xml_unescape(loc).alias("loc"),
            _lastmod_ms(
                F.nullif(F.regexp_extract("block", _LASTMOD_RE, 1), F.lit(""))
            ).alias("lastmod_ms"),
        )
        .where(F.col("loc") != "")
    )
