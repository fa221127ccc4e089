"""parse_sitemap_pages vs an independent xml.etree reference parser
over a grammar battery (urlset/sitemapindex, entities, whitespace,
lastmod variants, malformed blocks)."""

import xml.etree.ElementTree as ET
from datetime import datetime, timezone

from gocrawler_spark.operators.sitemap import parse_sitemap_pages

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://a.example/p?x=1&amp;y=2&lt;3 </loc><lastmod>2021-06-01</lastmod></url>
  <url>
    <loc>https://a.example/q</loc>
    <lastmod>2021-06-02T03:04:05Z</lastmod>
  </url>
  <url><loc>https://a.example/r</loc><lastmod>2021-06-02T03:04:05+02:00</lastmod></url>
  <url><loc>https://a.example/s</loc><lastmod>2021-06-02T03:04:05-05:30</lastmod></url>
  <url><loc>https://a.example/nomod</loc></url>
  <url><lastmod>2021-01-01</lastmod></url>
  <url><loc>https://a.example/bad</loc><lastmod>not-a-date</lastmod></url>
  <url><loc><![CDATA[ https://a.example/cdata?x=1&y=2 ]]></loc></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://b.example/maps/sitemap1.xml.gz</loc><lastmod>2020-12-31T23:59:59Z</lastmod></sitemap>
  <sitemap><loc>https://b.example/maps/sitemap2.xml.gz</loc></sitemap>
</sitemapindex>"""


def _ref_entries(url, xml_text):
    """Independent reference: real XML parsing (ElementTree), real
    datetime parsing (fromisoformat), namespace-agnostic tags."""
    out = []
    host = url.split("/")[2]
    root = ET.fromstring(xml_text)
    for el in root:
        tag = el.tag.rsplit("}", 1)[-1]
        kind = "sitemap" if tag == "sitemap" else "url"
        loc = lastmod = None
        for ch in el:
            sub = ch.tag.rsplit("}", 1)[-1]
            if sub == "loc":
                loc = (ch.text or "").strip()  # ET folds CDATA into text
            elif sub == "lastmod":
                lastmod = (ch.text or "").strip()
        if not loc:
            continue
        ms = None
        if lastmod:
            try:
                dt = datetime.fromisoformat(lastmod.replace("Z", "+00:00"))
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                ms = int(dt.timestamp() * 1000)
            except ValueError:
                ms = None
        out.append((host, url, kind, loc, ms))
    return out


def test_parse_sitemap_matches_etree_reference(spark):
    pages = [
        ("https://a.example/sitemap.xml", URLSET),
        ("https://b.example/sitemap_index.xml", INDEX),
    ]
    df = spark.createDataFrame(
        [(u, x.encode()) for u, x in pages], "url string, html binary"
    )
    got = sorted(
        tuple(r) for r in parse_sitemap_pages(df).collect()
    )
    want = sorted(e for u, x in pages for e in _ref_entries(u, x))
    assert got == want
    assert len(got) == 9  # 7 urlset entries with loc + 2 index entries
    # entity unescape really happened
    assert any(loc == "https://a.example/p?x=1&y=2<3" for *_x, loc, _m in got)
    # CDATA unwrapped + trimmed
    assert any(loc == "https://a.example/cdata?x=1&y=2" for *_x, loc, _m in got)
    # whole parse stays JVM-side
    plan = (
        parse_sitemap_pages(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan


def test_sitemap_lastmod_feeds_recrawl_ordering(spark):
    """The discovery arc's point: urlset entries carry lastmod, so a
    frontier can prioritize fresher candidates — newest-first order here
    must match the reference timestamps."""
    df = spark.createDataFrame(
        [("https://a.example/sitemap.xml", URLSET.encode())],
        "url string, html binary",
    )
    rows = (
        parse_sitemap_pages(df)
        .where("lastmod_ms IS NOT NULL")
        .orderBy("lastmod_ms", ascending=False)
        .collect()
    )
    # -05:30 is the latest instant, date-only midnight the earliest
    assert [r["loc"].rsplit("/", 1)[-1] for r in rows] == ["s", "q", "r", "p?x=1&y=2<3"]
