"""Charset sniffing/decoding vs Python's own codecs over planted
legacy-encoding pages (BOMs, meta labels, header override, mojibake)."""

import pytest

from gocrawler_spark.operators.encoding import decode_html, sniff_charset

LATIN1 = "<html><meta charset=iso-8859-1><body>café crème ±1°?</body></html>"
HTTPEQUIV = (
    '<html><head><meta http-equiv="Content-Type" '
    'content="text/html; charset=windows-1252"></head>'
    "<body>smart ‘quotes’ naïve</body></html>"
)
GBK = "<html><meta charset=gbk><body>你好，世界</body></html>"
PLAIN = "<html><body>plain utf-8 ünïcødé</body></html>"
UTF16 = "<html><body>utf-16 page ✓</body></html>"


@pytest.mark.parametrize(
    "head, ct, want",
    [
        (b"\xef\xbb\xbfabc", None, "utf-8-sig"),
        (b"\xff\xfea\x00", None, "utf-16"),
        (b"\xfe\xff\x00a", None, "utf-16"),
        (LATIN1.encode("latin-1"), None, "iso8859-1"),
        (HTTPEQUIV.encode("cp1252"), None, "cp1252"),
        (GBK.encode("gbk"), None, "gbk"),
        (PLAIN.encode(), None, "utf-8"),
        # HTTP header beats the meta tag (WHATWG precedence)
        (LATIN1.encode("latin-1"), "text/html; charset=KOI8-R", "koi8-r"),
        # unknown labels fall back
        (b"<meta charset=martian-9>x", None, "utf-8"),
        (b"x", "text/html; charset=blorp", "utf-8"),
    ],
)
def test_sniff_charset(head, ct, want):
    assert sniff_charset(head, ct) == want


def test_decode_html_roundtrips_legacy_pages(spark):
    rows = [
        ("u1", LATIN1.encode("latin-1"), "text/html"),
        ("u2", HTTPEQUIV.encode("cp1252"), "text/html"),
        ("u3", GBK.encode("gbk"), "text/html"),
        ("u4", PLAIN.encode(), "text/html"),
        ("u5", b"\xff\xfe" + UTF16.encode("utf-16-le"), "text/html"),
        # header override: bytes are latin-1 but meta is missing
        ("u6", "résumé".encode("latin-1"), "text/html; charset=latin-1"),
        ("u7", None, "text/html"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary, mime string")
    got = {
        r["url"]: (r["html_text"], r["charset"])
        for r in decode_html(df, mime_col="mime").collect()
    }
    assert got["u1"] == (LATIN1, "iso8859-1")
    assert got["u2"] == (HTTPEQUIV, "cp1252")
    assert got["u3"] == (GBK, "gbk")
    assert got["u4"] == (PLAIN, "utf-8")
    assert got["u5"] == (UTF16, "utf-16")  # BOM consumed by the codec
    assert got["u6"] == ("résumé", "iso8859-1")
    assert got["u7"] == (None, None)
    # the wrong default would have produced mojibake: prove the stakes
    assert "café" in got["u1"][0]
    assert LATIN1.encode("latin-1").decode("utf-8", "replace") != LATIN1


def test_crawl_decode_charsets_extracts_ground_truth_text(spark, tmp_path):
    """Verdict r4 #5: decode wired into the crawl. Two product pages
    are re-encoded as gbk and latin-1 (meta-labeled); with
    decode_charsets=True their extracted item descriptions must equal
    the utf-8 ground truth, fetch_log records the sniffed charset, and
    the round metrics carry a charset histogram. Without decode the gbk
    page extracts mojibake."""
    from pyspark.sql import functions as F

    from gocrawler_spark.datagen import crawl_corpus
    from gocrawler_spark.plans.crawl import CrawlConfig, CrawlJob
    from gocrawler_spark.tables.catalog import SnapshotCatalog

    from .conftest import pages_df, robots_df, seeds_df

    pages, seeds, robots, hosts, profile = crawl_corpus(40, 2)
    prods = [p for p in pages if "detproducto" in p["url"]]
    pg, pl = prods[0], prods[1]
    inj_g = "Descripción 世界 del producto"
    inj_l = "Descripción café del producto"

    def rewrite(p, meta, inject, codec):
        s = p["html"].decode("utf-8")
        s = s.replace("Descripcion del producto", inject)
        s = s.replace("<head>", f'<head>\n  <meta charset="{meta}">', 1)
        return dict(p, html=s.encode(codec))

    def corpus(meta_g, codec_g, meta_l, codec_l):
        out = []
        for p in pages:
            if p is pg:
                out.append(rewrite(p, meta_g, inj_g, codec_g))
            elif p is pl:
                out.append(rewrite(p, meta_l, inj_l, codec_l))
            else:
                out.append(p)
        return out

    truth = corpus("utf-8", "utf-8", "utf-8", "utf-8")
    planted = corpus("gbk", "gbk", "iso-8859-1", "iso-8859-1")
    # seed the two pages directly so round 1 fetches them
    seeds = seeds + [
        {"url": pg["url"], "priority": 0},
        {"url": pl["url"], "priority": 0},
    ]

    def run(tag, rows, **cfg):
        cat = SnapshotCatalog(str(tmp_path / tag), spark)
        job = CrawlJob(
            spark, cat, profile,
            CrawlConfig(credit_per_host=4, max_rounds=2, salt_parts=4,
                        n_buckets=8, **cfg),
        )
        job.init_run(seeds_df(spark, seeds), robots_df(spark, robots))
        job.run(pages_df(spark, rows))
        return cat

    def desc_of(cat, url):
        r = cat.read("items").where(F.col("url") == url).select("description").collect()
        assert len(r) == 1, url
        return r[0]["description"]

    t = run("truth", truth, decode_charsets=True)
    d = run("decoded", planted, decode_charsets=True)
    for u in (pg["url"], pl["url"]):
        assert desc_of(d, u) == desc_of(t, u)
    assert "世界" in desc_of(t, pg["url"])
    assert "café" in desc_of(t, pl["url"])

    # fetch_log carries the sniffed charset per OnResponse row
    log = d.read("fetch_log")
    got = {
        r["url"]: r["charset"]
        for r in log.where(F.col("url").isin(pg["url"], pl["url"])).collect()
    }
    assert got == {pg["url"]: "gbk", pl["url"]: "iso8859-1"}
    # and the round metrics carry the histogram
    import json as _json

    m1 = _json.loads(
        d.read("checkpoints_run").where(F.col("round") == 1).first()["metrics"]
    )
    assert "gbk=1" in m1["charsets"] and "iso8859-1=1" in m1["charsets"]
    assert "utf-8=" in m1["charsets"]

    # without decode, the gbk page extracts mojibake, not the truth
    raw = run("raw", planted)
    assert desc_of(raw, pg["url"]) != desc_of(t, pg["url"])
    assert "charset" not in raw.read("fetch_log").columns
