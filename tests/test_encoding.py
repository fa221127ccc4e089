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
