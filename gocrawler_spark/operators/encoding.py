"""Charset detection + decoding for fetched pages.

The engine's readers and extractor treat ``html`` bytes as UTF-8 with
replacement (htmlmini.parse_html) — right for the synthetic corpora and
for the modern-web majority, but a real crawl meets legacy encodings
(historically ~10-20% of Common Crawl responses are non-UTF-8:
windows-1252/gbk/shift_jis/iso-8859-*). This module is the
normalization stage a webtext pipeline runs BEFORE text ops: detect
each page's charset and decode to proper UTF-8 strings once, so
dedup/quality/language-id downstream never see mojibake.

Detection follows the WHATWG precedence that browsers implement:

1. byte-order mark (UTF-8 / UTF-16 LE / UTF-16 BE);
2. ``charset=`` parameter of the HTTP ``Content-Type`` header, when the
   caller passes that column;
3. ``<meta charset=...>`` / ``<meta http-equiv="Content-Type"
   content="...; charset=...">`` within the first 2048 bytes (the
   spec's prescan window is 1024; 2048 absorbs long head boilerplate);
4. UTF-8 fallback.

Names are validated through :func:`codecs.lookup`; unknown or
unsupported labels fall back to UTF-8. Decoding always uses
``errors='replace'`` — a crawl must never fail on a mislabeled page.

Scale shape: the sniff reads ≤2048 bytes per page and the decode is one
C-codec call — both inside a single ``mapInPandas`` pass (Arrow-batched;
the html column crosses the boundary once, the same contract as the
extract kernel). There is no JVM-side path: charset sniffing is a
byte-pattern + codec-registry problem, the honest Pandas-UDF case.
"""

from __future__ import annotations

import codecs
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField

__all__ = ["sniff_charset", "decode_html"]

# bytes-level meta scans (work on the raw head for any ASCII-compatible
# encoding; UTF-16 pages are caught earlier by their BOM)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-:.]+)", re.I
)
_META_HTTPEQUIV_RE = re.compile(
    rb"<meta[^>]+content\s*=\s*[\"'][^\"']*charset=([a-zA-Z0-9_\-:.]+)", re.I
)
_CT_CHARSET_RE = re.compile(r"charset=([a-zA-Z0-9_\-:.]+)", re.I)

_PRESCAN = 2048


def _canon(label) -> str | None:
    """Validate a charset label against the codec registry; canonical
    python codec name or None."""
    if not label:
        return None
    if isinstance(label, (bytes, bytearray)):
        label = bytes(label).decode("ascii", "replace")
    try:
        return codecs.lookup(label.strip()).name
    except LookupError:
        return None


def sniff_charset(head: bytes, content_type: str | None = None) -> str:
    """WHATWG-order charset for one page: BOM > HTTP Content-Type >
    meta prescan > 'utf-8'. ``head`` need only be the first ~2 KB."""
    if head.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"  # -sig: the codec consumes the BOM
    if head.startswith(b"\xff\xfe") or head.startswith(b"\xfe\xff"):
        # bare 'utf-16' reads endianness FROM the BOM and consumes it
        # (utf-16-le/-be would decode the BOM as a spurious U+FEFF)
        return "utf-16"
    if content_type:
        m = _CT_CHARSET_RE.search(content_type)
        if m:
            c = _canon(m.group(1))
            if c:
                return c
    window = head[:_PRESCAN]
    m = _META_CHARSET_RE.search(window) or _META_HTTPEQUIV_RE.search(window)
    if m:
        c = _canon(m.group(1))
        if c:
            return c
    return "utf-8"


def decode_html(
    pages: DataFrame,
    html_col: str = "html",
    mime_col: str | None = None,
    out_col: str = "html_text",
    charset_col: str = "charset",
) -> DataFrame:
    """pages with a binary ``html_col`` -> same rows plus ``out_col``
    (UTF-8 string, errors replaced) and ``charset_col`` (the detected
    source charset, for corpus audits — charset distribution per host is
    a standard crawl-quality signal). NULL html -> NULL in both."""

    fields = list(pages.schema.fields) + [
        StructField(out_col, StringType()),
        StructField(charset_col, StringType()),
    ]
    from pyspark.sql.types import StructType

    schema = StructType(fields)
    cols = pages.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, charsets = [], []
            mimes = pdf[mime_col] if mime_col else None
            for i, blob in enumerate(pdf[html_col]):
                if blob is None:
                    texts.append(None)
                    charsets.append(None)
                    continue
                b = bytes(blob)
                enc = sniff_charset(
                    b[: _PRESCAN + 3],
                    mimes.iloc[i] if mimes is not None else None,
                )
                texts.append(b.decode(enc, errors="replace"))
                charsets.append(enc)
            pdf = pdf[cols].copy()
            pdf[out_col] = texts
            pdf[charset_col] = charsets
            yield pdf

    return pages.mapInPandas(run, schema)
