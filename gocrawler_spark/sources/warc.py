"""WARC source — read Common-Crawl-style archives into the pages shape.

The engine's ``pages`` input (BASELINE input_hint: url, warc_ts, html,
text, lang) is exactly what a WARC response record carries, so this
module turns raw ``*.warc`` files into that DataFrame without any
driver-side parsing:

* the file is split into records by ``spark.read.text`` with
  ``lineSep = "WARC/1.0\\r\\n"`` — Spark's text source handles the
  record splitting distributed (the same trick used for any
  record-delimited format), so a 100 TB crawl shards across executors
  at file-split granularity;
* each record is parsed inside ``mapInPandas`` (WARC headers → url /
  date / type; the HTTP block after the first blank line → status,
  content-type, body).

Scope honesty: this reader handles uncompressed, UTF-8-decodable WARCs
(Spark's text source decodes UTF-8; real Common Crawl ships gzipped
WARCs whose member-per-record gzip framing needs a binary splitter —
at 100 TB you would point this same parse at a decompressing
``binaryFile``/custom datasource). Two further limits of the lineSep
split: a response body that itself contains the literal record marker
``WARC/1.0\\r\\n`` is split mid-body (first fragment truncated, rest
dropped as malformed) — the binary splitter above, which honors
Content-Length, removes this too; and only the record-terminating
``\\r\\n\\r\\n`` is stripped from bodies, so intentional trailing
newlines inside a body cannot be told apart from the terminator's
first CRLF. Records that are not ``response`` type or are malformed
are dropped, counted by the caller if needed.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

RECORD_SEP = "WARC/1.0\r\n"

WARC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("warc_type", StringType()),
        StructField("http_status", IntegerType()),
        StructField("mime", StringType()),
        StructField("html", StringType()),
    ]
)


def _parse_record(rec: str) -> tuple | None:
    """One WARC record body (text after the WARC/1.0 line) ->
    (url, date, type, status, mime, body) or None if malformed."""
    head, sep, rest = rec.partition("\r\n\r\n")
    if not sep:
        return None
    headers = {}
    for line in head.split("\r\n"):
        k, s, v = line.partition(":")
        if s:
            headers[k.strip().lower()] = v.strip()
    wtype = headers.get("warc-type", "")
    url = headers.get("warc-target-uri", "")
    date = headers.get("warc-date", "")
    if wtype != "response" or not url:
        return None
    http_head, sep2, body = rest.partition("\r\n\r\n")
    if not sep2:
        return None
    status, mime = 0, ""
    lines = http_head.split("\r\n")
    if lines and lines[0].startswith("HTTP/"):
        parts = lines[0].split(" ")
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    for line in lines[1:]:
        k, s, v = line.partition(":")
        if s and k.strip().lower() == "content-type":
            mime = v.strip()
    # strip exactly the record terminator (two CRLFs), not all newlines
    if body.endswith("\r\n\r\n"):
        body = body[:-4]
    return (url, date, wtype, status, mime, body)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) -> (url, warc_ts, html, http_status, mime) pages."""
    raw = spark.read.option("lineSep", RECORD_SEP).text(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf["value"]:
                if not rec or not rec.strip():
                    continue
                parsed = _parse_record(rec)
                if parsed is not None:
                    rows.append(parsed)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    recs = raw.mapInPandas(run, WARC_SCHEMA)
    return recs.select(
        "url",
        F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        F.encode("html", "utf-8").alias("html"),
        "http_status",
        "mime",
    )


def warc_bytes(records: list[dict]) -> bytes:
    """Serialize records ({url, warc_date, html, status?, mime?}) into a
    minimal WARC/1.0 byte stream — the test-fixture writer."""
    out = []
    for r in records:
        body = r["html"]
        if isinstance(body, bytes):
            body = body.decode("utf-8", "replace")
        http = (
            f"HTTP/1.1 {r.get('status', 200)} OK\r\n"
            f"Content-Type: {r.get('mime', 'text/html')}\r\n\r\n"
            f"{body}"
        )
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('warc_type', 'response')}\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r.get('warc_date', '2021-01-01T00:00:00Z')}\r\n"
            f"Content-Length: {len(http.encode())}\r\n\r\n"
        )
        out.append(head + http + "\r\n\r\n")
    return "".join(out).encode()
