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

Two readers:

* :func:`read_warc` — the lineSep split above; intra-file parallelism
  for big UNCOMPRESSED UTF-8 WARCs, but mis-splits a body containing
  the literal record marker and cannot read gzip. Kept for the
  huge-single-file case.
* :func:`read_warc_binary` — the Common-Crawl-faithful reader: one
  ``binaryFile`` row per ``*.warc``/``*.warc.gz`` file, records framed
  by **Content-Length** (so embedded ``WARC/1.0`` markers in bodies are
  fine) with transparent per-member (or whole-stream) gzip. Parallelism
  is per FILE — exactly Common Crawl's unit (a crawl is ~10^4-10^5
  ~1 GiB segment files, so a 1000-executor cluster saturates on file
  granularity; per-member gzip framing makes intra-file splits
  impossible for .gz anyway, which is why CC itself distributes work
  per file). Records that are not ``response`` type or are malformed
  are dropped, counted by the caller if needed.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
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
        # try_to_timestamp: WARC-Date is external-file content; under ANSI a
        # corrupt date in one record of a 100 TB scan must yield null,
        # not kill the stage
        F.try_to_timestamp("warc_date", F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("warc_ts"),
        F.encode("html", "utf-8").alias("html"),
        "http_status",
        "mime",
    )


BINARY_WARC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("warc_type", StringType()),
        StructField("http_status", IntegerType()),
        StructField("mime", StringType()),
        StructField("html", BinaryType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a stream of concatenated gzip members (Common Crawl's
    one-member-per-record framing) — or pass non-gzip bytes through."""
    import zlib

    if data[:2] != b"\x1f\x8b":
        return data
    out, buf = [], data
    while buf[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(31)  # 16+15: gzip framing
        out.append(d.decompress(buf))
        out.append(d.flush())
        rest = d.unused_data
        if len(rest) >= len(buf):  # no progress: corrupt tail, stop
            break
        buf = rest
    return b"".join(out)


def _iter_binary_records(data: bytes):
    """Yield (warc_headers: dict, block: bytes) framed by Content-Length
    — the spec-correct split, immune to record markers inside bodies."""
    i, n = 0, len(data)
    while i < n:
        j = data.find(b"WARC/", i)
        if j < 0:
            return
        he = data.find(b"\r\n\r\n", j)
        if he < 0:
            return
        headers = {}
        for line in data[j:he].decode("utf-8", "replace").split("\r\n")[1:]:
            k, s, v = line.partition(":")
            if s:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            i = he + 4  # unframed record: resync on the next marker
            continue
        block = data[he + 4 : he + 4 + clen]
        yield headers, block
        i = he + 4 + clen


def _parse_binary_record(headers: dict, block: bytes) -> tuple | None:
    """(warc headers, Content-Length-framed block) -> WARC_SCHEMA row;
    body stays bytes (charset-agnostic, like real crawl payloads)."""
    wtype = headers.get("warc-type", "")
    url = headers.get("warc-target-uri", "")
    if wtype != "response" or not url:
        return None
    http_head, sep, body = block.partition(b"\r\n\r\n")
    if not sep:
        return None
    status, mime = 0, ""
    lines = http_head.decode("utf-8", "replace").split("\r\n")
    if lines and lines[0].startswith("HTTP/"):
        parts = lines[0].split(" ")
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    for line in lines[1:]:
        k, s, v = line.partition(":")
        if s and k.strip().lower() == "content-type":
            mime = v.strip()
    return (url, headers.get("warc-date", ""), wtype, status, mime, bytes(body))


def read_warc_binary(spark: SparkSession, path: str) -> DataFrame:
    """WARC/WARC.gz file(s) -> (url, warc_ts, html, http_status, mime)
    pages, Content-Length-framed with transparent member gzip.

    ``binaryFile`` yields one row per file; the parse runs inside
    ``mapInPandas`` so a directory of crawl segments fans out one file
    per task — Common Crawl's own distribution granularity (per-member
    gzip cannot be split mid-file)."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                data = _gunzip_members(bytes(content))
                for headers, block in _iter_binary_records(data):
                    parsed = _parse_binary_record(headers, block)
                    if parsed is not None:
                        rows.append(parsed)
            yield pd.DataFrame(
                rows, columns=[f.name for f in BINARY_WARC_SCHEMA.fields]
            )

    recs = raw.mapInPandas(run, BINARY_WARC_SCHEMA)
    return recs.select(
        "url",
        # try_to_timestamp: WARC-Date is external-file content; under ANSI a
        # corrupt date in one record of a 100 TB scan must yield null,
        # not kill the stage
        F.try_to_timestamp("warc_date", F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("warc_ts"),
        "html",
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
