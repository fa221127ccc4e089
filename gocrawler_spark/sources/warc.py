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
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
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


WRITE_MANIFEST_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("n_records", IntegerType()),
        StructField("n_bytes", IntegerType()),
    ]
)


WARC_INDEX_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("wdate", StringType()),
        StructField("status", IntegerType()),
        StructField("mime", StringType()),
        StructField("digest", StringType()),
        StructField("filename", StringType()),
        StructField("offset", LongType()),
        StructField("length", LongType()),
    ]
)


def write_warc(
    df: DataFrame,
    out_dir: str,
    gzip_members: bool = True,
    prefix: str = "part",
    per_record_index: bool = False,
    warcinfo: bool = False,
    request_records: bool = False,
) -> DataFrame:
    """Pages DataFrame -> Common-Crawl-shaped WARC segment files, one
    file per partition, written EXECUTOR-side (no driver collect).

    Input columns: url (string), html (binary), optional warc_ts
    (timestamp), http_status (int), mime (string). Each record is
    framed by Content-Length and, with ``gzip_members=True``, compressed
    as its own gzip member — byte-compatible with Common Crawl and with
    :func:`read_warc_binary`'s framing, so segments roundtrip.

    Each task writes ``{prefix}-{partitionId:05d}.warc[.gz]`` and emits
    one manifest row (path, n_records, n_bytes); the returned manifest
    DataFrame is lazy — run an action on it to execute the write. Size
    segments with ``df.repartition(n)`` upstream (CC uses ~1 GiB files:
    at 100 TB that is ~10^5 partitions, one file per task, no shuffle
    beyond the caller's repartition). Paths here are plain local/shared
    filesystem ``open()``; a cluster deployment points out_dir at a
    mounted shared store.

    WARC-Record-ID is a deterministic md5-derived urn (same input ->
    byte-identical segment), not a random uuid: reproducibility is worth
    more to a pipeline than spec-cosmetic uniqueness.

    With ``per_record_index=True`` the returned DataFrame is instead ONE
    ROW PER RECORD (WARC_INDEX_SCHEMA: url, wdate, status, mime,
    sha1-base32 payload digest — Common Crawl's digest convention —
    filename, byte offset, byte length). Only the writing task knows a
    record's offset, so this is the only place the index can be built
    without re-reading the segment; with ``gzip_members=True`` each
    (offset, length) slice is a self-contained gzip member, i.e. the
    exact ranged-GET property Common Crawl's cdx index relies on. Feed
    these rows to :func:`gocrawler_spark.sources.cdx.write_cdx`.

    Real CC segments carry two more record types, both opt-in here:
    ``warcinfo=True`` opens each segment with one ``WARC-Type: warcinfo``
    record (application/warc-fields body naming the writer + the
    segment via WARC-Filename; WARC-Date pinned to epoch so identical
    input stays byte-identical), and ``request_records=True`` precedes
    every capture with a ``WARC-Type: request`` record holding the
    minimal HTTP request (GET path, Host, the engine's UA) linked by
    WARC-Concurrent-To. Neither record type is indexed — the index (and
    CC's cdx) points at response/revisit records only; offsets account
    for the extra bytes, and :func:`read_warc_binary` already skips
    non-response types on read.
    """
    import base64
    import gzip as _gzip
    import hashlib
    import os

    from pyspark import TaskContext

    cols = df.columns
    sel = [F.col("url"), F.col("html").cast("binary").alias("html")]
    sel.append(
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("wdate")
        if "warc_ts" in cols
        else F.lit(None).cast("string").alias("wdate")
    )
    sel.append(
        (F.col("http_status") if "http_status" in cols else F.lit(200))
        .cast("int")
        .alias("status")
    )
    sel.append(
        (F.col("mime") if "mime" in cols else F.lit("text/html"))
        .cast("string")
        .alias("mime")
    )
    # optional revisit input: the previous snapshot's payload digest per
    # url (sources/cdx.prev_digests). A page whose CURRENT digest equals
    # it is written as a body-less ``WARC-Type: revisit`` record —
    # Common Crawl's storage-saving mechanism for unchanged pages; the
    # body lives in the previous crawl's archive, reachable through its
    # index. read_warc_binary keeps response records only, so a re-read
    # of this crawl yields exactly the changed+new pages.
    sel.append(
        (F.col("prev_digest") if "prev_digest" in cols
         else F.lit(None)).cast("string").alias("prev")
    )
    src = df.select(*sel)
    ext = ".warc.gz" if gzip_members else ".warc"

    idx_cols = [f.name for f in WARC_INDEX_SCHEMA.fields]
    if request_records:
        # the UA the engine decorates fetches with (plans/crawl.py E18);
        # lazy import — plans.crawl itself imports this module lazily
        from gocrawler_spark.plans.crawl import USER_AGENT as _ua
    else:
        _ua = None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"{prefix}-{pid:05d}{ext}")
        n_rec, n_bytes = 0, 0
        idx_rows = []
        wrote_info = False
        with open(path, "wb") as fh:
            for pdf in batches:
                for url, html, wdate, status, mime, prev in zip(
                    pdf["url"], pdf["html"], pdf["wdate"], pdf["status"],
                    pdf["mime"], pdf["prev"],
                ):
                    if warcinfo and not wrote_info:
                        # one segment-opening warcinfo record (CC's
                        # crawler provenance block); epoch date keeps
                        # identical input -> byte-identical segments
                        info = (
                            "software: gocrawler-spark\r\n"
                            "format: WARC File Format 1.0\r\n"
                            f"isPartOf: {prefix}\r\n"
                        ).encode()
                        iid = hashlib.md5(
                            f"{os.path.basename(path)}|warcinfo".encode(
                                "utf-8", "replace"
                            )
                        ).hexdigest()
                        irec = (
                            "WARC/1.0\r\n"
                            "WARC-Type: warcinfo\r\n"
                            "WARC-Date: 1970-01-01T00:00:00Z\r\n"
                            f"WARC-Filename: {os.path.basename(path)}\r\n"
                            f"WARC-Record-ID: <urn:md5:{iid}>\r\n"
                            "Content-Type: application/warc-fields\r\n"
                            f"Content-Length: {len(info)}\r\n\r\n"
                        ).encode() + info + b"\r\n\r\n"
                        if gzip_members:
                            irec = _gzip.compress(irec, mtime=0)
                        fh.write(irec)
                        n_bytes += len(irec)
                        wrote_info = True
                    if request_records:
                        # the request leg of the capture, linked to its
                        # response by WARC-Concurrent-To (CC pairs them
                        # the same way); not indexed — cdx points at
                        # response/revisit records only
                        _, _, hostpath = url.partition("://")
                        host, slash, rpath = hostpath.partition("/")
                        http_req = (
                            f"GET /{rpath if slash else ''} HTTP/1.1\r\n"
                            f"Host: {host}\r\n"
                            f"User-Agent: {_ua}\r\n\r\n"
                        ).encode()
                        rid_resp = hashlib.md5(
                            f"{url}|{wdate}".encode("utf-8", "replace")
                        ).hexdigest()
                        qid = hashlib.md5(
                            f"{url}|{wdate}|request".encode("utf-8", "replace")
                        ).hexdigest()
                        qrec = (
                            "WARC/1.0\r\n"
                            "WARC-Type: request\r\n"
                            f"WARC-Target-URI: {url}\r\n"
                            f"WARC-Date: {wdate or '1970-01-01T00:00:00Z'}\r\n"
                            f"WARC-Record-ID: <urn:md5:{qid}>\r\n"
                            f"WARC-Concurrent-To: <urn:md5:{rid_resp}>\r\n"
                            "Content-Type: application/http; msgtype=request\r\n"
                            f"Content-Length: {len(http_req)}\r\n\r\n"
                        ).encode() + http_req + b"\r\n\r\n"
                        if gzip_members:
                            qrec = _gzip.compress(qrec, mtime=0)
                        fh.write(qrec)
                        n_bytes += len(qrec)
                    body = bytes(html) if html is not None else b""
                    digest = "sha1:" + base64.b32encode(
                        hashlib.sha1(body).digest()
                    ).decode("ascii")
                    if prev is not None and prev == digest:
                        # unchanged since the previous snapshot: revisit
                        # record (headers only, zero-length block)
                        rid = hashlib.md5(
                            f"{url}|{wdate}|revisit".encode("utf-8", "replace")
                        ).hexdigest()
                        rec = (
                            "WARC/1.0\r\n"
                            "WARC-Type: revisit\r\n"
                            f"WARC-Target-URI: {url}\r\n"
                            f"WARC-Date: {wdate or '1970-01-01T00:00:00Z'}\r\n"
                            f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
                            f"WARC-Refers-To-Target-URI: {url}\r\n"
                            f"WARC-Payload-Digest: {digest}\r\n"
                            "Content-Length: 0\r\n\r\n"
                        ).encode() + b"\r\n\r\n"
                    else:
                        http = (
                            f"HTTP/1.1 {int(status)} OK\r\n"
                            f"Content-Type: {mime or 'text/html'}\r\n\r\n"
                        ).encode() + body
                        rid = hashlib.md5(
                            f"{url}|{wdate}".encode("utf-8", "replace")
                        ).hexdigest()
                        head = (
                            "WARC/1.0\r\n"
                            "WARC-Type: response\r\n"
                            f"WARC-Target-URI: {url}\r\n"
                            f"WARC-Date: {wdate or '1970-01-01T00:00:00Z'}\r\n"
                            f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
                            f"Content-Length: {len(http)}\r\n\r\n"
                        ).encode()
                        rec = head + http + b"\r\n\r\n"
                    if gzip_members:
                        rec = _gzip.compress(rec, mtime=0)  # deterministic member
                    fh.write(rec)
                    if per_record_index:
                        idx_rows.append(
                            (url, wdate, int(status), mime, digest,
                             path, n_bytes, len(rec))
                        )
                    n_rec += 1
                    n_bytes += len(rec)
        if n_rec == 0:
            os.remove(path)  # no empty segments
        if per_record_index:
            yield pd.DataFrame(idx_rows, columns=idx_cols)
        elif n_rec == 0:
            yield pd.DataFrame(columns=["path", "n_records", "n_bytes"])
        else:
            yield pd.DataFrame([(path, n_rec, n_bytes)], columns=["path", "n_records", "n_bytes"])

    return src.mapInPandas(
        run, WARC_INDEX_SCHEMA if per_record_index else WRITE_MANIFEST_SCHEMA
    )


WET_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("text", StringType()),
    ]
)


def write_wet(
    df: DataFrame,
    out_dir: str,
    gzip_members: bool = True,
    prefix: str = "wet",
    text_col: str = "text",
) -> DataFrame:
    """Extracted-text DataFrame -> Common-Crawl-shaped WET segments
    (the .warc.wet sibling of a crawl's WARC output: one
    ``WARC-Type: conversion`` record per page, plain-text block, no
    HTTP envelope), one file per partition written executor-side.

    Input columns: url (string), ``text_col`` (string), optional
    warc_ts (timestamp). Framing matches :func:`write_warc` — WARC/1.0
    headers + Content-Length block, per-member gzip with mtime=0 so
    identical input yields byte-identical segments. WARC-Refers-To
    carries the md5 urn :func:`write_warc` would give the page's
    response record, so a WET record links back to its WARC record
    exactly as Common Crawl's conversion records do.

    Returns the same lazy (path, n_records, n_bytes) manifest shape as
    :func:`write_warc`; empty partitions emit no file.
    """
    import gzip as _gzip
    import hashlib
    import os

    from pyspark import TaskContext

    cols = df.columns
    sel = [F.col("url"), F.col(text_col).cast("string").alias("text")]
    sel.append(
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("wdate")
        if "warc_ts" in cols
        else F.lit(None).cast("string").alias("wdate")
    )
    src = df.select(*sel)
    ext = ".warc.wet.gz" if gzip_members else ".warc.wet"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"{prefix}-{pid:05d}{ext}")
        n_rec, n_bytes = 0, 0
        with open(path, "wb") as fh:
            for pdf in batches:
                for url, text, wdate in zip(pdf["url"], pdf["text"], pdf["wdate"]):
                    body = (text or "").encode("utf-8", "replace")
                    resp_rid = hashlib.md5(
                        f"{url}|{wdate}".encode("utf-8", "replace")
                    ).hexdigest()
                    rid = hashlib.md5(
                        f"wet|{url}|{wdate}".encode("utf-8", "replace")
                    ).hexdigest()
                    head = (
                        "WARC/1.0\r\n"
                        "WARC-Type: conversion\r\n"
                        f"WARC-Target-URI: {url}\r\n"
                        f"WARC-Date: {wdate or '1970-01-01T00:00:00Z'}\r\n"
                        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
                        f"WARC-Refers-To: <urn:md5:{resp_rid}>\r\n"
                        "Content-Type: text/plain\r\n"
                        f"Content-Length: {len(body)}\r\n\r\n"
                    ).encode()
                    rec = head + body + b"\r\n\r\n"
                    if gzip_members:
                        rec = _gzip.compress(rec, mtime=0)
                    fh.write(rec)
                    n_rec += 1
                    n_bytes += len(rec)
        if n_rec == 0:
            os.remove(path)
            yield pd.DataFrame(columns=["path", "n_records", "n_bytes"])
        else:
            yield pd.DataFrame([(path, n_rec, n_bytes)], columns=["path", "n_records", "n_bytes"])

    return src.mapInPandas(run, WRITE_MANIFEST_SCHEMA)


def read_wet_binary(spark: SparkSession, path: str) -> DataFrame:
    """WET file(s) -> (url, warc_ts, text, n_chars): the conversion
    records only — response/request/warcinfo records in the same
    stream are skipped without desync (Content-Length framing), the
    mirror of :func:`read_warc_binary` keeping only ``response``."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                data = _gunzip_members(bytes(content))
                for headers, block in _iter_binary_records(data):
                    if headers.get("warc-type", "") != "conversion":
                        continue
                    url = headers.get("warc-target-uri", "")
                    if not url:
                        continue
                    rows.append(
                        (url, headers.get("warc-date", ""),
                         block.decode("utf-8", "replace"))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in WET_SCHEMA.fields])

    recs = raw.mapInPandas(run, WET_SCHEMA)
    return recs.select(
        "url",
        F.try_to_timestamp("warc_date", F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("warc_ts"),
        "text",
        F.length("text").alias("n_chars"),
    )


WAT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("title", StringType()),
        StructField("links", ArrayType(StringType())),
    ]
)


def write_wat(
    df: DataFrame,
    out_dir: str,
    gzip_members: bool = True,
    prefix: str = "wat",
) -> DataFrame:
    """Page-metadata DataFrame -> Common-Crawl-shaped WAT segments:
    one ``WARC-Type: metadata`` record per page whose block is the
    CC-style JSON envelope (Envelope -> Payload-Metadata ->
    HTTP-Response-Metadata -> HTML-Metadata with Links + Head.Title),
    completing the WARC/WAT/WET output triple.

    Input columns: url (string), optional links (array<string>), title
    (string), warc_ts (timestamp). Framing, manifest shape, gzip
    determinism and the md5-urn WARC-Refers-To backlink all match
    :func:`write_warc` / :func:`write_wet`. JSON serialization runs
    executor-side inside mapInPandas — per-record Python cost on the
    metadata rows only, never on page bodies.
    """
    import gzip as _gzip
    import hashlib
    import json as _json
    import os

    from pyspark import TaskContext

    cols = df.columns
    sel = [F.col("url")]
    sel.append(
        (F.col("links") if "links" in cols else F.array().cast("array<string>")).alias("links")
    )
    sel.append(
        (F.col("title") if "title" in cols else F.lit(None).cast("string")).alias("title")
    )
    sel.append(
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("wdate")
        if "warc_ts" in cols
        else F.lit(None).cast("string").alias("wdate")
    )
    src = df.select(*sel)
    ext = ".warc.wat.gz" if gzip_members else ".warc.wat"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"{prefix}-{pid:05d}{ext}")
        n_rec, n_bytes = 0, 0
        with open(path, "wb") as fh:
            for pdf in batches:
                for url, links, title, wdate in zip(
                    pdf["url"], pdf["links"], pdf["title"], pdf["wdate"]
                ):
                    envelope = {
                        "Envelope": {
                            "WARC-Header-Metadata": {
                                "WARC-Target-URI": url,
                                "WARC-Type": "response",
                                "WARC-Date": wdate or "1970-01-01T00:00:00Z",
                            },
                            "Payload-Metadata": {
                                "HTTP-Response-Metadata": {
                                    "HTML-Metadata": {
                                        "Head": {"Title": title},
                                        "Links": [
                                            {"path": "A@/href", "url": u}
                                            for u in (
                                                list(links) if links is not None else []
                                            )
                                        ],
                                    }
                                }
                            },
                        }
                    }
                    body = _json.dumps(
                        envelope, sort_keys=True, separators=(",", ":")
                    ).encode("utf-8")
                    resp_rid = hashlib.md5(
                        f"{url}|{wdate}".encode("utf-8", "replace")
                    ).hexdigest()
                    rid = hashlib.md5(
                        f"wat|{url}|{wdate}".encode("utf-8", "replace")
                    ).hexdigest()
                    head = (
                        "WARC/1.0\r\n"
                        "WARC-Type: metadata\r\n"
                        f"WARC-Target-URI: {url}\r\n"
                        f"WARC-Date: {wdate or '1970-01-01T00:00:00Z'}\r\n"
                        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
                        f"WARC-Refers-To: <urn:md5:{resp_rid}>\r\n"
                        "Content-Type: application/json\r\n"
                        f"Content-Length: {len(body)}\r\n\r\n"
                    ).encode()
                    rec = head + body + b"\r\n\r\n"
                    if gzip_members:
                        rec = _gzip.compress(rec, mtime=0)
                    fh.write(rec)
                    n_rec += 1
                    n_bytes += len(rec)
        if n_rec == 0:
            os.remove(path)
            yield pd.DataFrame(columns=["path", "n_records", "n_bytes"])
        else:
            yield pd.DataFrame([(path, n_rec, n_bytes)], columns=["path", "n_records", "n_bytes"])

    return src.mapInPandas(run, WRITE_MANIFEST_SCHEMA)


def read_wat_binary(spark: SparkSession, path: str) -> DataFrame:
    """WAT file(s) -> (url, warc_ts, title, links, n_links): metadata
    records only; the JSON envelope is parsed executor-side, malformed
    JSON yields a row with null title and empty links rather than
    killing the scan (external-input posture, like try_to_timestamp)."""
    import json as _json

    raw = spark.read.format("binaryFile").load(path).select("content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                data = _gunzip_members(bytes(content))
                for headers, block in _iter_binary_records(data):
                    if headers.get("warc-type", "") != "metadata":
                        continue
                    url = headers.get("warc-target-uri", "")
                    if not url:
                        continue
                    title, links = None, []
                    try:
                        env = _json.loads(block.decode("utf-8", "replace"))
                        html_meta = (
                            env.get("Envelope", {})
                            .get("Payload-Metadata", {})
                            .get("HTTP-Response-Metadata", {})
                            .get("HTML-Metadata", {})
                        )
                        title = html_meta.get("Head", {}).get("Title")
                        links = [
                            d.get("url")
                            for d in html_meta.get("Links", [])
                            if isinstance(d, dict) and d.get("url")
                        ]
                    except (ValueError, AttributeError):
                        pass
                    rows.append(
                        (url, headers.get("warc-date", ""), title, links)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in WAT_SCHEMA.fields])

    recs = raw.mapInPandas(run, WAT_SCHEMA)
    return recs.select(
        "url",
        F.try_to_timestamp("warc_date", F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("warc_ts"),
        "title",
        "links",
        F.size("links").alias("n_links"),
    )
