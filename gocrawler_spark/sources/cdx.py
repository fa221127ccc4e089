"""CDX(J) index — the sorted lookup sibling of a WARC crawl output.

Common Crawl publishes, next to every crawl's WARC segments, a CDXJ
index (``cc-index``): one line per captured record, ``<SURT urlkey>
<14-digit timestamp> <JSON>``, lines sorted bytewise, sharded into
``cdx-NNNNN.gz`` files, plus a tiny ``cluster.idx`` that maps key
ranges to shards. Because the key is the SURT (reversed-host) form, a
whole registrable domain is contiguous in the sorted order — answering
"every capture of example.com" is a shard-pruned scan, never a full
index read. This module reproduces that shape on top of
:func:`gocrawler_spark.sources.warc.write_warc`'s per-record index rows
(the only place record byte offsets are known).

Layout produced::

    out_dir/cdx-00000.gz ... cdx-{n_shards-1:05d}.gz   (range-sorted)
    out_dir/cluster.idx                                (plain text)

* Global order comes from ``repartitionByRange(urlkey, ts)`` +
  ``sortWithinPartitions`` — the range partition id IS the global shard
  order, so shard N's keys all sort before shard N+1's (Spark samples
  range bounds; no global sort, no single-reducer funnel). At Common
  Crawl scale (~3×10^9 records/crawl) this is ~300 shards of ~10^7
  lines — one wide shuffle, embarrassingly parallel writes.
* ``cluster.idx`` holds one line per BLOCK of ``block_size`` records
  (CC indexes every ~3000th line the same way): ``first_key last_key
  file n_records offset length`` (tab-separated). Each block is its own
  gzip member inside the shard file, so a point lookup seeks to
  ``offset``, reads ``length`` bytes and decompresses ONE block —
  O(block), not O(shard). At archive scale (~1 GiB shards) that is the
  difference between a ranged GET of ~100 KB and a full-shard scan.
* JSON fields (url, mime, status, digest, length, offset, filename)
  follow CC's cdxj records: ``filename``+``offset``+``length`` make a
  ranged GET of one record possible because ``write_warc`` gzips each
  record as its own member.

Multi-member gzip is still a valid ``.gz`` stream: ``spark.read.text``
(Hadoop gzip codec) and Python's gzip module both decompress the
concatenation, so full-index reads (``read_cdx``/``cdx_diff``) are
unchanged; only the lookup path exploits the block boundaries.
``cluster.idx`` lines from the pre-block format (4 fields, one line per
shard) are still accepted by the lookup (offset 0 / whole file).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gocrawler_spark.functions.urlnorm import canonical_url, surt_from_canon

__all__ = [
    "CDX_JSON_SCHEMA",
    "cdx_lines",
    "write_cdx",
    "read_cdx",
    "cdx_lookup",
    "cdx_get",
    "cdx_diff",
    "prev_digests",
    "fetch_warc_record",
]

CDX_JSON_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("mime", StringType()),
        StructField("status", IntegerType()),
        StructField("digest", StringType()),
        StructField("length", LongType()),
        StructField("offset", LongType()),
        StructField("filename", StringType()),
    ]
)

_TS_FMT = "yyyyMMddHHmmss"


def cdx_lines(records: DataFrame) -> DataFrame:
    """WARC per-record index rows (warc.WARC_INDEX_SCHEMA) ->
    (urlkey, ts, line) projection: urlkey = SURT of the url, ts = the
    14-digit capture timestamp, line = the full CDXJ line. Pure JVM
    expression tree (to_json over a struct keeps field order
    deterministic, so identical input gives byte-identical lines).

    Records whose url cannot be canonicalized (no scheme/host) get a
    NULL urlkey (and NULL line) — a CDX line without a sortable key is
    unreachable by lookup, and :func:`write_cdx` skips such rows at
    write time. The skip deliberately does NOT happen here as a
    ``where(urlkey IS NOT NULL)``: predicate pushdown substitutes the
    filter below the projections, re-inlining the whole
    surt(canonical_url(...)) tree into the filter — measured 8-14x
    slower than the projection chain it guards (57.8s vs 4.1s / 1M
    rows for the filter alone on local[32]).
    """
    ts = F.date_format(
        F.to_timestamp(F.col("wdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'"), _TS_FMT
    )
    ts = F.coalesce(ts, F.lit("19700101000000"))
    j = F.to_json(
        F.struct(
            F.col("url"),
            F.col("mime"),
            F.col("status"),
            F.col("digest"),
            F.col("length"),
            F.col("offset"),
            # CDX carries the segment basename; readers resolve against
            # the crawl root (CC does the same with relative paths)
            F.element_at(F.split(F.col("filename"), "/"), -1).alias("filename"),
        )
    )
    # three projections on purpose: canon -> urlkey -> line. Each stage
    # references the previous stage's column several times, and keeping
    # the boundaries stops Column composition from splicing the heavy
    # canonical_url subtree into every reference (measured 8x on the
    # surt step — see functions/urlnorm.surt)
    return (
        records.select(
            canonical_url("url").alias("_canon"),
            ts.alias("ts"),
            j.alias("json"),
        )
        .select(
            surt_from_canon("_canon").alias("urlkey"), "ts", "json"
        )
        .select(
            "urlkey",
            "ts",
            F.concat_ws(" ", "urlkey", "ts", "json").alias("line"),
        )
    )


def write_cdx(
    records: DataFrame,
    out_dir: str,
    n_shards: int = 1,
    gzip_shards: bool = True,
    prefix: str = "cdx",
    block_size: int = 3000,
    gzip_level: int = 6,
) -> list[dict]:
    """Write a sorted, sharded CDXJ index + cluster.idx from WARC
    per-record index rows. EAGER (unlike the other sinks): cluster.idx
    is derived from the shard manifest, so the write must run here.

    Every ``block_size`` records start a new gzip member (CC's own
    cluster.idx granularity is ~3000 lines) and contribute one
    cluster.idx line carrying the block's key range + byte range, so
    point lookups read O(block). Returns the manifest as a list of
    per-shard dicts (path, first_key, last_key, n_records, blocks) —
    block-count-sized, still bounded metadata scale (~n_records/3000
    rows: CC itself ships exactly this as a flat file).
    """
    from pyspark import TaskContext

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if block_size < 1:
        raise ValueError("block_size must be >= 1")
    os.makedirs(out_dir, exist_ok=True)
    ext = ".gz" if gzip_shards else ""
    lines = (
        cdx_lines(records)
        .repartitionByRange(n_shards, "urlkey", "ts")
        .sortWithinPartitions("urlkey", "ts")
        # the writer reads only (urlkey, line): dropping ts AFTER the
        # sort keeps it out of the Arrow crossing (guide §4.1: pass only
        # the columns the function needs). The newline is appended
        # JVM-side so the writer below can emit each block as ONE
        # zero-copy slice of the Arrow data buffer.
        .select("urlkey", F.concat("line", F.lit("\n")).alias("line"))
    )

    def run(batches) -> "Iterator":
        import gzip as _gzip

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"{prefix}-{pid:05d}{ext}")
        blocks: list[tuple] = []
        raw = open(path, "wb")
        member = None  # current block's gzip member (None when plain)
        blk_first = blk_last = None
        blk_n, blk_off = 0, 0

        def close_block():
            nonlocal member, blk_first, blk_last, blk_n
            if blk_n == 0:
                return
            if member is not None:
                member.close()  # flush this member; raw stays open
                member = None
            blocks.append(
                (path, len(blocks), blk_first, blk_last, blk_n,
                 blk_off, raw.tell() - blk_off)
            )
            blk_first, blk_last, blk_n = None, None, 0

        try:
            for batch in batches:
                keys = batch.column(0)
                if keys.null_count:  # unkeyable — see cdx_lines
                    batch = batch.filter(pc.is_valid(keys))
                    keys = batch.column(0)
                line_arr = batch.column(1)
                # an Arrow string column is ONE contiguous utf-8 buffer
                # plus offsets (guide §4.2): a block of rows [i, i+take)
                # is written as a single slice of that buffer — no
                # per-row Python strings, no join, no re-encode. (The
                # pandas path before this materialized 2M Python str
                # objects per shard wave and re-joined them; the writer
                # stage dominated the whole index build.)
                offs = np.frombuffer(
                    line_arr.buffers()[1],
                    # large_string (spark.sql.execution.arrow.
                    # useLargeVarTypes=true) carries int64 offsets
                    dtype=np.int64 if pa.types.is_large_string(line_arr.type) else np.int32,
                    count=len(line_arr) + line_arr.offset + 1,
                )
                data = memoryview(line_arr.buffers()[2])
                base = line_arr.offset
                i, n_rows = 0, len(line_arr)
                while i < n_rows:
                    take = min(block_size - blk_n, n_rows - i)
                    if blk_n == 0:
                        blk_off = raw.tell()
                        blk_first = keys[i].as_py()
                        if gzip_shards:
                            # mtime=0, no filename field: identical
                            # input -> byte-identical shard.
                            # gzip_level 6 (the gzip CLI default), not
                            # Python's GzipFile default 9: measured on
                            # 200k CDXJ lines, level 9 deflates 2.3x
                            # slower for 0.3% smaller shards (1.11s vs
                            # 0.48s, 8.0 MB both — guide §2.3: codec
                            # level is a measured trade, not a default)
                            member = _gzip.GzipFile(
                                fileobj=raw, mode="wb", mtime=0,
                                compresslevel=gzip_level,
                            )
                    start = int(offs[base + i])
                    end = int(offs[base + i + take])
                    (member if member is not None else raw).write(
                        data[start:end]
                    )
                    blk_last = keys[i + take - 1].as_py()
                    blk_n += take
                    i += take
                    if blk_n >= block_size:
                        close_block()
            close_block()
        finally:
            raw.close()
        if not blocks:
            os.remove(path)  # range partitioner may leave empty shards
        else:
            cols = list(zip(*blocks))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], pa.string()),
                    pa.array(cols[1], pa.int64()),
                    pa.array(cols[2], pa.string()),
                    pa.array(cols[3], pa.string()),
                    pa.array(cols[4], pa.int64()),
                    pa.array(cols[5], pa.int64()),
                    pa.array(cols[6], pa.int64()),
                ],
                names=["path", "block", "first_key", "last_key",
                       "n_records", "offset", "length"],
            )

    manifest_schema = StructType(
        [
            StructField("path", StringType()),
            StructField("block", LongType()),
            StructField("first_key", StringType()),
            StructField("last_key", StringType()),
            StructField("n_records", LongType()),
            StructField("offset", LongType()),
            StructField("length", LongType()),
        ]
    )
    rows = sorted(
        (r.asDict() for r in lines.mapInArrow(run, manifest_schema).collect()),
        key=lambda m: (m["path"], m["block"]),
    )
    with open(os.path.join(out_dir, "cluster.idx"), "w", encoding="utf-8") as fh:
        for b in rows:
            fh.write(
                f"{b['first_key']}\t{b['last_key']}\t"
                f"{os.path.basename(b['path'])}\t{b['n_records']}\t"
                f"{b['offset']}\t{b['length']}\n"
            )
    # per-shard manifest (the pre-block return shape, plus blocks)
    manifest: list[dict] = []
    for b in rows:
        if not manifest or manifest[-1]["path"] != b["path"]:
            manifest.append(
                {"path": b["path"], "first_key": b["first_key"],
                 "last_key": b["last_key"], "n_records": 0, "blocks": []}
            )
        m = manifest[-1]
        m["last_key"] = b["last_key"]
        m["n_records"] += b["n_records"]
        m["blocks"].append(
            {k: b[k] for k in ("first_key", "last_key", "n_records",
                               "offset", "length")}
        )
    return manifest


def _parse_cdx_values(raw: DataFrame) -> DataFrame:
    """(value: string) of CDXJ lines -> (urlkey, ts, + CDX_JSON_SCHEMA
    fields). The JSON tail may contain spaces, so the line splits on
    the first two spaces only."""
    parts = F.split(F.col("value"), " ", 3)
    return raw.select(
        F.element_at(parts, 1).alias("urlkey"),
        F.element_at(parts, 2).alias("ts"),
        F.from_json(F.element_at(parts, 3), CDX_JSON_SCHEMA).alias("j"),
    ).select("urlkey", "ts", "j.*")


def read_cdx(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """CDXJ shard files -> DataFrame (urlkey, ts, + CDX_JSON_SCHEMA
    fields). ``path`` is a file/glob/dir of ``cdx-*`` shards;
    ``spark.read.text`` decompresses .gz transparently (including the
    writer's multi-member block layout) and parallelizes per file
    (per-shard, CC's own distribution unit).
    """
    return _parse_cdx_values(spark.read.text(path))


def _blocks_for_prefix(out_dir: str, key_prefix: str) -> list[tuple[str, int, int]]:
    """cluster.idx -> (path, offset, length) of the blocks whose
    [first_key, last_key] range can contain keys starting with
    ``key_prefix``. Driver-side read of a block-count-sized text file
    (CC ships the same file flat; ~1M lines for a full crawl — fine).
    Pre-block 4-field lines map to (path, 0, -1) = whole file."""
    hi = key_prefix + "\uffff"  # above any real key char
    picked = []
    with open(os.path.join(out_dir, "cluster.idx"), encoding="utf-8") as fh:
        for line in fh:
            fields = line.rstrip("\n").split("\t")
            first, last, fname = fields[:3]
            if last < key_prefix or first > hi:
                continue
            if len(fields) >= 6:
                picked.append(
                    (os.path.join(out_dir, fname), int(fields[4]), int(fields[5]))
                )
            else:
                picked.append((os.path.join(out_dir, fname), 0, -1))
    return picked


def _shards_for_prefix(out_dir: str, key_prefix: str) -> list[str]:
    """Shard-level view of :func:`_blocks_for_prefix`: the distinct
    shard files any matching block lives in, in cluster.idx order."""
    seen: dict[str, None] = {}
    for path, _off, _ln in _blocks_for_prefix(out_dir, key_prefix):
        seen.setdefault(path)
    return list(seen)


def _read_blocks(spark: SparkSession, blocks: list[tuple[str, int, int]]) -> DataFrame:
    """Distributed ranged read of index blocks: each task seeks to its
    block's offset, reads exactly ``length`` bytes and decompresses one
    gzip member (length -1 = rest of file, the legacy whole-shard
    entry). On object storage the same slice is one ranged GET. Returns
    (value: string) lines for :func:`_parse_cdx_values`.

    (r6 note: a variant returning one blob per block with a JVM-side
    split/explode was measured — warm it is a wash and its first run
    pays extra codegen, so the per-line form stays.)"""
    import gzip as _gzip

    spec = spark.createDataFrame(blocks, "path string, offset long, length long")
    spec = spec.repartition(
        min(len(blocks), spark.sparkContext.defaultParallelism), "path", "offset"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[str] = []
            for path, off, ln in zip(pdf["path"], pdf["offset"], pdf["length"]):
                with open(path, "rb") as fh:
                    fh.seek(int(off))
                    blob = fh.read() if int(ln) < 0 else fh.read(int(ln))
                if blob[:2] == b"\x1f\x8b":
                    blob = _gzip.decompress(blob)
                out.extend(blob.decode("utf-8").splitlines())
            yield pd.DataFrame({"value": out})

    return spec.mapInPandas(run, "value string")


def cdx_lookup(
    spark: SparkSession, out_dir: str, key_prefix: str
) -> DataFrame:
    """Prefix lookup against a written CDX index — e.g.
    ``cdx_lookup(spark, d, "com,example)")`` for every capture of
    example.com (subdomains included: ``"com,example"``). cluster.idx
    prunes to the BLOCKS whose key range intersects the prefix and each
    matching block is a ranged read of its own gzip member, so the cost
    is O(matching blocks), not O(shard) or O(index) — the distributed
    analogue of the wayback binary search. Returns the same shape as
    :func:`read_cdx`, filtered.
    """
    blocks = _blocks_for_prefix(out_dir, key_prefix)
    if not blocks:
        return read_cdx(spark, os.path.join(out_dir, "cdx-*")).where(F.lit(False))
    return _parse_cdx_values(_read_blocks(spark, blocks)).where(
        F.col("urlkey").startswith(key_prefix)
    )


def cdx_diff(spark: SparkSession, old_dir: str, new_dir: str) -> DataFrame:
    """Incremental-crawl snapshot diff of two CDX indexes: one row per
    urlkey with status 'added' / 'removed' / 'changed' / 'unchanged'.
    'changed' means the latest capture's payload DIGEST differs — the
    content moved, so the url belongs in the next refetch set; 'added'/
    'removed' drive frontier seeding and tombstoning. This is the
    standard between-snapshots question (Common Crawl's own index pairs
    answer it the same way: latest capture per key, digest compare).

    Latest capture per side = one row_number window per urlkey (keys are
    unique per capture set, partitions are capture-count tiny), then one
    full outer join on urlkey — a single shuffle each side; both inputs
    are already SURT-range-sorted on disk, so at archive scale the scan
    streams in key order and AQE keeps the join balanced.
    """
    from pyspark.sql import Window

    def latest(d):
        df = read_cdx(spark, os.path.join(d, "cdx-*"))
        w = Window.partitionBy("urlkey").orderBy(F.col("ts").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    o = latest(old_dir).select(
        "urlkey",
        F.col("url").alias("old_url"),
        F.col("digest").alias("old_digest"),
        F.col("ts").alias("old_ts"),
    )
    n = latest(new_dir).select(
        "urlkey",
        F.col("url").alias("new_url"),
        F.col("digest").alias("new_digest"),
        F.col("ts").alias("new_ts"),
    )
    j = o.join(n, "urlkey", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "urlkey",
        F.coalesce("new_url", "old_url").alias("url"),
        status.alias("status"),
        "old_ts", "new_ts", "old_digest", "new_digest",
    )


def prev_digests(spark: SparkSession, out_dir: str) -> DataFrame:
    """(url, prev_digest) of each url's LATEST capture in a written CDX
    index — the join input for ``write_warc``'s revisit path: the next
    snapshot's pages left-join this on the raw url, and pages whose
    current payload digest matches become body-less ``revisit`` records
    (Common Crawl's unchanged-page storage saver). Raw-url keying
    mirrors the engine's raw-url dedup semantics."""
    from pyspark.sql import Window

    df = read_cdx(spark, os.path.join(out_dir, "cdx-*"))
    w = Window.partitionBy("url").orderBy(F.col("ts").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("url", F.col("digest").alias("prev_digest"))
    )


def cdx_get(spark: SparkSession, out_dir: str, url: str) -> DataFrame:
    """All captures of ONE url — the wayback point query. The url is
    keyed through the SAME Spark expression the index was written with
    (a one-row DataFrame; a parallel Python SURT implementation would
    be a divergence bug waiting to happen), then answered as an
    exact-key :func:`cdx_lookup`. Returns every capture (one per
    timestamp), the read cost of one pruned shard.
    """
    row = (
        spark.createDataFrame([(url,)], "url string")
        .select(surt_from_canon(canonical_url("url")).alias("k"))
        .first()
    )
    if row is None or row["k"] is None:
        raise ValueError(f"url has no SURT key (no scheme/host?): {url!r}")
    key = row["k"]
    return cdx_lookup(spark, out_dir, key).where(F.col("urlkey") == key)


def fetch_warc_record(
    warc_dir: str, filename: str, offset: int, length: int
) -> tuple[dict, bytes]:
    """Ranged fetch of ONE record from a WARC segment using a CDX row's
    (filename, offset, length) — the consumer-side proof that the index
    points where it claims. With per-member gzip each slice is a
    complete gzip stream; plain segments are sliced directly. Returns
    (warc headers dict, http payload bytes). Local-filesystem seek here;
    on object storage the same slice is one ranged GET.
    """
    import gzip as _gzip

    with open(os.path.join(warc_dir, os.path.basename(filename)), "rb") as fh:
        fh.seek(offset)
        blob = fh.read(length)
    if blob[:2] == b"\x1f\x8b":
        blob = _gzip.decompress(blob)
    head, _, rest = blob.partition(b"\r\n\r\n")
    headers = {}
    for line in head.decode("utf-8", "replace").split("\r\n")[1:]:
        k, s, v = line.partition(":")
        if s:
            headers[k.strip().lower()] = v.strip()
    if rest.endswith(b"\r\n\r\n"):
        rest = rest[:-4]
    return headers, rest
