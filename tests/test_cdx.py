"""CDX(J) index over WARC segments: per-record index rows from
write_warc, globally-sorted sharded CDXJ + cluster.idx, shard-pruned
prefix lookup, and ranged single-record fetch by (filename, offset,
length) — the Common Crawl index contract end-to-end."""

import gzip
import os

from gocrawler_spark.sources.cdx import (
    _shards_for_prefix,
    cdx_get,
    cdx_lookup,
    fetch_warc_record,
    read_cdx,
    write_cdx,
)
from gocrawler_spark.sources.warc import write_warc

DOMAINS = [f"site{d:02d}.example" for d in range(10)]


def _pages(spark, n=40):
    rows = [
        (
            f"https://www.{DOMAINS[i % 10]}/page/{i}?b=2&a=1",
            f"2021-06-{1 + i % 27:02d}T01:02:03Z",
            f"<html><body>doc {i}</body></html>".encode(),
            200 if i % 5 else 404,
            "text/html",
        )
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "url string, ts string, html binary, http_status int, mime string"
    ).selectExpr(
        "url", "to_timestamp(ts, \"yyyy-MM-dd'T'HH:mm:ss'Z'\") as warc_ts",
        "html", "http_status", "mime"
    )


def _write_all(spark, tmp_path, n=40, n_shards=3):
    rows, df = _pages(spark, n)
    warc_dir = tmp_path / "segments"
    warc_dir.mkdir()
    records = write_warc(df.repartition(4), str(warc_dir), per_record_index=True)
    idx_dir = tmp_path / "index"
    manifest = write_cdx(records, str(idx_dir), n_shards=n_shards)
    return rows, str(warc_dir), str(idx_dir), manifest


def test_cdx_write_sorted_shards_and_roundtrip(spark, tmp_path):
    rows, warc_dir, idx_dir, manifest = _write_all(spark, tmp_path)
    files = sorted(f for f in os.listdir(idx_dir) if f.startswith("cdx-"))
    assert [os.path.basename(m["path"]) for m in manifest] == files
    assert sum(m["n_records"] for m in manifest) == len(rows)
    # global order: concatenating shards in filename order is sorted,
    # and each shard's range hand-off respects the previous shard's last
    all_lines = []
    for f in files:
        with gzip.open(os.path.join(idx_dir, f), "rt", encoding="utf-8") as fh:
            all_lines.extend(line.rstrip("\n") for line in fh)
    assert all_lines == sorted(all_lines) and len(all_lines) == len(rows)
    # cluster.idx mirrors the manifest
    cl = open(os.path.join(idx_dir, "cluster.idx"), encoding="utf-8").read()
    assert len(cl.strip().split("\n")) == len(manifest)
    # read back: every capture present with its CDXJ fields
    back = read_cdx(spark, os.path.join(idx_dir, "cdx-*")).collect()
    got = {r["url"]: r for r in back}
    assert len(got) == len(rows)
    for url, ts, html, status, mime in rows:
        r = got[url]
        assert r["status"] == status and r["mime"] == mime
        assert r["ts"] == ts[:4] + ts[5:7] + ts[8:10] + ts[11:13] + ts[14:16] + ts[17:19]
        assert r["digest"].startswith("sha1:") and len(r["digest"]) == 5 + 32
        assert r["length"] > 0 and r["offset"] >= 0
        # urlkey: SURT — reversed host labels, www-stripped, sorted query
        host = url.split("/")[2].removeprefix("www.")
        want_key = ",".join(reversed(host.split("."))) + ")/" + url.split("/", 3)[3]
        want_key = want_key.replace("?b=2&a=1", "?a=1&b=2")
        assert r["urlkey"] == want_key


def test_cdx_lookup_prunes_shards(spark, tmp_path):
    rows, warc_dir, idx_dir, manifest = _write_all(spark, tmp_path)
    assert len(manifest) == 3  # the pruning claim needs >1 shard
    # one domain = one contiguous key run; it can straddle at most one
    # range boundary, so the pruned set is a strict subset of the shards
    key = "example,site03)"
    picked = _shards_for_prefix(idx_dir, key)
    assert 1 <= len(picked) <= 2 < len(manifest)
    hits = cdx_lookup(spark, idx_dir, key).collect()
    want = {u for (u, *_rest) in rows if "site03.example" in u}
    assert {r["url"] for r in hits} == want and len(hits) == len(want)
    # registrable-domain prefix (no ')') also matches subdomain-free set
    assert {r["url"] for r in cdx_lookup(spark, idx_dir, "example,site03").collect()} == want
    # prefix beyond every key -> empty, zero shards read
    assert _shards_for_prefix(idx_dir, "zzz") == []
    assert cdx_lookup(spark, idx_dir, "zzz").count() == 0


def test_cdx_offsets_fetch_single_records(spark, tmp_path):
    """The consumer contract: a CDX row's (filename, offset, length) is
    a self-contained ranged read of exactly its WARC record (per-member
    gzip), no scan of the rest of the segment."""
    rows, warc_dir, idx_dir, _ = _write_all(spark, tmp_path, n=20)
    body_of = {u: h for (u, _t, h, _s, _m) in rows}
    for r in read_cdx(spark, os.path.join(idx_dir, "cdx-*")).collect():
        headers, payload = fetch_warc_record(
            warc_dir, r["filename"], r["offset"], r["length"]
        )
        assert headers["warc-target-uri"] == r["url"]
        assert headers["warc-type"] == "response"
        assert payload.endswith(body_of[r["url"]])


def test_warc_index_rows_match_manifest(spark, tmp_path):
    """per_record_index=True writes byte-identical segments to the
    manifest path (same content, different return shape) and its
    offsets/lengths tile each file exactly."""
    _rows, df = _pages(spark, 24)
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    write_warc(df.repartition(3), str(d1)).collect()
    recs = write_warc(df.repartition(3), str(d2), per_record_index=True).collect()
    for f in sorted(os.listdir(d1)):
        b1 = open(d1 / f, "rb").read()
        b2 = open(d2 / f, "rb").read()
        assert b1 == b2
        per_file = sorted(
            ((r["offset"], r["length"]) for r in recs
             if os.path.basename(r["filename"]) == f)
        )
        pos = 0
        for off, ln in per_file:
            assert off == pos
            pos += ln
        assert pos == len(b2)


def test_cdx_skips_unkeyable_urls(spark, tmp_path):
    """A record whose url has no scheme/host gets no SURT key and is
    skipped at write time (not silently mis-sorted under a NULL key)."""
    from pyspark.sql import functions as F

    recs = spark.createDataFrame(
        [("https://ok.example/a", "2021-06-01T00:00:00Z", 200, "text/html",
          "sha1:X", "part-00000.warc.gz", 0, 100),
         ("relative/no-host", "2021-06-01T00:00:00Z", 200, "text/html",
          "sha1:Y", "part-00000.warc.gz", 100, 100)],
        "url string, wdate string, status int, mime string, digest string,"
        " filename string, offset long, length long",
    )
    d = tmp_path / "idx"
    manifest = write_cdx(recs, str(d), n_shards=1)
    assert sum(m["n_records"] for m in manifest) == 1
    got = read_cdx(spark, os.path.join(str(d), "cdx-*")).collect()
    assert [r["url"] for r in got] == ["https://ok.example/a"]


def test_cdx_get_point_query(spark, tmp_path):
    """Exact-URL point lookup: every capture of one url, nothing else,
    keyed through the same Spark SURT expression as the written index
    (alias spellings of the url resolve to the same key)."""
    import pytest as _pt

    rows, _warc_dir, idx_dir, _m = _write_all(spark, tmp_path)
    target = rows[7][0]  # 'https://www.site07.example/page/7?b=2&a=1'
    got = cdx_get(spark, idx_dir, target).collect()
    assert [r["url"] for r in got] == [target]
    # canonical aliasing: different spelling, same capture
    alias = target.replace("https://www.", "HTTPS://WWW.").replace(
        "?b=2&a=1", "?a=1&b=2&utm_source=x#frag"
    )
    assert [r["url"] for r in cdx_get(spark, idx_dir, alias).collect()] == [target]
    # no captures -> empty, not an error
    assert cdx_get(spark, idx_dir, "https://site07.example/other").count() == 0
    with _pt.raises(ValueError):
        cdx_get(spark, idx_dir, "relative/no-host")


def test_cdx_diff_between_snapshots(spark, tmp_path):
    """Two crawl snapshots -> per-url added/removed/changed/unchanged by
    payload digest of the LATEST capture on each side."""
    from gocrawler_spark.sources.cdx import cdx_diff

    def snap(name, docs):
        rows = [
            (f"https://diff.example/{k}",
             f"2021-06-{ts:02d}T00:00:00Z",
             body.encode(), 200, "text/html")
            for k, (ts, body) in docs.items()
        ]
        df = spark.createDataFrame(
            rows, "url string, ts string, html binary, http_status int, mime string"
        ).selectExpr(
            "url", "to_timestamp(ts, \"yyyy-MM-dd'T'HH:mm:ss'Z'\") as warc_ts",
            "html", "http_status", "mime"
        )
        wd = tmp_path / f"{name}_warc"
        wd.mkdir()
        recs = write_warc(df.repartition(2), str(wd), per_record_index=True)
        idx = tmp_path / f"{name}_idx"
        write_cdx(recs, str(idx), n_shards=2)
        return str(idx)

    old = snap("old", {
        "same": (1, "stable content"),
        "edit": (1, "version one"),
        "gone": (1, "bye"),
        "multi": (5, "new-era"),
    })
    new = snap("new", {
        "same": (9, "stable content"),
        "edit": (9, "version two"),
        "born": (9, "hello"),
        "multi": (9, "new-era"),
    })
    got = {r["url"].rsplit("/", 1)[-1]: r["status"]
           for r in cdx_diff(spark, old, new).collect()}
    assert got == {
        "same": "unchanged",
        "edit": "changed",
        "gone": "removed",
        "born": "added",
        "multi": "unchanged",
    }


def test_revisit_records_for_unchanged_pages(spark, tmp_path):
    """Second-snapshot pages whose payload digest matches the previous
    snapshot's latest capture are written as body-less WARC-Type:revisit
    records (Common Crawl's storage saver): segments shrink, the index
    still covers every capture, and re-reading the snapshot yields
    exactly the changed+new pages."""
    import gzip

    from pyspark.sql import functions as F

    from gocrawler_spark.sources.cdx import prev_digests
    from gocrawler_spark.sources.warc import read_warc_binary

    def pages_of(docs, day):
        rows = [(f"https://rv.example/{k}", f"2021-06-{day:02d}T00:00:00Z",
                 body.encode(), 200, "text/html") for k, body in docs.items()]
        return spark.createDataFrame(
            rows, "url string, ts string, html binary, http_status int, mime string"
        ).selectExpr(
            "url", "to_timestamp(ts, \"yyyy-MM-dd'T'HH:mm:ss'Z'\") as warc_ts",
            "html", "http_status", "mime"
        )

    import hashlib

    def fill(seed, n=40):  # incompressible body: gzip can't hide it
        return " ".join(hashlib.sha256(f"{seed}{i}".encode()).hexdigest()
                        for i in range(n))

    snap_a = {"a": fill("alpha"), "b": fill("beta"), "c": fill("gamma")}
    wd_a, idx_a = tmp_path / "a_warc", tmp_path / "a_idx"
    wd_a.mkdir()
    write_cdx(
        write_warc(pages_of(snap_a, 1).repartition(2), str(wd_a),
                   per_record_index=True),
        str(idx_a), n_shards=1,
    )

    snap_b = {"a": fill("alpha"),           # unchanged -> revisit
              "b": fill("beta-v2"),         # changed  -> response
              "d": fill("delta")}           # new      -> response
    prev = prev_digests(spark, str(idx_a))
    pages_b = pages_of(snap_b, 9).join(prev, "url", "left")
    wd_b, idx_b = tmp_path / "b_warc", tmp_path / "b_idx"
    wd_b.mkdir()
    recs_b = write_warc(pages_b.repartition(1), str(wd_b), per_record_index=True)
    manifest = write_cdx(recs_b, str(idx_b), n_shards=1)

    # the index covers ALL THREE captures (revisits are indexed too)
    assert sum(m["n_records"] for m in manifest) == 3
    # the raw segment holds exactly one revisit record, for 'a'
    blob = b"".join(
        gzip.decompress(g) if g[:2] == b"\x1f\x8b" else g
        for g in [open(wd_b / f, "rb").read() for f in sorted(os.listdir(wd_b))]
    )
    raw = _gunzip_concat(wd_b)
    assert raw.count(b"WARC-Type: revisit") == 1
    assert raw.count(b"WARC-Type: response") == 2
    assert b"WARC-Refers-To-Target-URI: https://rv.example/a" in raw
    # body of the unchanged page is NOT in snapshot B's segments
    assert snap_b["a"].encode() not in raw and snap_b["b"].encode() in raw
    # re-reading snapshot B yields exactly the changed+new pages
    back = read_warc_binary(spark, str(wd_b / "*.warc.gz"))
    assert {r["url"].rsplit("/", 1)[-1] for r in back.collect()} == {"b", "d"}
    # and storage actually shrank vs writing 'a' in full
    full = tmp_path / "b_full"
    full.mkdir()
    write_warc(pages_of(snap_b, 9).repartition(1), str(full)).collect()
    size_rv = sum((wd_b / f).stat().st_size for f in os.listdir(wd_b))
    size_full = sum((full / f).stat().st_size for f in os.listdir(full))
    assert size_rv < size_full


def _gunzip_concat(d):
    import gzip as _g

    out = []
    for f in sorted(os.listdir(d)):
        b = open(os.path.join(d, f), "rb").read()
        # per-member gzip: decompress the whole concatenated stream
        from gocrawler_spark.sources.warc import _gunzip_members
        out.append(_gunzip_members(b))
    return b"".join(out)


def test_cdx_block_granular_point_lookup(spark, tmp_path):
    """cluster.idx at block granularity: with block_size records per
    gzip member, a point lookup's pruned byte ranges are a STRICT
    subset of the matching shard — O(block), not O(shard) — and the
    results equal the full-scan filter."""
    from gocrawler_spark.sources.cdx import _blocks_for_prefix

    rows, df = _pages(spark, 60)
    warc_dir = tmp_path / "segments"
    warc_dir.mkdir()
    records = write_warc(df.repartition(4), str(warc_dir), per_record_index=True)
    idx_dir = str(tmp_path / "index")
    manifest = write_cdx(records, idx_dir, n_shards=2, block_size=5)
    # multiple blocks per shard, tiling the shard's bytes exactly
    for m in manifest:
        assert len(m["blocks"]) >= 2
        pos = 0
        for b in m["blocks"]:
            assert b["offset"] == pos and b["length"] > 0
            pos += b["length"]
        assert pos == os.path.getsize(m["path"])
        assert sum(b["n_records"] for b in m["blocks"]) == m["n_records"]
    key = "example,site03)"
    blocks = _blocks_for_prefix(idx_dir, key)
    assert blocks, "prefix must match at least one block"
    # strict subset: the picked blocks of any shard cover less than it
    by_path = {}
    for path, off, ln in blocks:
        assert ln > 0
        by_path.setdefault(path, 0)
        by_path[path] += ln
    assert all(tot < os.path.getsize(p) for p, tot in by_path.items())
    got = sorted(r["url"] for r in cdx_lookup(spark, idx_dir, key).collect())
    want = sorted(
        r["url"]
        for r in read_cdx(spark, os.path.join(idx_dir, "cdx-*")).collect()
        if r["urlkey"].startswith(key)
    )
    assert got == want and len(got) == 6  # 60 pages / 10 domains
    # point query rides the same block pruning
    target = rows[3][0]
    assert [r["url"] for r in cdx_get(spark, idx_dir, target).collect()] == [target]


def test_cdx_multimember_gzip_reads_whole_index(spark, tmp_path):
    """Block-per-member shards are still one valid .gz stream: both
    spark.read.text (read_cdx) and Python gzip see every record, and
    bytes are deterministic across identical writes."""
    rows, df = _pages(spark, 33)
    warc_dir = tmp_path / "segments"
    warc_dir.mkdir()
    records = write_warc(df.repartition(3), str(warc_dir), per_record_index=True)
    d1, d2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    m1 = write_cdx(records, d1, n_shards=1, block_size=7)
    m2 = write_cdx(records, d2, n_shards=1, block_size=7)
    shard = m1[0]["path"]
    assert open(shard, "rb").read() == open(m2[0]["path"], "rb").read()
    with gzip.open(shard, "rt", encoding="utf-8") as fh:
        lines = [line for line in fh]
    assert len(lines) == len(rows) and lines == sorted(lines)
    back = read_cdx(spark, os.path.join(d1, "cdx-*")).collect()
    assert {r["url"] for r in back} == {u for (u, *_r) in rows}


def test_cdx_lookup_legacy_cluster_idx(spark, tmp_path):
    """Pre-block cluster.idx lines (4 fields, one per shard) still
    route lookups: offset 0 / whole-file reads."""
    rows, df = _pages(spark, 20)
    warc_dir = tmp_path / "segments"
    warc_dir.mkdir()
    records = write_warc(df.repartition(2), str(warc_dir), per_record_index=True)
    idx_dir = str(tmp_path / "index")
    manifest = write_cdx(records, idx_dir, n_shards=2, block_size=4)
    # rewrite cluster.idx in the legacy per-shard 4-field format
    with open(os.path.join(idx_dir, "cluster.idx"), "w", encoding="utf-8") as fh:
        for m in manifest:
            fh.write(
                f"{m['first_key']}\t{m['last_key']}\t"
                f"{os.path.basename(m['path'])}\t{m['n_records']}\n"
            )
    key = "example,site03)"
    got = {r["url"] for r in cdx_lookup(spark, idx_dir, key).collect()}
    assert got == {u for (u, *_r) in rows if "site03.example" in u}


def test_warc_full_cc_record_set(spark, tmp_path):
    """warcinfo + request + response/revisit — the full Common Crawl
    segment record set: one warcinfo opens each segment, every capture
    gets a request record linked by WARC-Concurrent-To, the per-record
    index still points exactly at the response/revisit records, and
    read_warc_binary (which keeps responses only) round-trips the pages
    untouched by the extra record types."""
    from gocrawler_spark.sources.warc import read_warc_binary

    rows, df = _pages(spark, 18)
    wd = tmp_path / "segments"
    wd.mkdir()
    recs = write_warc(
        df.repartition(2), str(wd), per_record_index=True,
        warcinfo=True, request_records=True,
    ).collect()
    raw = _gunzip_concat(wd)
    n_files = len(os.listdir(wd))
    assert raw.count(b"WARC-Type: warcinfo") == n_files
    assert raw.count(b"WARC-Type: request") == len(rows)
    assert raw.count(b"WARC-Type: response") == len(rows)
    assert b"Content-Type: application/warc-fields" in raw
    assert b"software: gocrawler-spark" in raw
    # requests carry the engine UA and link to their response record
    from gocrawler_spark.plans.crawl import USER_AGENT
    assert raw.count(f"User-Agent: {USER_AGENT}".encode()) == len(rows)
    assert raw.count(b"WARC-Concurrent-To: <urn:md5:") == len(rows)
    # the index has one row per CAPTURE (not per record) and each
    # (offset, length) slice is exactly its response record
    assert len(recs) == len(rows)
    for r in recs:
        headers, payload = fetch_warc_record(
            str(wd), r["filename"], r["offset"], r["length"]
        )
        assert headers["warc-type"] == "response"
        assert headers["warc-target-uri"] == r["url"]
    # reader sees only the response pages
    back = read_warc_binary(spark, os.path.join(str(wd), "part-*")).collect()
    assert {b["url"] for b in back} == {u for (u, *_r) in rows}
    # determinism: an identical second write is byte-identical
    wd2 = tmp_path / "segments2"
    wd2.mkdir()
    write_warc(
        df.repartition(2), str(wd2), per_record_index=True,
        warcinfo=True, request_records=True,
    ).collect()
    assert sorted(os.listdir(wd)) == sorted(os.listdir(wd2))
    for f in sorted(os.listdir(wd)):
        assert open(wd / f, "rb").read() == open(wd2 / f, "rb").read()
