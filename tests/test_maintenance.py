"""Table maintenance: SnapshotCatalog.compact / expire_snapshots and the
crawl loop's maintenance_every wiring (Iceberg rewrite_data_files +
expire_snapshots semantics). A long-running frontier appends one data
spray per round and pins every snapshot's dirs forever; maintenance must
fold the sprays back to one root and reclaim unreachable dirs WITHOUT
breaking time-travel inside the retention window, resume, or the
bucket-delta merge fast path."""

import os

import pytest
from pyspark.sql import functions as F

from gocrawler_spark.tables.catalog import BUCKET_COL, SnapshotCatalog, bucket_of


def _data_roots(cat, table):
    d = os.path.join(cat._tdir(table), "data")
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def _rows(cat, table):
    return sorted((r["id"], r["v"]) for r in cat.read(table).collect())


def test_compact_folds_append_sprays(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path), spark)
    expect = []
    for i in range(5):
        df = spark.createDataFrame(
            [(f"k{i}-{j}", f"v{i}-{j}") for j in range(7)], "id string, v string"
        )
        expect += [(f"k{i}-{j}", f"v{i}-{j}") for j in range(7)]
        if i == 0:
            cat.overwrite("t", df)
        else:
            cat.append("t", df, n_rows=7)
    pre = cat.current_snapshot("t")
    assert len(cat._manifest("t", pre)["dirs"]) == 5
    snap = cat.compact("t")
    assert snap == pre + 1
    man = cat._manifest("t", snap)
    assert man["op"] == "compact"
    assert len(man["dirs"]) == 1 and isinstance(man["dirs"][0], str)
    assert _rows(cat, "t") == sorted(expect)
    # time-travel to a pre-compact snapshot still works (not yet expired)
    assert cat.read("t", snapshot_id=2).count() == 14
    # already-compact table: no-op, no new snapshot
    assert cat.compact("t") is None
    assert cat.current_snapshot("t") == snap


def test_compact_bucketed_preserves_spec_and_delta_merges(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path), spark)
    spec = ("id", 4)
    base = spark.createDataFrame(
        [(f"k{i}", f"v{i}") for i in range(30)], "id string, v string"
    ).withColumn(BUCKET_COL, bucket_of(F.col("id"), 4))
    cat.overwrite("t", base, partition_by=BUCKET_COL, bucket_spec=spec)
    for key, val in [("k1", "A"), ("k2", "B"), ("k40", "NEW")]:
        upd = spark.createDataFrame([(key, val)], "id string, v string").withColumn(
            BUCKET_COL, bucket_of(F.col("id"), 4)
        )
        cat.merge_upsert("t", upd, "id", partition_by=BUCKET_COL, bucket_spec=spec)
    # merge-delta snapshots carry partial {root, parts} entries
    pre_man = cat._manifest("t", cat.current_snapshot("t"))
    assert any(isinstance(e, dict) for e in pre_man["dirs"])
    expect = _rows(cat, "t")

    snap = cat.compact("t")
    man = cat._manifest("t", snap)
    assert man["op"] == "compact"
    assert len(man["dirs"]) == 1
    assert man["bucket_spec"] == list(spec)
    assert _rows(cat, "t") == expect
    # the bucket-delta fast path still engages on the compacted layout
    upd = spark.createDataFrame([("k3", "C")], "id string, v string").withColumn(
        BUCKET_COL, bucket_of(F.col("id"), 4)
    )
    snap2 = cat.merge_upsert("t", upd, "id", partition_by=BUCKET_COL, bucket_spec=spec)
    assert cat._manifest("t", snap2)["op"] == "merge-delta"
    got = dict(_rows(cat, "t"))
    assert got["k3"] == "C" and got["k1"] == "A" and len(got) == 31


def test_expire_snapshots_reclaims_unreferenced_roots(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path), spark)
    for i in range(4):
        df = spark.createDataFrame([(f"k{i}", f"v{i}")], "id string, v string")
        (cat.overwrite if i == 0 else cat.append)("t", df)
    assert len(_data_roots(cat, "t")) == 4
    # appends carry parent dirs forward: expiring alone reclaims nothing
    stats = cat.expire_snapshots("t", keep_last=1)
    assert stats["expired"] == [1, 2, 3] and stats["deleted_roots"] == 0
    assert len(_data_roots(cat, "t")) == 4
    with pytest.raises(FileNotFoundError):
        cat.read("t", snapshot_id=2)  # manifest gone
    expect = _rows(cat, "t")
    # an orphan root (crashed write, commit never landed) is reclaimed too
    orphan = os.path.join(cat._tdir("t"), "data", "deadbeef0000")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000.parquet"), "wb") as f:
        f.write(b"x" * 64)
    # compact + expire is the reclaim pattern
    cat.compact("t")
    stats = cat.expire_snapshots("t", keep_last=1)
    assert stats["expired"] == [4]
    assert stats["deleted_roots"] == 5  # 4 superseded appends + 1 orphan
    assert stats["bytes_reclaimed"] > 0
    assert len(_data_roots(cat, "t")) == 1
    assert _rows(cat, "t") == expect
    # no-retention-args call is a no-op, current never expires
    assert cat.expire_snapshots("t")["expired"] == []
    assert cat.expire_snapshots("t", keep_last=1)["expired"] == []
    assert cat.snapshots("t") == [cat.current_snapshot("t")]


def test_expire_prunes_unreferenced_bucket_parts(spark, tmp_path):
    """A bucket-delta merge leaves the original root partially referenced
    ({root, parts}); expiring the pre-merge snapshot must delete exactly
    the superseded bucket dirs inside that root and keep the carried-
    forward ones readable."""
    cat = SnapshotCatalog(str(tmp_path), spark)
    spec = ("id", 4)
    base = spark.createDataFrame(
        [(f"k{i}", f"v{i}") for i in range(30)], "id string, v string"
    ).withColumn(BUCKET_COL, bucket_of(F.col("id"), 4))
    cat.overwrite("t", base, partition_by=BUCKET_COL, bucket_spec=spec)
    root0 = os.path.join(cat._tdir("t"), "data", _data_roots(cat, "t")[0])
    parts_before = {p for p in os.listdir(root0) if p.startswith(f"{BUCKET_COL}=")}
    upd = spark.createDataFrame([("k1", "A")], "id string, v string").withColumn(
        BUCKET_COL, bucket_of(F.col("id"), 4)
    )
    touched = f"{BUCKET_COL}={upd.collect()[0][BUCKET_COL]}"
    cat.merge_upsert("t", upd, "id", partition_by=BUCKET_COL, bucket_spec=spec)
    expect = _rows(cat, "t")

    stats = cat.expire_snapshots("t", keep_last=1)
    assert stats["expired"] == [1]
    assert stats["deleted_parts"] == 1  # only the superseded bucket dir
    parts_after = {p for p in os.listdir(root0) if p.startswith(f"{BUCKET_COL}=")}
    assert parts_after == parts_before - {touched}
    assert _rows(cat, "t") == expect


def test_maintain_covers_analytics_tables(spark, tmp_path):
    """host_edges / page_digests (opt-in rank_hosts / recrawl_budget
    analytics) append one spray per round but are never checkpointed;
    CrawlJob.maintain must fold and expire them too — a crawl's
    steady-state cleans round R-1's sprays during round R's maintenance,
    so two maintain() calls here reach the fully-reclaimed fixpoint."""
    from gocrawler_spark.plans.crawl import CrawlConfig, CrawlJob
    from gocrawler_spark.profiles import MIXUP

    cat = SnapshotCatalog(str(tmp_path), spark)
    for t, ddl in (("host_edges", "src string, dst string, weight long, round int"),
                   ("page_digests", "url string, round int, digest string")):
        for i in range(4):
            row = [(f"h{i}", f"h{i+1}", 1, i)] if t == "host_edges" else [(f"u{i}", i, f"d{i}")]
            df = spark.createDataFrame(row, ddl)
            (cat.overwrite if i == 0 else cat.append)(t, df)
        assert len(cat._manifest(t, cat.current_snapshot(t))["dirs"]) == 4

    job = CrawlJob(spark, cat, MIXUP, CrawlConfig(maintenance_every=1))
    job.maintain()
    job.maintain()
    for t in ("host_edges", "page_digests"):
        man = cat._manifest(t, cat.current_snapshot(t))
        assert man["op"] == "compact" and len(man["dirs"]) == 1
        assert len(_data_roots(cat, t)) == 1
        assert cat.read(t).count() == 4  # content intact


def test_retain_from_keeps_resume_window(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path), spark)
    for i in range(5):
        df = spark.createDataFrame([(f"k{i}", f"v{i}")], "id string, v string")
        (cat.overwrite if i == 0 else cat.append)("t", df)
    cat.expire_snapshots("t", retain_from=3)
    assert cat.snapshots("t") == [3, 4, 5]
    # rollback inside the retention window (the resume path) works
    cat.rollback("t", 3)
    assert cat.read("t").count() == 3
    # both bounds given: the more conservative (more retained) wins
    cat2 = SnapshotCatalog(str(tmp_path / "b"), spark)
    for i in range(4):
        df = spark.createDataFrame([(f"k{i}", f"v{i}")], "id string, v string")
        (cat2.overwrite if i == 0 else cat2.append)("t", df)
    cat2.expire_snapshots("t", keep_last=1, retain_from=2)
    assert cat2.snapshots("t") == [2, 3, 4]
