"""Unit tests for the frontier-side operators: bloom, politeness,
robots, snapshot catalog."""

import pyspark.sql.functions as F
import pytest

from gocrawler_spark.operators.bloom import Bloom, bloom_prefilter, build_bloom
from gocrawler_spark.operators.politeness import select_fetch_set
from gocrawler_spark.operators.robots import robots_filter
from gocrawler_spark.tables.catalog import SnapshotCatalog

from .conftest import robots_df


def test_bloom_no_false_negatives(spark):
    urls = [(f"https://h{i % 7}.example/p{i}",) for i in range(5000)]
    df = spark.createDataFrame(urls, "url string").repartition(6)
    bloom = build_bloom(df, "url", n_bits=1 << 16, n_hashes=4)
    # every inserted key must be reported possibly-seen (no false negatives)
    flagged = bloom_prefilter(df, "url", bloom)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
    # unseen keys: most must be definite-negatives (fpp sanity)
    other = spark.createDataFrame(
        [(f"https://new{i}.example/x{i}",) for i in range(2000)], "url string"
    )
    fp = bloom_prefilter(other, "url", bloom).filter(F.col("maybe_seen")).count()
    assert fp / 2000 < 0.2


def test_bloom_union_equivalence():
    import numpy as np

    a = Bloom(1 << 12, 3)
    b = Bloom(1 << 12, 3)
    h = np.arange(100, dtype=np.uint64) * np.uint64(2654435761)
    g = h + np.uint64(17)
    a.add_hashes(h[:50], g[:50])
    b.add_hashes(h[50:], g[50:])
    u = a.union(b)
    assert u.contains_hashes(h, g).all()


def test_politeness_salted_equals_unsalted(spark):
    rows = [
        (f"https://host{i % 3}.example/p{j:03d}", f"host{i % 3}.example", j % 2)
        for i in range(3)
        for j in range(40)
    ]
    df = spark.createDataFrame(rows, "url string, host string, priority int")
    for credit in (1, 4, 10):
        salted = select_fetch_set(df, credit, salt_parts=8)
        plain = select_fetch_set(df, credit, salt_parts=1)
        s = sorted(r["url"] for r in salted.filter("is_selected").collect())
        p = sorted(r["url"] for r in plain.filter("is_selected").collect())
        assert s == p
        # exactly credit per host (each host has >credit candidates)
        per_host = (
            salted.filter("is_selected").groupBy("host").count().collect()
        )
        assert all(r["count"] == credit for r in per_host)


def test_robots_longest_prefix(spark):
    robots = robots_df(
        spark,
        [
            {"host": "a.example", "agent": "*", "rule": "disallow", "path_prefix": "/", "crawl_delay_ms": 0},
            {"host": "a.example", "agent": "*", "rule": "allow", "path_prefix": "/public", "crawl_delay_ms": 0},
            {"host": "b.example", "agent": "*", "rule": "disallow", "path_prefix": "/private", "crawl_delay_ms": 0},
        ],
    )
    cands = spark.createDataFrame(
        [
            ("https://a.example/secret/x", "a.example", "/secret/x"),
            ("https://a.example/public/x", "a.example", "/public/x"),
            ("https://b.example/ok", "b.example", "/ok"),
            ("https://b.example/private/x", "b.example", "/private/x"),
            ("https://c.example/anything", "c.example", "/anything"),
        ],
        "url string, host string, path string",
    )
    kept = {r["url"] for r in robots_filter(cands, robots).collect()}
    assert kept == {
        "https://a.example/public/x",
        "https://b.example/ok",
        "https://c.example/anything",
    }


def test_robots_filter_three_plans_agree(spark):
    """The map-literal, single-rule broadcast-join, and general fold
    plans must return identical rows on a single-rule-per-host table —
    and the map-literal plan must actually be join-free."""
    from gocrawler_spark.operators.robots import CompiledRobots, compile_robots

    rows = [
        {"host": "a.example", "agent": "*", "rule": "disallow", "path_prefix": "/private", "crawl_delay_ms": 0},
        {"host": "b.example", "agent": "*", "rule": "allow", "path_prefix": "/", "crawl_delay_ms": 0},
    ]
    robots = robots_df(spark, rows)
    cands = spark.createDataFrame(
        [
            ("https://a.example/private/x", "a.example", "/private/x"),
            ("https://a.example/ok", "a.example", "/ok"),
            ("https://b.example/anything", "b.example", "/anything"),
            ("https://c.example/no-rules", "c.example", "/no-rules"),
        ],
        "url string, host string, path string",
    )
    compiled = compile_robots(robots)
    assert compiled.max_rules == 1 and compiled.single_rule_rows is not None
    via_map = robots_filter(cands, robots, compiled=compiled)
    # the map plan contains no join operator
    assert "Join" not in via_map._jdf.queryExecution().executedPlan().toString()
    # force the single-rule JOIN path (as if the table were too big to inline)
    via_join = robots_filter(
        cands, robots, compiled=CompiledRobots(max_rules=1, single_rule_rows=None)
    )
    # force the general fold path
    via_fold = robots_filter(
        cands, robots, compiled=CompiledRobots(max_rules=2, single_rule_rows=None)
    )
    expected = {
        "https://a.example/ok",
        "https://b.example/anything",
        "https://c.example/no-rules",
    }
    for df in (via_map, via_join, via_fold):
        assert {r["url"] for r in df.collect()} == expected


def test_robots_wildcards_three_plans(spark):
    """Google-REP ``*`` and trailing-``$`` wildcards (which
    temoto/robotstxt also implements) match identically in all three
    robots_filter plans AND in the golden simulator's matcher;
    specificity = raw pattern length, allow wins ties; plain-prefix
    rules keep the startswith path."""
    from gocrawler_spark.operators.robots import CompiledRobots, compile_robots
    from gocrawler_spark.sim.simulator import _robots_allowed

    rows = [
        {"host": "a.example", "agent": "*", "rule": "disallow", "path_prefix": "/*.php$", "crawl_delay_ms": 0},
        {"host": "a.example", "agent": "*", "rule": "allow", "path_prefix": "/public/*.php$", "crawl_delay_ms": 0},
        {"host": "b.example", "agent": "*", "rule": "disallow", "path_prefix": "/fish*", "crawl_delay_ms": 0},
        {"host": "c.example", "agent": "*", "rule": "disallow", "path_prefix": "/$", "crawl_delay_ms": 0},
    ]
    paths = [
        ("a.example", "/x.php"), ("a.example", "/x.php?q=1"),
        ("a.example", "/public/x.php"), ("a.example", "/ok"),
        ("b.example", "/fishheads"), ("b.example", "/catfish"),
        ("c.example", "/"), ("c.example", "/x"),
        ("d.example", "/anything"),
    ]
    cands = spark.createDataFrame(
        [(f"https://{h}{p}", h, p) for h, p in paths],
        "url string, host string, path string",
    )
    robots = robots_df(spark, rows)
    expected = {f"https://{h}{p}" for h, p in paths if _robots_allowed(rows, h, p)}
    # the battery must exercise both verdicts or the test proves nothing
    assert expected and len(expected) < len(paths)
    via_fold = robots_filter(
        cands, robots, compiled=CompiledRobots(max_rules=2, single_rule_rows=None)
    )
    assert {r["url"] for r in via_fold.collect()} == expected
    # single-wildcard-rule hosts only -> the map-literal and join plans
    single = [r for r in rows if r["host"] != "a.example"]
    sdf = robots_df(spark, single)
    sexp = {f"https://{h}{p}" for h, p in paths if _robots_allowed(single, h, p)}
    compiled = compile_robots(sdf)
    assert compiled.single_rule_rows is not None
    via_map = robots_filter(cands, sdf, compiled=compiled)
    via_join = robots_filter(
        cands, sdf, compiled=CompiledRobots(max_rules=1, single_rule_rows=None)
    )
    for df in (via_map, via_join):
        assert {r["url"] for r in df.collect()} == sexp


def test_robots_parse_semantics(spark):
    """parse_robots_pages: grouping, agent matching, comments, empty
    Disallow, fractional Crawl-delay — temoto/robotstxt semantics."""
    from gocrawler_spark.operators.robots_parse import parse_robots_pages

    body = (
        "# top comment\n"
        "Disallow: /ignored-before-any-group\n"
        "User-agent: *\n"
        "Allow: /public  # trailing comment\n"
        "Disallow: /private\n"
        "\n"
        "User-agent: gocrawler\n"
        "User-agent: otherbot\n"
        "Disallow: /bots\n"
        "Crawl-delay: 10s\n"  # unparseable (ANSI cast would throw): dropped
        "Crawl-delay: 1.5\n"  # first VALID delay wins
        "Disallow:\n"  # empty path: no-op
        "\n"
        "User-agent: unrelated\n"
        "Disallow: /\n"
    )
    pages = spark.createDataFrame(
        [("https://h.example/robots.txt", body.encode())], "url string, html binary"
    )
    # UA contains 'gocrawler' -> that group (mlen 9) beats '*' (mlen 0)
    rows = parse_robots_pages(pages, user_agent="gocrawler/1.0").collect()
    assert [(r["host"], r["agent"], r["rule"], r["path_prefix"], r["crawl_delay_ms"]) for r in rows] == [
        ("h.example", "gocrawler", "disallow", "/bots", 1500)
    ]
    # unknown UA -> '*' group; rules before any group are dropped
    rows = sorted(
        parse_robots_pages(pages, user_agent="nobody").collect(),
        key=lambda r: r["path_prefix"],
    )
    assert [(r["rule"], r["path_prefix"], r["crawl_delay_ms"]) for r in rows] == [
        ("disallow", "/private", 0),
        ("allow", "/public", 0),
    ]


def test_robots_findgroup_prefix_single_group(spark):
    """temoto FindGroup pins: (1) agent tokens match by PREFIX of the
    UA, not substring — 'firefox' must NOT capture a Mozilla UA that
    merely contains it; (2) exactly ONE group wins; (3) a winning group
    with only a Crawl-delay still emits a delay-carrying 'allow /' row;
    (4) a duplicate token's later group overwrites the earlier one."""
    from gocrawler_spark.operators.robots_parse import parse_robots_pages

    body = (
        "User-agent: *\n"
        "Crawl-delay: 3\n"          # delay-only star group
        "\n"
        "User-agent: firefox\n"
        "Disallow: /ff\n"
        "\n"
        "User-agent: mozilla\n"
        "Disallow: /old\n"
        "\n"
        "User-agent: mozilla\n"     # duplicate token: this group wins
        "Disallow: /new\n"
    )
    pages = spark.createDataFrame(
        [("https://h.example/robots.txt", body.encode())], "url string, html binary"
    )
    # substring-but-not-prefix 'firefox' must not match; 'mozilla' is a
    # prefix; the LAST mozilla group is the single winner
    rows = parse_robots_pages(
        pages, user_agent="Mozilla/5.0 (Gecko) Firefox/100"
    ).collect()
    assert [(r["agent"], r["rule"], r["path_prefix"], r["crawl_delay_ms"]) for r in rows] == [
        ("mozilla", "disallow", "/new", 0)
    ]
    # unknown UA -> the '*' group; its Crawl-delay survives as allow /
    rows = parse_robots_pages(pages, user_agent="nobody").collect()
    assert [(r["agent"], r["rule"], r["path_prefix"], r["crawl_delay_ms"]) for r in rows] == [
        ("*", "allow", "/", 3000)
    ]


def test_robots_sitemaps(spark):
    from gocrawler_spark.operators.robots_parse import parse_robots_pages, robots_sitemaps

    body = (
        "Sitemap: https://h.example/sitemap.xml\n"
        "User-agent: *\n"
        "Disallow: /x\n"
        "Sitemap: https://cdn.example/other-sitemap.xml  # comment\n"
        "sitemap: https://h.example/lower.xml\n"
    )
    pages = spark.createDataFrame(
        [("https://h.example/robots.txt", body.encode())], "url string, html binary"
    )
    got = sorted((r["host"], r["sitemap_url"]) for r in robots_sitemaps(pages).collect())
    assert got == [
        ("h.example", "https://cdn.example/other-sitemap.xml"),
        ("h.example", "https://h.example/lower.xml"),
        ("h.example", "https://h.example/sitemap.xml"),
    ]
    # sitemap lines are transparent to the rule parser
    rules = parse_robots_pages(pages, user_agent="anybot").collect()
    assert [(r["rule"], r["path_prefix"]) for r in rules] == [("disallow", "/x")]


def test_robots_parse_roundtrip_matches_datagen(spark):
    """Rendered-from-rules bodies parse back to exactly the rule rows
    entry()'s crawl previously consumed directly — the parity guard for
    wiring parse_robots_pages ahead of load_robots."""
    from gocrawler_spark.datagen import robots_pages
    from gocrawler_spark.operators.robots_parse import parse_robots_pages
    from gocrawler_spark.plans.crawl import USER_AGENT

    robots = []
    for k in range(6):
        h = f"shop{k:03d}.example"
        if k == 3:
            robots.append({"host": h, "agent": "*", "rule": "disallow",
                           "path_prefix": "/Mixup/detproducto", "crawl_delay_ms": 1500})
        else:
            robots.append({"host": h, "agent": "*", "rule": "allow",
                           "path_prefix": "/", "crawl_delay_ms": 1500})
    parsed = parse_robots_pages(robots_pages(spark, robots), user_agent=USER_AGENT)
    got = sorted(
        (r["host"], r["agent"], r["rule"], r["path_prefix"], r["crawl_delay_ms"])
        for r in parsed.collect()
    )
    want = sorted(
        (r["host"], r["agent"], r["rule"], r["path_prefix"], r["crawl_delay_ms"])
        for r in robots
    )
    assert got == want


def test_catalog_snapshots_and_rollback(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path), spark)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    s1 = cat.overwrite("t", df1)
    df2 = spark.createDataFrame([(3, "c")], "id int, v string")
    s2 = cat.append("t", df2)
    assert cat.read("t").count() == 3
    assert cat.read("t", snapshot_id=s1).count() == 2  # time travel
    cat.rollback("t", s1)
    assert cat.read("t").count() == 2
    # empty write handling
    empty = spark.createDataFrame([], "id int, v string")
    cat.overwrite("t", empty)
    assert cat.read("t").count() == 0
    assert cat.read("t").columns == ["id", "v"]


def test_catalog_bucket_spec_change_no_duplicates(spark, tmp_path):
    """ADVICE r2 (catalog.py:226): a MERGE whose update batch was
    bucketed under a DIFFERENT n_buckets than the table layout must not
    silently duplicate matched keys — the spec mismatch forces a
    re-bucketed full merge, and the new spec is recorded."""
    from gocrawler_spark.tables.catalog import BUCKET_COL, SnapshotCatalog, bucket_of

    cat = SnapshotCatalog(str(tmp_path), spark)
    base = spark.createDataFrame(
        [(f"k{i}", i) for i in range(40)], "id string, v int"
    ).withColumn(BUCKET_COL, bucket_of(F.col("id"), 16))
    cat.overwrite("t", base, partition_by=BUCKET_COL, bucket_spec=("id", 16))
    assert cat.bucket_spec("t") == ["id", 16]

    # resume with n_buckets=4: same keys, new values, different layout
    upd = spark.createDataFrame(
        [(f"k{i}", 100 + i) for i in range(0, 40, 2)], "id string, v int"
    ).withColumn(BUCKET_COL, bucket_of(F.col("id"), 4))
    cat.merge_upsert("t", upd, "id", partition_by=BUCKET_COL, bucket_spec=("id", 4))

    out = cat.read("t")
    assert out.count() == 40  # no duplicate ids
    assert out.select("id").distinct().count() == 40
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got["k0"] == 100 and got["k1"] == 1
    # layout fully re-bucketed + spec updated -> delta path safe again
    assert cat.bucket_spec("t") == ["id", 4]
    buckets = {r[BUCKET_COL] for r in out.select(BUCKET_COL).distinct().collect()}
    assert buckets <= set(range(4))
    # matched-spec merge still takes the delta path (op recorded as such)
    upd2 = spark.createDataFrame([("k1", 999)], "id string, v int").withColumn(
        BUCKET_COL, bucket_of(F.col("id"), 4)
    )
    cat.merge_upsert("t", upd2, "id", partition_by=BUCKET_COL, bucket_spec=("id", 4))
    man = cat._manifest("t", cat.current_snapshot("t"))
    assert man["op"] == "merge-delta"
    assert cat.read("t").count() == 40


def test_catalog_unrecorded_spec_forces_rebucket(spark, tmp_path):
    """ADVICE r3 (catalog.py:140): a legacy table written bucketed but
    with NO recorded spec ([]) must not let a later spec'd merge take
    the delta fast path on an unverified modulus — the [] layout is a
    mismatch and forces the re-bucketed full merge."""
    from gocrawler_spark.tables.catalog import BUCKET_COL, SnapshotCatalog, bucket_of

    cat = SnapshotCatalog(str(tmp_path), spark)
    # legacy writer: bucketed under modulus 16 but spec unrecorded
    base = spark.createDataFrame(
        [(f"k{i}", i) for i in range(40)], "id string, v int"
    ).withColumn(BUCKET_COL, bucket_of(F.col("id"), 16))
    cat.overwrite("t", base, partition_by=BUCKET_COL)
    assert cat.bucket_spec("t") == []

    upd = spark.createDataFrame(
        [(f"k{i}", 100 + i) for i in range(0, 40, 2)], "id string, v int"
    ).withColumn(BUCKET_COL, bucket_of(F.col("id"), 4))
    cat.merge_upsert("t", upd, "id", partition_by=BUCKET_COL, bucket_spec=("id", 4))
    out = cat.read("t")
    assert out.count() == 40
    assert out.select("id").distinct().count() == 40
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got["k0"] == 100 and got["k1"] == 1
    assert cat.bucket_spec("t") == ["id", 4]
    man = cat._manifest("t", cat.current_snapshot("t"))
    assert man["op"] != "merge-delta"
    # spec'd append onto an []-spec table re-buckets the same way
    cat2 = SnapshotCatalog(str(tmp_path / "t2"), spark)
    cat2.overwrite("t", base, partition_by=BUCKET_COL)
    extra = spark.createDataFrame([("x1", 1)], "id string, v int").withColumn(
        BUCKET_COL, bucket_of(F.col("id"), 4)
    )
    cat2.append("t", extra, partition_by=BUCKET_COL, bucket_spec=("id", 4))
    assert cat2.bucket_spec("t") == ["id", 4]
    out2 = cat2.read("t")
    assert out2.count() == 41
    assert {r[BUCKET_COL] for r in out2.select(BUCKET_COL).distinct().collect()} <= set(range(4))


def test_catalog_append_spec_change_rebuckets(spark, tmp_path):
    """Appending under a changed spec rewrites the layout instead of
    mixing moduli in one table."""
    from gocrawler_spark.tables.catalog import BUCKET_COL, SnapshotCatalog, bucket_of

    cat = SnapshotCatalog(str(tmp_path), spark)
    base = spark.createDataFrame([(f"a{i}", i) for i in range(10)], "id string, v int") \
        .withColumn(BUCKET_COL, bucket_of(F.col("id"), 8))
    cat.overwrite("t", base, partition_by=BUCKET_COL, bucket_spec=("id", 8))
    extra = spark.createDataFrame([(f"b{i}", i) for i in range(10)], "id string, v int") \
        .withColumn(BUCKET_COL, bucket_of(F.col("id"), 2))
    cat.append("t", extra, partition_by=BUCKET_COL, bucket_spec=("id", 2))
    out = cat.read("t")
    assert out.count() == 20
    assert {r[BUCKET_COL] for r in out.select(BUCKET_COL).distinct().collect()} <= {0, 1}
    assert cat.bucket_spec("t") == ["id", 2]


def test_catalog_merge_upsert(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path), spark)
    cat.overwrite("t", spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"))
    cat.merge_upsert("t", spark.createDataFrame([(2, "B"), (3, "C")], "id int, v string"), "id")
    rows = {r["id"]: r["v"] for r in cat.read("t").collect()}
    assert rows == {1: "a", 2: "B", 3: "C"}


def test_catalog_bucket_delta_merge(spark, tmp_path):
    """An upsert touching one bucket must rewrite ONLY that bucket: the
    other buckets' parquet files are carried forward in the manifest
    byte-identically (the Iceberg MERGE file-rewrite shape; VERDICT r1
    scale fix #4)."""
    import glob
    import hashlib
    import json
    import os

    from pyspark.sql import functions as F

    from gocrawler_spark.tables.catalog import BUCKET_COL, bucket_of

    cat = SnapshotCatalog(str(tmp_path), spark)
    base = spark.createDataFrame(
        [(f"k{i}", f"v{i}") for i in range(40)], "id string, v string"
    ).withColumn(BUCKET_COL, bucket_of(F.col("id"), 4))
    cat.overwrite("t", base, partition_by=BUCKET_COL)

    def bucket_files():
        out = {}
        for man_dir in ({e if isinstance(e, str) else e["root"]
                         for e in cat._manifest("t", cat.current_snapshot("t"))["dirs"]}):
            for p in glob.glob(os.path.join(man_dir, f"{BUCKET_COL}=*", "*.parquet")):
                b = int(p.split(f"{BUCKET_COL}=")[1].split(os.sep)[0])
                with open(p, "rb") as f:
                    out.setdefault(b, []).append((p, hashlib.md5(f.read()).hexdigest()))
        return out

    before = bucket_files()
    # one update row -> exactly one touched bucket
    upd = spark.createDataFrame([("k1", "V1-new")], "id string, v string").withColumn(
        BUCKET_COL, bucket_of(F.col("id"), 4)
    )
    touched = upd.collect()[0][BUCKET_COL]
    snap = cat.merge_upsert("t", upd, "id", partition_by=BUCKET_COL)
    assert cat._manifest("t", snap)["op"] == "merge-delta"
    after = bucket_files()
    for b in before:
        if b == touched:
            assert sorted(after[b]) != sorted(before[b])  # rewritten
        else:
            assert sorted(after[b]) == sorted(before[b])  # same paths+bytes
    # semantics unchanged
    rows = {r["id"]: r["v"] for r in cat.read("t").collect()}
    assert rows["k1"] == "V1-new" and rows["k0"] == "v0" and len(rows) == 40
    # rollback across a delta manifest still works
    cat.rollback("t", 1)
    assert {r["v"] for r in cat.read("t").filter("id='k1'").collect()} == {"v1"}


def test_catalog_bucket_delta_appends_then_merge(spark, tmp_path):
    """Delta merge over a multi-root history (overwrite + appends), plus
    fallback to full rewrite when a root is unbucketed."""
    from pyspark.sql import functions as F

    from gocrawler_spark.tables.catalog import BUCKET_COL, bucket_of

    def bk(df):
        return df.withColumn(BUCKET_COL, bucket_of(F.col("id"), 4))

    cat = SnapshotCatalog(str(tmp_path / "a"), spark)
    cat.overwrite("t", bk(spark.createDataFrame([("a", 1), ("b", 2)], "id string, n int")),
                  partition_by=BUCKET_COL)
    cat.append("t", bk(spark.createDataFrame([("c", 3), ("d", 4)], "id string, n int")),
               partition_by=BUCKET_COL)
    cat.merge_upsert("t", bk(spark.createDataFrame([("c", 30), ("e", 50)], "id string, n int")),
                     "id", partition_by=BUCKET_COL)
    rows = {r["id"]: r["n"] for r in cat.read("t").collect()}
    assert rows == {"a": 1, "b": 2, "c": 30, "d": 4, "e": 50}

    # unbucketed history -> silent fallback to the full-rewrite merge
    cat2 = SnapshotCatalog(str(tmp_path / "b"), spark)
    cat2.overwrite("t", spark.createDataFrame([("a", 1)], "id string, n int"))
    cat2.merge_upsert("t", bk(spark.createDataFrame([("a", 10)], "id string, n int")),
                      "id", partition_by=BUCKET_COL)
    assert {r["n"] for r in cat2.read("t").collect()} == {10}


def test_rlike_matches_python_re_on_admission_patterns(spark):
    """java_safe profiles evaluate F2 via Java rlike; pin Java == RE2/Python
    on the admission patterns over corpus + adversarial URLs."""
    from gocrawler_spark.datagen import crawl_corpus
    from gocrawler_spark.profiles import MIXUP, synthetic_profile

    pages, seeds, robots, hosts, sprof = crawl_corpus(150, 10)
    urls = [p["url"] for p in pages] + [
        "https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=194397052312",
        "https://www.mixup.com.mx/Mixup/Categoria.aspx?pg=2",
        "https://shop000.example/Mixup/detproducto.aspx?sku=badsku",
        "https://shop000.example/Mixup/Productos.aspx?etq=x&pg=9",
        "https://shop000.example/other/page.html",
        "https://evil.example/Mixup/Home.aspx",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    import pyspark.sql.functions as F

    for prof in (MIXUP, sprof):
        assert prof.java_safe
        for pat in (prof.link_extraction_query, prof.link_product_query):
            got = {r["url"]: r["m"] for r in df.withColumn("m", F.col("url").rlike(pat)).collect()}
            rx = __import__("re").compile(pat)
            for u in urls:
                assert got[u] == bool(rx.search(u)), (pat, u)


def test_sharded_bloom_matches_unsharded(spark):
    from gocrawler_spark.operators.bloom import bloom_prefilter, build_bloom_sharded

    urls = [(f"https://h{i % 9}.example/q{i}",) for i in range(4000)]
    df = spark.createDataFrame(urls, "url string").repartition(5)
    bloom = build_bloom_sharded(df, "url", n_bits=1 << 16, n_hashes=4, n_shards=8)
    flagged = bloom_prefilter(df, "url", bloom)
    # no false negatives through the sharded index math
    assert flagged.filter("not maybe_seen").count() == 0
    other = spark.createDataFrame(
        [(f"https://x{i}.example/n{i}",) for i in range(2000)], "url string"
    )
    import pyspark.sql.functions as F
    fp = bloom_prefilter(other, "url", bloom).filter(F.col("maybe_seen")).count()
    assert fp / 2000 < 0.2


def test_cuckoo_filter(spark):
    import numpy as np

    from gocrawler_spark.operators.cuckoo import (
        CuckooShard,
        build_cuckoo_sharded,
        cuckoo_prefilter,
    )

    # single-shard semantics: insert -> contains -> delete -> gone
    sh = CuckooShard(1 << 10)
    keys = [int(x) for x in np.random.RandomState(1).randint(1, 2**62, 500)]
    assert all(sh.insert(k) for k in keys)
    assert sh.contains_many(np.array(keys, dtype=np.uint64)).all()
    assert sh.delete(keys[0])
    assert not sh.contains_many(np.array([keys[0]], dtype=np.uint64))[0] or True
    # (fp collision may keep it 'present' — deletion only guarantees one
    # matching fingerprint slot is cleared; definite-negative unaffected)

    # distributed sharded build: no false negatives
    urls = [(f"https://h{i % 5}.example/c{i}",) for i in range(6000)]
    df = spark.createDataFrame(urls, "url string").repartition(6)
    f = build_cuckoo_sharded(df, "url", n_keys_hint=6000, n_shards=8)
    flagged = cuckoo_prefilter(df, "url", f)
    assert flagged.filter("not maybe_seen").count() == 0
    other = spark.createDataFrame(
        [(f"https://z{i}.example/n{i}",) for i in range(3000)], "url string"
    )
    import pyspark.sql.functions as F
    fp = cuckoo_prefilter(other, "url", f).filter(F.col("maybe_seen")).count()
    assert fp / 3000 < 0.05  # 16-bit fingerprints -> tiny fp rate


def test_warc_source_roundtrip(spark, tmp_path):
    """WARC fixture -> distributed read -> pages shape; non-response and
    malformed records dropped; html bytes and timestamps preserved."""
    from gocrawler_spark.sources.warc import read_warc, warc_bytes

    records = [
        {"url": "https://a.example/p1", "html": "<html><body>uno</body></html>",
         "warc_date": "2021-03-04T05:06:07Z"},
        {"url": "https://a.example/robots.txt", "html": "User-agent: *",
         "warc_type": "request"},  # dropped: not a response
        {"url": "https://b.example/p2", "html": "<html>dos</html>",
         "status": 404, "mime": "text/html; charset=utf-8"},
        {"url": "https://c.example/p3", "html": "<html>tres</html>",
         "warc_date": "not-a-timestamp"},  # corrupt date: row kept, ts null
    ]
    p = tmp_path / "crawl.warc"
    p.write_bytes(warc_bytes(records) + b"WARC/1.0\r\nbroken-no-blank-line")
    df = read_warc(spark, str(p))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {
        "https://a.example/p1", "https://b.example/p2", "https://c.example/p3"
    }
    # ANSI would throw in to_timestamp on the corrupt date; the reader
    # must instead null the ts and keep the record (external-file input)
    assert rows["https://c.example/p3"]["warc_ts"] is None
    r1 = rows["https://a.example/p1"]
    assert bytes(r1["html"]) == b"<html><body>uno</body></html>"
    assert r1["warc_ts"].isoformat().startswith("2021-03-04T05:06:07")
    assert r1["http_status"] == 200 and r1["mime"] == "text/html"
    assert rows["https://b.example/p2"]["http_status"] == 404


def test_warc_binary_gzip_members(spark, tmp_path):
    """read_warc_binary: per-member gzip framing (Common Crawl's shape)
    reads byte-exact; whole-stream gzip and uncompressed too."""
    import gzip

    from gocrawler_spark.sources.warc import read_warc_binary, warc_bytes

    records = [
        {"url": "https://a.example/p1", "html": "<html><body>uno</body></html>",
         "warc_date": "2021-03-04T05:06:07Z"},
        {"url": "https://b.example/p2", "html": "<html>dos</html>",
         "status": 404, "mime": "text/html; charset=utf-8"},
    ]
    # per-member gzip: one gzip member per record, concatenated
    members = b"".join(gzip.compress(warc_bytes([r])) for r in records)
    (tmp_path / "cc.warc.gz").write_bytes(members)
    # whole-stream gzip in a second file: both parse identically
    (tmp_path / "stream.warc.gz").write_bytes(gzip.compress(warc_bytes(records)))
    df = read_warc_binary(spark, str(tmp_path / "*.warc.gz"))
    rows = df.collect()
    assert len(rows) == 4  # 2 files x 2 records
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    assert bytes(by_url["https://a.example/p1"][0]["html"]) == b"<html><body>uno</body></html>"
    assert by_url["https://a.example/p1"][0]["warc_ts"].isoformat().startswith("2021-03-04T05:06:07")
    assert by_url["https://b.example/p2"][0]["http_status"] == 404


def test_warc_binary_embedded_marker(spark, tmp_path):
    """A body containing the literal record marker WARC/1.0\\r\\n must
    survive byte-exact — Content-Length framing, not marker splitting
    (the documented failure mode of the lineSep reader)."""
    from gocrawler_spark.sources.warc import read_warc_binary, warc_bytes

    evil_body = "<html>before\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nafter</html>"
    records = [
        {"url": "https://evil.example/p", "html": evil_body},
        {"url": "https://next.example/q", "html": "<html>next</html>"},
    ]
    p = tmp_path / "evil.warc"
    p.write_bytes(warc_bytes(records))
    rows = {r["url"]: r for r in read_warc_binary(spark, str(p)).collect()}
    assert set(rows) == {"https://evil.example/p", "https://next.example/q"}
    assert bytes(rows["https://evil.example/p"]["html"]) == evil_body.encode()
    assert bytes(rows["https://next.example/q"]["html"]) == b"<html>next</html>"


def test_warc_binary_mixed_record_types(spark, tmp_path):
    """VERDICT r3 #7: real WARCs interleave warcinfo / request /
    metadata records with responses; non-response records must be
    skipped WITHOUT desyncing the Content-Length framing — including a
    metadata block that embeds a fake record marker."""
    import gzip

    from gocrawler_spark.sources.warc import read_warc_binary

    def raw_record(wtype: str, url: str | None, block: bytes) -> bytes:
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            + (f"WARC-Target-URI: {url}\r\n" if url else "")
            + "WARC-Date: 2021-01-01T00:00:00Z\r\n"
            + f"Content-Length: {len(block)}\r\n\r\n"
        )
        return head.encode() + block + b"\r\n\r\n"

    def response_block(body: bytes) -> bytes:
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )

    recs = [
        raw_record("warcinfo", None, b"software: fixture-writer 0.1\r\nformat: WARC/1.0\r\n"),
        raw_record("request", "https://a.example/p",
                   b"GET /p HTTP/1.1\r\nHost: a.example\r\n\r\n"),
        raw_record("response", "https://a.example/p", response_block(b"<html>A</html>")),
        # metadata block embedding a fake marker: must not resync here
        raw_record("metadata", "https://a.example/p",
                   b"via: sitemap\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\ntrap"),
        raw_record("response", "https://b.example/q", response_block(b"<html>B</html>")),
        raw_record("request", "https://c.example/r",
                   b"GET /r HTTP/1.1\r\nHost: c.example\r\n\r\n"),
    ]
    stream = b"".join(recs)

    p = tmp_path / "mixed.warc"
    p.write_bytes(stream)
    rows = {r["url"]: r for r in read_warc_binary(spark, str(p)).collect()}
    assert set(rows) == {"https://a.example/p", "https://b.example/q"}
    assert bytes(rows["https://a.example/p"]["html"]) == b"<html>A</html>"
    assert bytes(rows["https://b.example/q"]["html"]) == b"<html>B</html>"

    # Common Crawl framing of the same stream: one gzip member per record
    pg = tmp_path / "mixed.warc.gz"
    pg.write_bytes(b"".join(gzip.compress(r) for r in recs))
    rows_gz = {r["url"]: bytes(r["html"]) for r in read_warc_binary(spark, str(pg)).collect()}
    assert rows_gz == {
        "https://a.example/p": b"<html>A</html>",
        "https://b.example/q": b"<html>B</html>",
    }


def test_catalog_local_rows_and_sized_appends(spark, tmp_path):
    """Round-4 commit-path hygiene: (a) driver-local control-plane rows
    (checkpoints) written via pyarrow read back bit-identically to the
    Spark-written form, interleave with Spark appends, and survive
    rollback; (b) an `n_rows`-hinted append writes ceil(n/ROWS_PER_FILE)
    files, not one per upstream partition."""
    import glob
    import os

    from pyspark.sql import functions as F

    from gocrawler_spark.tables.catalog import SnapshotCatalog

    cat = SnapshotCatalog(str(tmp_path / "wh"), spark)
    ddl = "run_id string, round int, snapshots string, metrics string"
    cat.append_local_rows("checkpoints", [("r1", 1, "{}", "{}")], ddl)
    snap1 = cat.current_snapshot("checkpoints")
    # a Spark-written append on top of a pyarrow-written one
    cat.append(
        "checkpoints",
        spark.createDataFrame([("r1", 2, '{"seen": 4}', '{"n": 7}')], ddl),
    )
    cat.append_local_rows("checkpoints", [("r1", 3, "{}", '{"n": 9}')], ddl)
    df = cat.read("checkpoints")
    assert df.schema.simpleString() == (
        "struct<run_id:string,round:int,snapshots:string,metrics:string>"
    )
    assert {(r["round"], r["metrics"]) for r in df.collect()} == {
        (1, "{}"), (2, '{"n": 7}'), (3, '{"n": 9}'),
    }
    cat.rollback("checkpoints", snap1)
    assert cat.read("checkpoints").count() == 1

    # (b) sized append: 64 upstream partitions, 100 rows -> 1 file
    wide = spark.range(100).repartition(64).selectExpr("cast(id as string) url")
    cat.append("log", wide, n_rows=100)
    files = glob.glob(os.path.join(cat.base, "log", "data", "*", "*.parquet"))
    assert len(files) == 1
    assert cat.read("log").count() == 100


def test_bucketed_colocated_anti_join(spark, tmp_path):
    """Equal bucket specs on both sides -> the seen anti-join plans with
    NO hashpartitioning Exchange (the parquet stand-in for Iceberg's
    storage-partitioned join)."""
    from gocrawler_spark.tables.bucketed import colocated_anti_join, write_bucketed

    cand = spark.createDataFrame(
        [(f"h{i:04d}", i) for i in range(500)], "url_hash string, doc_id long"
    )
    seen = spark.createDataFrame(
        [(f"h{i:04d}",) for i in range(0, 500, 2)], "url_hash string"
    )
    write_bucketed(cand, "t_cand_bkt", path=str(tmp_path / "cand"))
    write_bucketed(seen, "t_seen_bkt", path=str(tmp_path / "seen"))
    try:
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = colocated_anti_join(spark, "t_cand_bkt", "t_seen_bkt")
            rows = {r["doc_id"] for r in out.collect()}
            assert rows == set(range(1, 500, 2))
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "hashpartitioning" not in plan, plan[:2000]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cand_bkt")
        spark.sql("DROP TABLE IF EXISTS t_seen_bkt")


def test_catalog_fallback_merge_with_bucket_selecting_when_matched(spark, tmp_path):
    """Unbucketed history + a when_matched that selects the bucket
    column from the update side (the items-table shape) must fall back
    to a full rewrite without an unresolved-column crash."""
    from pyspark.sql import functions as F

    from gocrawler_spark.tables.catalog import BUCKET_COL, bucket_of

    cat = SnapshotCatalog(str(tmp_path), spark)
    # legacy table: no bucket column on disk
    cat.overwrite("t", spark.createDataFrame([("a", 1), ("b", 2)], "id string, n int"))
    upd = spark.createDataFrame([("a", 10), ("c", 30)], "id string, n int").withColumn(
        BUCKET_COL, bucket_of(F.col("id"), 4)
    )

    def when_matched(old, new):
        # selects BUCKET_COL from the update side, like _commit_items
        return new.select("id", (F.col("n") + 100).alias("n"), BUCKET_COL)

    cat.merge_upsert("t", upd, "id", when_matched=when_matched, partition_by=BUCKET_COL)
    rows = {r["id"]: r["n"] for r in cat.read("t").collect()}
    assert rows == {"a": 110, "b": 2, "c": 130}
    assert BUCKET_COL not in cat.read("t").columns  # stayed unbucketed


def test_host_extraction_matches_parse_url(spark):
    """The substring_index host fast path must agree with parse_url(HOST)
    on adversarial URL shapes (ports, userinfo, no scheme, fragments)."""
    from pyspark.sql import functions as F

    from gocrawler_spark.operators.frontier import _host_of

    urls = [
        "https://shop001.example/Mixup/Home.aspx",
        "https://h.example:8080/p?q=1",
        "https://user:pw@h.example:8080/p",
        "http://h.example",
        "https://h.example/",
        "https://h.example#frag",
        "not-a-url",
        "mailto:x@y.example",
        "https://h.example/a//b//c",
        "ftp://h.example/x",
        "//h.example/protocol-relative",
        "",
        "https://[::1]:8080/x",
        "https://[2001:db8::7]/p?q=1",
        "https://user@[::1]:443/p",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        _host_of(F.col("url")).alias("fast"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("ref"),
    ).collect()
    for r in rows:
        assert r["fast"] == r["ref"], (r["url"], r["fast"], r["ref"])


def test_normalize_tolerates_rfc_invalid_urls(spark):
    """Real pages emit hrefs that absolutize into RFC-invalid URLs
    (embedded spaces, '#a#b' double fragments). Under ANSI (Spark 4
    default) the throwing parse_url would kill the whole stage on one
    such row; normalize_candidates must instead degrade that row
    gracefully (path '' / best-effort host) and keep the batch alive.
    Go's net/url (the reference's colly request path) tolerates these."""
    from pyspark.sql import functions as F

    from gocrawler_spark.operators.frontier import normalize_candidates

    urls = [
        "https://h.example/a?b?c#d#e",       # '#' in fragment -> invalid URI
        "https://h.example/path with space",  # raw space -> invalid URI
        "https://shop001.example/Mixup/detproducto.aspx?sku=123",  # valid
    ]
    df = spark.createDataFrame(
        [(u, 1, 0) for u in urls], "url string, depth int, priority int"
    )
    rows = {
        r["url"]: r
        for r in normalize_candidates(df).select("url", "url_hash", "host", "path").collect()
    }
    assert len(rows) == 3  # no row lost, no stage failure
    # invalid URLs: null-tolerant path (''), host still extracted
    assert rows["https://h.example/a?b?c#d#e"]["path"] == ""
    assert rows["https://h.example/a?b?c#d#e"]["host"] == "h.example"
    assert rows["https://h.example/path with space"]["path"] == ""
    # the valid row keeps full parse semantics
    good = rows["https://shop001.example/Mixup/detproducto.aspx?sku=123"]
    assert good["path"] == "/Mixup/detproducto.aspx"
    assert good["host"] == "shop001.example"
    assert good["url_hash"] is not None


def test_warc_sink_roundtrip(spark, tmp_path):
    """write_warc -> read_warc_binary roundtrips pages byte-exactly:
    gzip-member and uncompressed segments, one file per partition,
    executor-side writes, empty partitions emit no file."""
    from gocrawler_spark.sources.warc import read_warc_binary, write_warc

    rows = [
        (
            f"https://s{i % 3}.example/p{i}",
            f"2021-06-0{1 + i % 5}T01:02:03Z",
            f"<html><body>pg {i} WARC/1.0\r\n embedded marker</body></html>".encode(),
            200 if i % 4 else 404,
            "text/html; charset=utf-8",
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "url string, ts string, html binary, http_status int, mime string"
    ).selectExpr(
        "url", "to_timestamp(ts, \"yyyy-MM-dd'T'HH:mm:ss'Z'\") as warc_ts",
        "html", "http_status", "mime"
    )
    out = tmp_path / "segments"
    out.mkdir()
    # 5 partitions over 30 rows + 3 forced-empty partitions
    manifest = write_warc(df.repartition(8), str(out)).collect()
    import os

    files = sorted(os.listdir(out))
    assert [m["path"].split("/")[-1] for m in sorted(manifest, key=lambda m: m["path"])] == files
    assert sum(m["n_records"] for m in manifest) == 30
    assert all(f.endswith(".warc.gz") for f in files)
    back = read_warc_binary(spark, str(out / "*.warc.gz"))
    got = {r["url"]: r for r in back.collect()}
    assert len(got) == 30
    for url, ts, html, status, mime in rows:
        r = got[url]
        assert bytes(r["html"]) == html
        assert r["http_status"] == status
        assert r["mime"] == mime
        assert r["warc_ts"].isoformat().startswith(ts[:19])
    # uncompressed variant roundtrips too and is deterministic
    out2 = tmp_path / "plain"
    out2.mkdir()
    m2 = write_warc(df.repartition(2), str(out2), gzip_members=False).collect()
    assert sum(m["n_records"] for m in m2) == 30
    assert read_warc_binary(spark, str(out2 / "*.warc")).count() == 30


def test_wet_sink_roundtrip(spark, tmp_path):
    """write_wet -> read_wet_binary roundtrips extracted text exactly
    (incl. unicode and embedded WARC/1.0 markers); a mixed stream of
    response + conversion records splits cleanly between
    read_warc_binary (responses only) and read_wet_binary (conversions
    only) without desync."""
    from gocrawler_spark.sources.warc import (
        read_warc_binary,
        read_wet_binary,
        write_warc,
        write_wet,
    )

    rows = [
        (
            f"https://s{i % 3}.example/p{i}",
            f"2021-06-0{1 + i % 5}T01:02:03Z",
            f"doc {i} — unicode é∂ and a fake\r\nWARC/1.0\r\nmarker inside",
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "url string, ts string, text string").selectExpr(
        "url", "to_timestamp(ts, \"yyyy-MM-dd'T'HH:mm:ss'Z'\") as warc_ts", "text"
    )
    out = tmp_path / "wet"
    out.mkdir()
    manifest = write_wet(df.repartition(4), str(out)).collect()
    assert sum(m["n_records"] for m in manifest) == 20
    import os

    assert all(f.endswith(".warc.wet.gz") for f in os.listdir(out))
    back = read_wet_binary(spark, str(out / "*.warc.wet.gz"))
    got = {r["url"]: r for r in back.collect()}
    assert len(got) == 20
    for url, ts, text in rows:
        assert got[url]["text"] == text
        assert got[url]["n_chars"] == len(text)
        assert got[url]["warc_ts"].isoformat().startswith(ts[:19])
    # determinism: same input -> byte-identical segments
    out2 = tmp_path / "wet2"
    out2.mkdir()
    write_wet(df.repartition(4), str(out2)).collect()
    b1 = b"".join((out / f).read_bytes() for f in sorted(os.listdir(out)))
    b2 = b"".join((out2 / f).read_bytes() for f in sorted(os.listdir(out2)))
    assert b1 == b2
    # mixed-type stream: append a WARC response segment into the same
    # dir; each reader sees only its record type
    pages = spark.createDataFrame(
        [(u, f"<html>{u}</html>".encode()) for u, _, _ in rows[:7]],
        "url string, html binary",
    )
    write_warc(pages.repartition(1), str(out), prefix="resp").collect()
    both = str(out / "*")
    assert read_wet_binary(spark, both).count() == 20
    assert read_warc_binary(spark, both).count() == 7


def test_wat_sink_roundtrip(spark, tmp_path):
    """write_wat -> read_wat_binary roundtrips page metadata (title +
    links incl. empty/null cases) through the CC JSON envelope; WAT
    metadata records are invisible to the WARC and WET readers."""
    from gocrawler_spark.sources.warc import (
        read_warc_binary,
        read_wat_binary,
        read_wet_binary,
        write_wat,
    )

    rows = [
        ("https://a.example/0", "2021-06-01T01:02:03Z", "Page «0»",
         ["https://a.example/1", "https://b.example/x?a=1&b=2"]),
        ("https://a.example/1", "2021-06-02T01:02:03Z", None, []),
        ("https://b.example/2", "2021-06-03T01:02:03Z", 'quote " title', None),
    ] + [
        (f"https://c.example/{i}", "2021-06-04T01:02:03Z", f"t{i}",
         [f"https://c.example/{i + 1}"])
        for i in range(3, 20)
    ]
    df = spark.createDataFrame(
        rows, "url string, ts string, title string, links array<string>"
    ).selectExpr(
        "url", "to_timestamp(ts, \"yyyy-MM-dd'T'HH:mm:ss'Z'\") as warc_ts",
        "title", "links"
    )
    out = tmp_path / "wat"
    out.mkdir()
    manifest = write_wat(df.repartition(3), str(out)).collect()
    assert sum(m["n_records"] for m in manifest) == 20
    back = read_wat_binary(spark, str(out / "*.warc.wat.gz"))
    got = {r["url"]: r for r in back.collect()}
    assert len(got) == 20
    for url, ts, title, links in rows:
        r = got[url]
        assert r["title"] == title
        assert list(r["links"]) == (links or [])
        assert r["n_links"] == len(links or [])
        assert r["warc_ts"].isoformat().startswith(ts[:19])
    # metadata records don't leak into the response/conversion readers
    assert read_warc_binary(spark, str(out / "*")).count() == 0
    assert read_wet_binary(spark, str(out / "*")).count() == 0
