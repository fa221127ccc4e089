"""BM25 retrieval: hand-computed scores, ranking semantics, and a
DuckDB cross-engine twin of the full pipeline (the same recipe the gate
oracle uses)."""

import math

import pytest

from gocrawler_spark.operators.retrieval import bm25_topk, build_bm25_index

DOCS = [
    (0, "fast table scan fast"),
    (1, "table join join join"),
    (2, "window merge batch"),
    (3, "fast merge"),
    (4, ""),  # empty doc: never indexed, never retrieved
]


def _bm25_py(corpus, query_terms, k1=1.2, b=0.75):
    """Independent plain-Python BM25 (Lucene idf) for expected values."""
    toks = {d: t.lower().split() for d, t in corpus}
    dls = {d: len(t) for d, t in toks.items() if t}
    n, avgdl = len(dls), sum(dls.values()) / len(dls)
    scores = {}
    for t in set(query_terms):
        df = sum(1 for tt in toks.values() if t in tt)
        if not df:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, tt in toks.items():
            tf = tt.count(t)
            if tf:
                denom = tf + k1 * (1 - b + b * dls[d] / avgdl)
                scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / denom
    return {d: round(s, 6) for d, s in scores.items()}


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_bm25_index(docs)


def test_index_shape(index):
    # doc 4 is empty: excluded from postings, doclens and the scalars
    assert index.n_docs == 4
    assert index.avgdl == pytest.approx((4 + 4 + 3 + 2) / 4)
    post = {(r["term"], r["doc"]): (r["tf"], r["dl"]) for r in index.postings.collect()}
    assert post[("fast", 0)] == (2, 4)
    assert post[("join", 1)] == (3, 4)
    assert ("", 4) not in post and not any(d == 4 for _, d in post)
    df = {r["term"]: r["df"] for r in index.docfreq.collect()}
    assert df["fast"] == 2 and df["table"] == 2 and df["join"] == 1


def test_scores_match_independent_reference(spark, index):
    queries = spark.createDataFrame(
        [(10, "fast join"), (11, "merge"), (12, "fast fast")],
        "query_id long, query_text string",
    )
    got = {
        (r["query_id"], r["doc"]): r["score6"]
        for r in bm25_topk(index, queries, k=10).collect()
    }
    for qid, terms in ((10, ["fast", "join"]), (11, ["merge"]), (12, ["fast"])):
        exp = _bm25_py(DOCS, terms)
        mine = {d: s for (q, d), s in got.items() if q == qid}
        assert mine == pytest.approx(exp, abs=2e-6), (qid, mine, exp)
    # duplicate query terms contribute once: q12 == q10's fast-only part
    assert got[(12, 0)] == pytest.approx(_bm25_py(DOCS, ["fast"])[0], abs=2e-6)


def test_topk_rank_and_ties(spark, index):
    queries = spark.createDataFrame([(1, "fast join")], "query_id long, query_text string")
    rows = bm25_topk(index, queries, k=2).orderBy("rn").collect()
    assert [r["rn"] for r in rows] == [1, 2]
    assert rows[0]["score6"] >= rows[1]["score6"]
    # k bounds the result set
    assert bm25_topk(index, queries, k=1).count() == 1
    # out-of-vocabulary query matches nothing
    oov = spark.createDataFrame([(2, "zzz qqq")], "query_id long, query_text string")
    assert bm25_topk(index, oov, k=3).count() == 0
    with pytest.raises(ValueError):
        bm25_topk(index, queries, k=0)


def test_persisted_index_roundtrip_and_bucket_pruning(spark, tmp_path, index):
    """write_bm25_index / read_bm25_index: same ranked results from the
    catalog-backed index, and a query-terms read prunes the postings
    scan to the terms' bucket partitions (PartitionFilters, not a
    post-scan filter)."""
    from gocrawler_spark.operators.retrieval import (
        read_bm25_index, write_bm25_index,
    )
    from gocrawler_spark.tables.catalog import SnapshotCatalog

    cat = SnapshotCatalog(str(tmp_path), spark)
    write_bm25_index(cat, index, name="ix", n_buckets=8)
    queries = spark.createDataFrame(
        [(1, "fast join"), (2, "merge")], "query_id long, query_text string"
    )
    expect = sorted(map(tuple, bm25_topk(index, queries, k=10).collect()))

    loaded = read_bm25_index(cat, name="ix")
    assert loaded.n_docs == index.n_docs
    assert loaded.avgdl == pytest.approx(index.avgdl)
    got = sorted(map(tuple, bm25_topk(loaded, queries, k=10).collect()))
    assert got == expect

    pruned = read_bm25_index(cat, name="ix", query_terms=["fast", "join", "merge"])
    got_pruned = sorted(map(tuple, bm25_topk(pruned, queries, k=10).collect()))
    assert got_pruned == expect
    plan = pruned.postings._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket#" in plan
    # the pruned scan reads a strict subset of the postings rows (the
    # corpus has more terms than the query's three, spread over 8 buckets)
    n_all = cat.read("ix_postings").count()
    n_pruned = pruned.postings.count()
    assert 0 < n_pruned < n_all


def test_incremental_append_equals_scratch_rebuild(spark, tmp_path):
    """append_bm25_index over per-round doc batches must rank exactly
    like an index built from scratch over the union — df, n_docs and
    avgdl all re-derived from the postings table, never a corpus
    re-scan."""
    from gocrawler_spark.operators.retrieval import (
        append_bm25_index, read_bm25_index, write_bm25_index,
    )
    from gocrawler_spark.tables.catalog import SnapshotCatalog

    batch1 = DOCS[:3]
    batch2 = [(10, "join fast fast window"), (11, "scan scan table")]
    d1 = spark.createDataFrame(batch1, "doc_id long, text string")
    d2 = spark.createDataFrame(batch2, "doc_id long, text string")
    cat = SnapshotCatalog(str(tmp_path), spark)
    write_bm25_index(cat, build_bm25_index(d1), name="ix", n_buckets=8)
    append_bm25_index(cat, d2, name="ix")

    queries = spark.createDataFrame(
        [(1, "fast join"), (2, "table scan")], "query_id long, query_text string"
    )
    got = sorted(map(tuple, bm25_topk(read_bm25_index(cat, "ix"), queries, k=10).collect()))
    scratch = build_bm25_index(d1.unionByName(d2))
    expect = sorted(map(tuple, bm25_topk(scratch, queries, k=10).collect()))
    assert got == expect
    # pruned read over the appended (multi-spray) table still correct
    pruned = read_bm25_index(cat, "ix", query_terms=["fast", "join", "table", "scan"])
    assert sorted(map(tuple, bm25_topk(pruned, queries, k=10).collect())) == expect


def test_duckdb_twin_full_pipeline(spark):
    """The whole index+score+rank pipeline replayed in DuckDB on the
    sf0.001 documents table — same recipe as the gate oracle (rounded
    scores make ranks engine-stable)."""
    duckdb = pytest.importorskip("duckdb")
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    queries = spark.createDataFrame(
        [(0, "fast table scan"), (1, "window merge batch"), (2, "spark join")],
        "query_id long, query_text string",
    )
    got = sorted(
        (r["query_id"], r["doc"], r["score6"], r["dl"], r["rn"])
        for r in bm25_topk(build_bm25_index(docs), queries, k=5).collect()
    )
    qsql = (
        "SELECT * FROM (VALUES (0, 'fast table scan'), (1, 'window merge batch'), "
        "(2, 'spark join')) AS q(query_id, query_text)"
    )
    sql = f"""
WITH tok AS (
  SELECT doc_id AS doc, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
  FROM '{sf}/documents.parquet'),
post AS (SELECT term, doc, count(*) AS tf FROM tok GROUP BY 1, 2),
dls AS (SELECT doc, sum(tf) AS dl FROM post GROUP BY 1),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dls),
dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
qt AS (SELECT DISTINCT query_id, unnest(list_filter(string_split_regex(lower(query_text), '\\s+'), x -> x <> '')) AS term
  FROM ({qsql})),
qi AS (SELECT query_id, term, ln(1.0 + (n - df + 0.5) / (df + 0.5)) AS idf FROM qt JOIN dfreq USING (term), stats),
sc AS (SELECT query_id, doc, dl, round(sum(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS score6
  FROM post JOIN dls USING (doc) JOIN qi USING (term), stats GROUP BY 1, 2, 3)
SELECT query_id, doc, score6, dl, rn FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score6 DESC, doc) AS rn FROM sc) WHERE rn <= 5
"""
    exp = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert len(got) == len(exp) > 0
    for g, e in zip(got, exp):
        assert g[:2] == e[:2] and g[3:] == e[3:]
        assert g[2] == pytest.approx(e[2], abs=2e-6)
