"""Token-budget packing vs a DuckDB single-window twin (same md5 order
computed by an independent engine) + invariants and plan shape."""

import duckdb
import pytest

from gocrawler_spark.operators.pack import pack_token_budget


def _docs(spark, n=400):
    rows = [
        (i, " ".join(f"w{j}" for j in range((i * 7) % 23)))  # 0..22 tokens
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_matches_duckdb_twin(spark):
    docs = _docs(spark)
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["shard_id"])
        for r in pack_token_budget(docs, budget=100, seed="s").collect()
    }
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        """
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                 md5(CAST(doc_id AS VARCHAR) || ':' || 's') AS ord
          FROM docs
        )
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (ORDER BY ord, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
        FROM t
        """
    ).fetchall()
    assert len(want) == len(got)
    for doc_id, n_tokens, start in want:
        g = got[doc_id]
        assert g == (n_tokens, start, start // 100), doc_id
    # offsets tile the stream exactly: total tokens = max(start+n)
    total = sum(n for n, _, _ in got.values())
    assert total == max(s + n for n, s, _ in got.values())


def test_pack_invariants_and_plan(spark):
    docs = _docs(spark, n=150)
    out = pack_token_budget(docs, budget=64)
    rows = out.collect()
    # repartition-invariant (deterministic order is content-derived)
    rows2 = pack_token_budget(docs.repartition(7, "text"), budget=64).collect()
    key = lambda rs: sorted((r["doc_id"], r["start_offset"]) for r in rs)
    assert key(rows) == key(rows2)
    # crosses_boundary consistent with offsets
    for r in rows:
        crosses = r["n_tokens"] > 0 and (r["start_offset"] % 64) + r["n_tokens"] > 64
        assert r["crosses_boundary"] == crosses
    # per-shard token mass never exceeds budget + max_doc (straddle only)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r)
    max_doc = max(r["n_tokens"] for r in rows)
    for sid, rs in by_shard.items():
        started = sum(r["n_tokens"] for r in rs)
        assert started <= 64 + max_doc
    # distributed shape: no single-partition global window over the DATA
    # (the only Window.orderBy-without-partition runs on 256 group rows),
    # and everything stays JVM-side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    with pytest.raises(ValueError):
        pack_token_budget(docs, budget=0)


def test_pack_precomputed_token_col_and_seed(spark):
    docs = spark.createDataFrame(
        [(1, "ignored", 10), (2, "ignored", 20), (3, "ignored", 0)],
        "doc_id long, text string, bpe long",
    )
    rows = {
        r["doc_id"]: r
        for r in pack_token_budget(docs, budget=16, token_col="bpe").collect()
    }
    assert {r["n_tokens"] for r in rows.values()} == {10, 20, 0}
    assert not rows[3]["crosses_boundary"]  # zero-token doc never crosses
    a = {r["doc_id"]: r["start_offset"] for r in pack_token_budget(docs, budget=16, seed="a").collect()}
    b = {r["doc_id"]: r["start_offset"] for r in pack_token_budget(docs, budget=16, seed="b").collect()}
    assert a != b  # seed re-mixes the stream order
