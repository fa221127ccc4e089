"""Link-graph analytics: host graph construction + PageRank vs an
independent driver-side power-iteration reference."""

from collections import defaultdict

import pytest

from gocrawler_spark.operators.graph import host_link_graph, pagerank


def _ref_pagerank(edges, damping=0.85, iters=200):
    """Plain-Python power iteration, written independently of the Spark
    operator (dict arithmetic, no shared helpers)."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out_w = defaultdict(float)
    for s, _, w in edges:
        out_w[s] += w
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if out_w[v] == 0.0)
        new = {v: (1.0 - damping) / n + damping * dangling / n for v in nodes}
        for s, d, w in edges:
            new[d] += damping * r[s] * w / out_w[s]
        r = new
    return r


def test_host_link_graph_weights_and_self_loops(spark):
    links = spark.createDataFrame(
        [
            ("a.com", "b.com"),
            ("a.com", "b.com"),
            ("a.com", "a.com"),  # self-loop dropped
            ("b.com", "c.com"),
            (None, "c.com"),  # null src dropped
            ("c.com", None),  # null dst dropped
        ],
        "src_host string, dst_host string",
    )
    got = {(r["src"], r["dst"]): r["weight"] for r in host_link_graph(links).collect()}
    assert got == {("a.com", "b.com"): 2, ("b.com", "c.com"): 1}


def test_pagerank_matches_reference(spark):
    # hub, 2-cycle, dangling sink, weighted edges, disconnected pair
    edges = [
        ("hub", "a", 1.0),
        ("hub", "b", 3.0),
        ("hub", "c", 1.0),
        ("a", "hub", 1.0),
        ("b", "hub", 1.0),
        ("c", "sink", 2.0),  # sink has no out-edges: dangling
        ("x", "y", 1.0),  # disconnected component
        ("y", "x", 1.0),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    # tol=1e-7 L1 -> fixpoint error <= tol*d/(1-d) ~ 5.7e-7; compare 3e-6
    got = {r["id"]: r["rank"] for r in pagerank(df, tol=1e-7).collect()}
    want = _ref_pagerank(edges, iters=300)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=3e-6), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    # unweighted variant: hub's 3.0 edge collapses to 1 -> ranks shift
    got_u = {
        r["id"]: r["rank"]
        for r in pagerank(df, weight_col=None, tol=1e-7).collect()
    }
    want_u = _ref_pagerank([(s, d, 1.0) for s, d, _ in edges], iters=300)
    for v in want_u:
        assert got_u[v] == pytest.approx(want_u[v], abs=3e-6), v
    assert got_u["b"] != pytest.approx(got["b"], abs=1e-6)


def test_pagerank_budget_and_plan(spark):
    df = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)],
        "src string, dst string, weight double",
    )
    # asymmetric weights so the uniform start is NOT already the fixpoint
    df2 = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0), ("a", "c", 2.0)],
        "src string, dst string, weight double",
    )
    with pytest.raises(RuntimeError, match="converge"):
        pagerank(df2, max_iters=1, tol=1e-15)
    # stays JVM-side: no row-at-a-time Python anywhere in one iteration
    e = df.selectExpr("src", "dst", "weight as w")
    plan = (
        host_link_graph(
            df.selectExpr("src as src_host", "dst as dst_host")
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    got = pagerank(df, tol=1e-12).collect()
    assert all(r["rank"] == pytest.approx(1.0 / 3.0, abs=1e-9) for r in got)


def test_pagerank_fixed_iters_exact_step_count(spark):
    # fixed_iters must take EXACTLY that many power steps — far from the
    # fixpoint after 5 steps, so agreement at 1e-12 with the independent
    # reference at the same step count proves the count, not convergence
    edges = [
        ("hub", "a", 1.0),
        ("hub", "b", 3.0),
        ("a", "hub", 1.0),
        ("b", "sink", 2.0),  # dangling sink folds mass back each step
    ]
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {r["id"]: r["rank"] for r in pagerank(df, fixed_iters=5).collect()}
    want5 = _ref_pagerank(edges, iters=5)
    want6 = _ref_pagerank(edges, iters=6)
    for v in want5:
        assert got[v] == pytest.approx(want5[v], abs=1e-12), v
    # 5 steps is not 6 steps and not the fixpoint
    assert any(abs(want5[v] - want6[v]) > 1e-4 for v in want5)
    # no convergence raise even when the budget is tiny
    one = {r["id"]: r["rank"] for r in pagerank(df, fixed_iters=1).collect()}
    want1 = _ref_pagerank(edges, iters=1)
    for v in want1:
        assert one[v] == pytest.approx(want1[v], abs=1e-12), v


def test_rank_priorities_monotone(spark):
    import pytest as _pt

    from gocrawler_spark.operators.graph import rank_priorities

    ranks = spark.createDataFrame(
        [(f"h{i}", (i + 1) / 100.0) for i in range(100)], "id string, rank double"
    )
    got = rank_priorities(ranks, levels=10).collect()
    by_rank = sorted(got, key=lambda r: r["rank"])
    prios = [r["priority"] for r in by_rank]
    assert prios == sorted(prios)  # monotone in rank
    assert min(prios) == 0 and max(prios) == 9
    # every level populated on a uniform distribution
    assert len(set(prios)) == 10
    with _pt.raises(ValueError):
        rank_priorities(ranks, levels=1)
    # exact variant: same contract, and on this uniform grid the exact
    # thresholds match numpy's linear-interpolation percentiles, so the
    # bucketing equals a reference computed outside Spark entirely
    import numpy as np

    vals = np.array([(i + 1) / 100.0 for i in range(100)])
    th = np.percentile(vals, [10 * i for i in range(1, 10)], method="linear")
    want = {f"h{i}": int((vals[i] > th).sum()) for i in range(100)}
    got_exact = {
        r["id"]: r["priority"]
        for r in rank_priorities(ranks, levels=10, exact=True).collect()
    }
    assert got_exact == want
    # approx path agrees on well-separated data
    assert {r["id"]: r["priority"] for r in got} == want


def test_anchor_text_topk_matches_reference(spark):
    from gocrawler_spark.operators.graph import anchor_text_topk

    # (src_host, dst_url, anchor_text) — messy whitespace/case variants
    # of the same anchor must merge; empty/null anchors drop
    links = [
        ("a.example", "https://t.example/p", "Best  Widgets"),
        ("b.example", "https://t.example/p", "best widgets "),
        ("b.example", "https://t.example/p", "BEST\twidgets"),
        ("a.example", "https://t.example/p", "widgets"),
        ("c.example", "https://t.example/p", "widgets"),
        ("c.example", "https://t.example/p", "spam anchor"),
        ("c.example", "https://t.example/p", "spam anchor"),
        ("c.example", "https://t.example/p", "spam anchor"),
        ("a.example", "https://t.example/p", ""),
        ("a.example", "https://t.example/p", None),
        ("a.example", "https://u.example/q", "other page"),
    ]
    df = spark.createDataFrame(
        links, "src_host string, dst_url string, anchor_text string"
    ).repartition(4)
    got = [
        (r["dst"], r["anchor"], r["n_links"], r["n_hosts"], r["rn"])
        for r in anchor_text_topk(df, k=2).orderBy("dst", "rn").collect()
    ]
    # independent expectation: normalize + count by hand
    # t.example/p: 'best widgets' x3 (hosts a,b), 'spam anchor' x3 (host c),
    #              'widgets' x2 — top-2 ties broken by n_hosts desc, anchor asc
    assert got == [
        ("https://t.example/p", "best widgets", 3, 2, 1),
        ("https://t.example/p", "spam anchor", 3, 1, 2),
        ("https://u.example/q", "other page", 1, 1, 1),
    ]
    plan = anchor_text_topk(df, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    with pytest.raises(ValueError):
        anchor_text_topk(df, k=0)
