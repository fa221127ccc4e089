"""Recrawl scheduling vs an independent driver-side reference.

The reference re-implements the Cho & Garcia-Molina estimator with
plain Python math over sorted per-URL histories; the Spark side uses a
lag window + groupBy. Planted histories cover always-changing,
never-changing, half-changing, single-fetch, and irregular-interval
URLs.
"""

import math

import pytest
from pyspark.sql import functions as F

from gocrawler_spark.operators.recrawl import (
    change_rates,
    recrawl_priorities,
    select_recrawl_set,
)

HIST_DDL = "url string, fetch_ts double, content_hash string"


def _ref_stats(rows, now, cold_start_p=0.5):
    from collections import defaultdict

    by_url = defaultdict(list)
    for url, ts, h in rows:
        by_url[url].append((ts, h))
    out = {}
    for url, fetches in by_url.items():
        fetches.sort()
        n_fetches = len(fetches)
        n = n_fetches - 1
        x = sum(1 for i in range(1, n_fetches) if fetches[i][1] != fetches[i - 1][1])
        span = fetches[-1][0] - fetches[0][0]
        lam = -math.log((n - x + 0.5) / (n + 0.5)) if n > 0 else 0.0
        rate = lam / (span / n) if n > 0 and span > 0 else 0.0
        if n > 0 and span > 0:
            p = 1.0 - math.exp(-rate * max(now - fetches[-1][0], 0.0))
        else:
            p = cold_start_p
        out[url] = (n_fetches, x, span, lam, rate, p)
    return out


def _battery():
    rows = []
    # always changes, regular hourly fetches
    for i in range(6):
        rows.append(("https://hot.example/a", 3600.0 * i, f"v{i}"))
    # never changes
    for i in range(6):
        rows.append(("https://cold.example/b", 3600.0 * i, "same"))
    # changes on half the revisits, irregular intervals
    ts = [0.0, 100.0, 5000.0, 5400.0, 20000.0]
    hs = ["a", "a", "b", "b", "c"]
    rows += [("https://mid.example/c", t, h) for t, h in zip(ts, hs)]
    # single fetch — cold start
    rows.append(("https://new.example/d", 1000.0, "x"))
    # all fetches at one instant — zero span, cold start
    rows += [("https://burst.example/e", 50.0, h) for h in ("p", "q")]
    return rows


def test_change_rates_match_reference(spark):
    rows = _battery()
    NOW = 25000.0
    df = spark.createDataFrame(rows, HIST_DDL).repartition(5)
    got = {
        r["url"]: (
            r["n_fetches"],
            r["n_changes"],
            r["span"],
            r["lambda_hat"],
            r["change_rate"],
            r["p_changed"],
        )
        for r in recrawl_priorities(df, now=NOW).collect()
    }
    ref = _ref_stats(rows, NOW)
    assert set(got) == set(ref)
    for url, exp in ref.items():
        assert got[url] == pytest.approx(exp), url
    # shape sanity: the always-changing page is near-certain to have
    # changed, the never-changing one is at 0, cold starts sit at 0.5
    assert got["https://hot.example/a"][5] > 0.99
    assert got["https://cold.example/b"][5] == 0.0
    assert got["https://new.example/d"][5] == 0.5
    assert got["https://burst.example/e"][5] == 0.5
    # X = n stays finite (Jeffreys correction)
    assert math.isfinite(got["https://hot.example/a"][3])


def test_select_recrawl_topk_per_host(spark):
    # one host with three URLs at distinct p_changed, budget 2
    rows = []
    for i, (suffix, hashes) in enumerate(
        [("x", ["1", "2", "3"]), ("y", ["1", "1", "2"]), ("z", ["1", "1", "1"])]
    ):
        rows += [
            (f"https://h.example/{suffix}", 100.0 * j, h)
            for j, h in enumerate(hashes)
        ]
    rows += [("https://other.example/only", 100.0 * j, "c") for j in range(2)]
    df = spark.createDataFrame(rows, HIST_DDL)
    pri = recrawl_priorities(df, now=500.0)
    picked = select_recrawl_set(pri, per_host_budget=2)
    by_host = {}
    for r in picked.collect():
        by_host.setdefault(r["host"], set()).add(r["url"])
    assert by_host["h.example"] == {
        "https://h.example/x",
        "https://h.example/y",
    }  # z never changed -> lowest p
    assert by_host["other.example"] == {"https://other.example/only"}
    # the literal budget bound must plan as a map-side partial top-k
    plan = picked._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_recrawl_budget_validation(spark):
    df = spark.createDataFrame([("https://h.example/x", 0.0, "a")], HIST_DDL)
    with pytest.raises(ValueError):
        select_recrawl_set(recrawl_priorities(df, now=1.0), per_host_budget=0)
