"""Crawl-trap detection vs an independent pure-Python reference.

The reference implementation re-derives (host, template) with
urllib.parse + re — a different split strategy than the Spark
substring_index/regexp chain — so a parsing bug in either side shows up
as a stats mismatch.
"""

import re
from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from gocrawler_spark.operators.traps import host_trap_stats, trap_hosts, url_templates

_HEX = re.compile(r"(?<![0-9a-fA-F])[0-9a-fA-F]{8,}(?![0-9a-fA-F])")


def _ref_template(u):
    if "://" not in u:
        return None, None
    s = urlsplit(u)
    host = s.hostname
    if not host:
        return None, None
    if ":" in host:
        host = f"[{host}]"
    # port/userinfo stripping mirrors frontier._host_of (parse_url HOST)
    path = s.path or "/"
    tmpl = re.sub(r"[0-9]+", "{d}", _HEX.sub("{h}", path))
    if "?" in u.split("#", 1)[0]:
        keys = sorted(
            {p.split("=", 1)[0] for p in s.query.split("&") if p.split("=", 1)[0]}
        )
        tmpl = tmpl + "?" + "&".join(keys)
    # battery hosts are lowercase already (urlsplit lowercases; the
    # Spark _host_of does not — same contract as parse_url)
    return host, tmpl


def _ref_stats(urls, min_urls, max_per_template):
    from collections import defaultdict

    per_t = defaultdict(set)
    for u in urls:
        host, tmpl = _ref_template(u)
        if host is None:
            continue
        per_t[(host, tmpl)].add(u)
    hosts = defaultdict(lambda: {"n_urls": 0, "n_templates": 0, "max_t": 0})
    for (host, tmpl), us in per_t.items():
        h = hosts[host]
        h["n_urls"] += len(us)
        h["n_templates"] += 1
        h["max_t"] = max(h["max_t"], len(us))
    return {
        host: (
            h["n_urls"],
            h["n_templates"],
            h["max_t"],
            h["n_urls"] >= min_urls and h["max_t"] >= max_per_template,
        )
        for host, h in hosts.items()
    }


def _battery():
    urls = []
    # calendar trap: one template, 400 distinct date URLs
    for y in range(2020, 2024):
        for m in range(1, 11):
            for d in range(1, 11):
                urls.append(f"https://trap.example/cal/{y}/{m:02d}/{d:02d}")
    # session-id trap: hex ids in the QUERY VALUE (keys survive, values
    # don't), 300 distinct URLs on one template
    for i in range(300):
        urls.append(f"https://sess.example/view?page=3&sid={i:032x}")
    # benign blog: every slug is its own template (no digit/hex runs)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    for a in words:
        for b in words:
            for c in words:
                urls.append(f"https://blog.example/posts/{a}-{b}-{c}")
    # benign-but-small host with digit ids: explodes per-template but
    # under min_urls
    for i in range(40):
        urls.append(f"https://tiny.example/item/{i}")
    # junk that must not crash or count
    urls += ["not-a-url", "mailto:x@example.com", "https:///nohost"]
    # duplicates must not double-count
    urls += urls[:25]
    # fragment and multi-'?' edge cases
    urls.append("https://trap.example/cal/2020/01/01#frag")  # dup of day 1
    urls.append("https://sess.example/view?page=3&sid=00000000000000000000000000000001?x")
    return urls


@pytest.mark.usefixtures("spark")
def test_trap_stats_match_reference(spark):
    urls = _battery()
    MIN_URLS, MAX_T = 100, 150
    df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(7)
    got = {
        r["host"]: (
            r["n_urls"],
            r["n_templates"],
            r["max_template_urls"],
            r["is_trap"],
        )
        for r in host_trap_stats(
            df, min_urls=MIN_URLS, max_urls_per_template=MAX_T
        ).collect()
    }
    ref = _ref_stats(urls, MIN_URLS, MAX_T)
    assert got == ref
    # the planted shape: two traps, two benign hosts
    assert got["trap.example"][3] and got["sess.example"][3]
    assert not got["blog.example"][3] and not got["tiny.example"][3]
    # blog.example is template-diverse by construction
    assert got["blog.example"][1] == len(
        {t for h, t in map(_ref_template, urls) if h == "blog.example"}
    )
    flagged = {r["host"] for r in trap_hosts(df, min_urls=MIN_URLS, max_urls_per_template=MAX_T).collect()}
    assert flagged == {"trap.example", "sess.example"}


def test_trap_templates_collapse_volatile_tokens(spark):
    rows = [
        ("https://h.example/a/123/b?x=1&y=2",),
        ("https://h.example/a/999/b?y=9&x=0",),  # same template: keys sorted
        ("https://h.example/a/deadbeef00/b",),  # hex run -> {h}
        ("https://h.example/a/slug-text/b",),  # alpha slug survives
    ]
    out = {
        r["url"]: r["template"]
        for r in url_templates(spark.createDataFrame(rows, "url string")).collect()
    }
    assert out[rows[0][0]] == out[rows[1][0]] == "/a/{d}/b?x&y"
    assert out[rows[2][0]] == "/a/{h}/b"
    assert out[rows[3][0]] == "/a/slug-text/b"


def test_trap_stats_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("https://h.example/a/1",)], "url string")
    plan = host_trap_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
