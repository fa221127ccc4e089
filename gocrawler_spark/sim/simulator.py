"""Single-threaded golden reference simulator (SURVEY §5.3).

Implements the *synchronous semantics* of the reference crawl loop —
colly's recursive Visit with AllowURLRevisit=false, URLFilters, allowed
domains, robots, and the LimitRule politeness budget re-expressed as a
per-host per-round credit — in ~150 lines of plain Python. The Spark
round job must reproduce its outputs exactly:

* ``seen``       — URL-seen set (url -> md5 hash), discovery-time dedup
                   (colly marks visited at Visit time, before fetch)
* ``order``      — fetch order [(round, seq, url)], seq ranked by
                   (priority, host, url) within the round (SURVEY O4)
* ``items``      — Redis-write-equivalent item store: HMSET last-wins
                   scalars, HSETNX first-wins details, RPUSH appended
                   reviews (repository.go:25-93)
* ``fetch_log``  — OnResponse (gated by the F7 re-check) / OnError rows
* ``frontier``   — URLs admitted but not yet fetched (politeness deferral)

Round spec shared with plans/crawl.py — keep the two in lockstep:
  admission (F1 host ∈ allowed, F2 Go-regex, F6 depth, F5 robots) runs
  at DISCOVERY time; admitted URLs enter frontier + seen. Each round
  fetches at most ``credit`` URLs per host chosen by (priority, url);
  priority = 0 for product-classified URLs (F3) and seeds, else 1.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit

from .. import gofuncs as go
from ..extract import extract_page
from ..profiles import SiteProfile


@dataclass
class SimConfig:
    credit_per_host: int = 4  # colly LimitRule Parallelism=4 (scraper.go:103)
    max_depth: int | None = None  # MaxDepth(5) commented out (scraper.go:81)
    max_rounds: int = 1000
    # per-host budget: credit(host) = max(1, budget // max(crawl_delay_ms))
    # for hosts with a delay rule, else credit_per_host
    round_budget_ms: int | None = None


@dataclass
class SimResult:
    seen: dict = field(default_factory=dict)  # url -> url_hash
    order: list = field(default_factory=list)  # (round, seq, url)
    items: dict = field(default_factory=dict)  # id -> item dict
    fetch_log: list = field(default_factory=list)  # dicts
    frontier: list = field(default_factory=list)  # remaining pending rows
    quarantine: list = field(default_factory=list)  # captcha urls
    rounds: int = 0


def _allowed_hosts(profile: SiteProfile) -> set[str]:
    return {d for d in profile.allowed_domains if "//" not in d}


def _robots_rule_matches(pattern: str, path: str) -> bool:
    """Google-REP pattern match, the Python twin of
    ``operators.robots._rule_matches``: plain patterns are prefixes;
    ``*`` matches any chars and a trailing ``$`` anchors the end."""
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return re.match(rx + ("$" if anchored else ""), path) is not None


def _robots_allowed(robots_rules, host: str, path: str) -> bool:
    """Longest matching pattern wins (REP specificity, raw pattern
    length); tie -> allow; no matching rule -> allow."""
    best_len, best_allow = -1, True
    for r in robots_rules:
        if r["host"] != host:
            continue
        pref = r["path_prefix"]
        if _robots_rule_matches(pref, path):
            L = len(pref)
            allow = r["rule"] == "allow"
            if L > best_len or (L == best_len and allow):
                best_len, best_allow = L, allow
    return best_allow


def simulate(
    pages: dict[str, bytes],
    seeds: list[dict],
    robots: list[dict],
    profile: SiteProfile,
    config: SimConfig = SimConfig(),
) -> SimResult:
    res = SimResult()
    link_re = profile.link_re
    product_re = profile.product_re
    allowed = _allowed_hosts(profile)

    def admit(url: str, depth: int) -> tuple[str, str] | None:
        """Returns (host, path) if admitted, else None."""
        parts = urlsplit(url)
        host, path = parts.netloc, parts.path
        if host not in allowed:
            return None
        if not link_re.search(url):
            return None
        if config.max_depth is not None and depth > config.max_depth:
            return None
        if not _robots_allowed(robots, host, path):
            return None
        return host, path

    def priority_of(url: str) -> int:
        return 0 if product_re.search(url) else 1

    # frontier rows: dict(url, host, depth, priority, discovered_round)
    frontier: dict[str, dict] = {}
    for s in seeds:
        url = s["url"]
        adm = admit(url, 0)
        if adm is None or url in res.seen:
            continue
        res.seen[url] = go.md5_hex(url)
        frontier[url] = {
            "url": url, "host": adm[0], "depth": 0,
            "priority": int(s.get("priority", 0)), "discovered_round": 0,
        }

    rnd = 0
    while frontier and rnd < config.max_rounds:
        rnd += 1
        # politeness: per host keep top-credit by (priority, url)
        by_host: dict[str, list[dict]] = {}
        for row in frontier.values():
            by_host.setdefault(row["host"], []).append(row)
        host_delay: dict[str, int] = {}
        if config.round_budget_ms is not None:
            for r in robots:
                d = r.get("crawl_delay_ms") or 0
                if d > host_delay.get(r["host"], 0):
                    host_delay[r["host"]] = d

        def credit_of(host: str) -> int:
            if config.round_budget_ms is None or host_delay.get(host, 0) <= 0:
                return config.credit_per_host
            return max(1, config.round_budget_ms // host_delay[host])

        fetch_set = []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (r["priority"], r["url"]))
            fetch_set.extend(rows[: credit_of(host)])
        # deterministic order spec: (round, priority, host, url)
        fetch_set.sort(key=lambda r: (r["priority"], r["host"], r["url"]))

        discoveries: dict[str, int] = {}  # link -> min depth this round
        for seq, row in enumerate(fetch_set, start=1):
            url = row["url"]
            del frontier[url]
            res.order.append((rnd, seq, url))
            html = pages.get(url)
            if html is None:
                # OnError path (scraper.go:123-150)
                res.fetch_log.append(
                    {
                        "req_id": go.md5_hex(url), "url": url, "round": rnd,
                        "seq": seq, "callback": "OnError",
                        "error": "Not Found", "depth": row["depth"],
                        "status_code": 404,
                    }
                )
                continue
            # F7 re-check gates OnResponse tracking only (scraper.go:153-159)
            if link_re.search(url) or "?sku=" in url:
                res.fetch_log.append(
                    {
                        "req_id": go.md5_hex(url), "url": url, "round": rnd,
                        "seq": seq, "callback": "OnResponse", "error": "",
                        "depth": row["depth"], "status_code": 200,
                    }
                )
            ex = extract_page(url, html, profile)
            if ex["is_captcha"]:
                res.quarantine.append(url)
            item = ex["item"]
            if item is not None:
                _store_item(res.items, item)
            for link in ex["links"]:
                d = row["depth"] + 1
                if link not in discoveries or d < discoveries[link]:
                    discoveries[link] = d
        # order-free candidate admission: per distinct link, min depth over
        # this round's discovering parents, then dedup vs seen + admission
        for link, d in discoveries.items():
            if link in res.seen:
                continue
            adm = admit(link, d)
            if adm is None:
                continue
            res.seen[link] = go.md5_hex(link)
            frontier[link] = {
                "url": link, "host": adm[0], "depth": d,
                "priority": priority_of(link), "discovered_round": rnd,
            }
    res.frontier = sorted(frontier.values(), key=lambda r: r["url"])
    res.rounds = rnd
    return res


def _store_item(store: dict, item: dict):
    """Redis Set semantics (repository.go:25-93): HMSET scalars last-wins,
    RPUSH reviews appended, HSETNX details first-wins per key."""
    iid = item["id"]
    if iid not in store:
        store[iid] = {k: (dict(v) if isinstance(v, dict) else list(v) if isinstance(v, list) else v) for k, v in item.items()}
        return
    old = store[iid]
    for k in ("name", "brand", "description", "price_cents", "rating",
              "source_store", "url"):
        old[k] = item[k]
    old["reviews"] = old["reviews"] + list(item["reviews"])
    for k, v in item["details"].items():
        old["details"].setdefault(k, v)
