"""robots.txt *parsing* — derive the F5 rules table from page bodies.

The reference never ships a rules table: colly fetches ``/robots.txt``
per host and parses it via temoto/robotstxt (go.mod:21, colly default
``IgnoreRobotsTxt=false`` — scraper.go:79-88 builds collectors without
disabling it). Round 1/2 consumed a pre-made ``robots_df``; this module
closes that gap: given ``pages`` rows whose URLs end in ``/robots.txt``,
it produces the exact (host, agent, rule, path_prefix, crawl_delay_ms)
table ``robots_filter`` consumes.

Semantics follow temoto/robotstxt (which follows the Google REP draft):

* lines are ``field: value``; ``#`` starts a comment; unknown fields and
  blank lines are ignored (blank lines do NOT terminate a group);
* a run of consecutive ``User-agent`` lines opens a group; the group's
  rules are every allow/disallow/crawl-delay line up to the next
  User-agent run; rules before any User-agent line are ignored;
* agent matching mirrors temoto FindGroup: ``*`` matches anything with
  the weakest possible score (1); otherwise a group matches when its
  agent token is a case-insensitive PREFIX of the caller's user-agent
  (``strings.HasPrefix``), scoring ``len(token)+1``; exactly ONE group
  wins — the highest score, ties broken by last declaration (temoto
  keys groups in a map, so a duplicate token's later group overwrites
  the earlier one);
* a winning group with a ``Crawl-delay`` but no path rules still emits
  one synthesized ``allow /`` row so the delay is not lost (allow rows
  never restrict admission in ``robots_filter``);
* an allow/disallow line with an empty path is a no-op (an empty
  Disallow means "allow everything" — no restriction row);
* ``Crawl-delay`` is seconds (fractional ok) → ``crawl_delay_ms``;
  groups without one get 0.

Plan shape: the whole parse is JVM-side — split/posexplode the body
into lines, regexp the field/value, then two window passes per host
(gaps-and-islands group ids + best-agent selection). No Python UDF: at
10^10-URL scale robots bodies arrive as ordinary fetched pages and this
parse is just another vectorized stage over them. Output cardinality is
rules-per-host — tiny — so the result broadcasts into robots_filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .frontier import _host_of

_FIELDS = ("user-agent", "allow", "disallow", "crawl-delay")


def _body_str(df: DataFrame, body_col: str):
    """Body column as string — decodes binary (the pages-table shape)."""
    body = F.col(body_col)
    if dict(df.dtypes)[body_col] == "binary":
        body = F.decode(body, "utf-8")
    return body


def robots_directives(pages: DataFrame, url_col: str = "url",
                      body_col: str = "html") -> DataFrame:
    """pages rows -> one row per directive line:
    (host, ln, field, value, is_ua). Bodies may be binary or string."""
    body = _body_str(pages, body_col)
    lines = pages.select(
        _host_of(F.col(url_col)).alias("host"),
        F.posexplode(F.split(body, r"\r?\n")).alias("ln", "line"),
    )
    clean = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    dirs = (
        lines.withColumn("clean", clean)
        .filter(F.col("clean").rlike("^[^:]+:"))
        .select(
            "host",
            "ln",
            F.lower(F.trim(F.regexp_extract("clean", "^([^:]+):", 1))).alias("field"),
            F.trim(F.regexp_extract("clean", "^[^:]+:(.*)$", 1)).alias("value"),
        )
        .filter(F.col("field").isin(*_FIELDS))
    )
    return dirs.withColumn("is_ua", F.col("field") == "user-agent")


def parse_robots_pages(
    pages: DataFrame,
    user_agent: str = "*",
    url_col: str = "url",
    body_col: str = "html",
) -> DataFrame:
    """robots.txt page bodies -> the F5 rules table
    (host, agent, rule, path_prefix, crawl_delay_ms).

    ``user_agent`` is the crawler's UA string; each host contributes the
    rules of its best-matching group(s) only, per the temoto semantics
    in the module docstring."""
    dirs = robots_directives(pages, url_col, body_col)

    w = Window.partitionBy("host").orderBy("ln")
    # gaps-and-islands: a UA line whose previous directive is not a UA
    # line starts a new group; gid = running count of group starts
    grouped = (
        dirs.withColumn(
            "_gs",
            (F.col("is_ua") & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))).cast("int"),
        )
        .withColumn("gid", F.sum("_gs").over(w))
        .filter(F.col("gid") > 0)  # rules before any User-agent: ignored
    )

    # temoto FindGroup scoring: '*' -> 1 (weakest); token that is a
    # case-insensitive PREFIX of the caller UA -> len(token)+1; one
    # group wins per host (ties -> last-declared gid, matching temoto's
    # map overwrite on duplicate tokens)
    match_len = (
        F.when(F.col("value") == "*", F.lit(1))
        .when(
            F.lit(user_agent.lower()).startswith(F.lower(F.col("value"))),
            F.length("value") + 1,
        )
        .otherwise(F.lit(None).cast("int"))
    )
    agents = (
        grouped.filter("is_ua")
        .select("host", "gid", F.col("value").alias("agent"), match_len.alias("mlen"))
        .filter(F.col("mlen").isNotNull())
    )
    ga = agents.groupBy("host", "gid").agg(
        F.max("mlen").alias("gmlen"),
        F.max_by("agent", "mlen").alias("agent"),
    )
    wb = Window.partitionBy("host").orderBy(F.col("gmlen").desc(), F.col("gid").desc())
    best = (
        ga.withColumn("_rk", F.row_number().over(wb))
        .filter(F.col("_rk") == 1)
        .select("host", "gid", "agent")
    )

    # try_cast, not cast: the value is raw fetched robots.txt text, and
    # under ANSI a server emitting 'Crawl-delay: 10s' would otherwise
    # throw and kill the whole parse job. Unparseable delay lines are
    # dropped (temoto's strconv.ParseFloat-error path likewise leaves
    # the group delay unset) and the first *valid* line wins.
    delays = (
        grouped.filter(F.col("field") == "crawl-delay")
        .withColumn("_dv", F.col("value").try_cast("double"))
        .filter(F.col("_dv").isNotNull())
        .groupBy("host", "gid")
        .agg(
            F.round(F.min_by("_dv", "ln") * 1000)
            .cast("long")
            .alias("crawl_delay_ms")
        )
    )
    rules = (
        grouped.filter(F.col("field").isin("allow", "disallow") & (F.col("value") != ""))
        .select("host", "gid", F.col("field").alias("rule"), F.col("value").alias("path_prefix"))
    )
    # drive from the winning group so a Crawl-delay with no path rules
    # still surfaces (as a non-restricting 'allow /' row); groups with
    # neither rules nor a delay emit nothing
    return (
        best.join(rules, ["host", "gid"], "left")
        .join(delays, ["host", "gid"], "left")
        .filter(F.col("rule").isNotNull() | F.col("crawl_delay_ms").isNotNull())
        .select(
            "host",
            "agent",
            F.coalesce("rule", F.lit("allow")).alias("rule"),
            F.coalesce("path_prefix", F.lit("/")).alias("path_prefix"),
            F.coalesce("crawl_delay_ms", F.lit(0)).cast("long").alias("crawl_delay_ms"),
        )
    )


def robots_sitemaps(pages: DataFrame, url_col: str = "url",
                    body_col: str = "html") -> DataFrame:
    """``Sitemap:`` directives from robots.txt bodies -> (host,
    sitemap_url). Per the REP, Sitemap lines are host-global (outside
    any User-agent group), so no group/agent logic applies. The output
    feeds the streaming frontier ingest (sitemap pings are the
    canonical unbounded candidate source for
    streaming/microbatch.start_frontier_ingest)."""
    body = _body_str(pages, body_col)
    lines = pages.select(
        _host_of(F.col(url_col)).alias("host"),
        F.explode(F.split(body, r"\r?\n")).alias("line"),
    )
    clean = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    return (
        lines.withColumn("clean", clean)
        .filter(F.lower(F.col("clean")).rlike(r"^sitemap\s*:"))
        .select(
            "host",
            F.trim(F.regexp_extract("clean", r"^[^:]+:(.*)$", 1)).alias("sitemap_url"),
        )
        .filter(F.col("sitemap_url") != "")
    )


def sitemap_candidates(sitemap_pages: DataFrame, url_col: str = "url",
                       body_col: str = "html") -> DataFrame:
    """Fetched sitemap bodies (sitemaps.org protocol) -> streaming-
    frontier candidate rows ``(url, depth=0)``.

    One vectorized regexp pass over ``<loc>`` entries — no XML library,
    no Python UDF — so a 100 TB sitemap corpus parses as an ordinary
    scan. Plain ``<urlset>`` bodies yield page candidates;
    ``<sitemapindex>`` entries surface as rows too (their urls point at
    more sitemaps — the caller's fetch loop re-reads those). This is
    the feed ``streaming.microbatch.start_frontier_ingest`` documents:
    robots_sitemaps -> fetch -> sitemap_candidates -> ingest. For the
    STRUCTURED view of the same documents (urlset-vs-sitemapindex kind,
    lastmod for recrawl scheduling, per-host rows) use
    ``operators.sitemap.parse_sitemap_pages``.

    The sitemaps.org protocol REQUIRES urls to be XML-entity-escaped
    (``&`` query separators arrive as ``&amp;``) and allows CDATA
    wrapping, so both are undone here — still pure JVM expressions."""
    body = _body_str(sitemap_pages, body_col)
    locs = sitemap_pages.select(
        F.explode(
            F.regexp_extract_all(
                body,
                # plain or CDATA-wrapped loc; URLs cannot contain '<' or
                # ']]>' so the content classes are safe
                F.lit(r"<loc>\s*(?:<!\[CDATA\[\s*([^\]<]+?)\s*\]\]>|([^<]+?))\s*</loc>"),
                0,
            )
        ).alias("raw")
    )
    inner = F.regexp_replace(
        F.regexp_replace(F.col("raw"), r"^<loc>\s*(?:<!\[CDATA\[\s*)?", ""),
        r"\s*(?:\]\]>\s*)?</loc>$", "",
    )
    # the five predefined XML entities; &amp; last so '&amp;lt;'
    # decodes to the literal '&lt;' (double-escape stays correct)
    url = inner
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        url = F.replace(url, F.lit(ent), F.lit(ch))
    return (
        locs.select(url.alias("url"))
        .filter(F.col("url") != "")
        .withColumn("depth", F.lit(0).cast("int"))
        .distinct()
    )


def render_robots_txt(rules: list[dict]) -> dict[str, str]:
    """Inverse helper for fixtures/entry wiring: per-host robots.txt
    bodies from (host, agent, rule, path_prefix, crawl_delay_ms) rows —
    one group per (host, agent), rules in input order."""
    by_host: dict[str, dict[str, list[dict]]] = {}
    for r in rules:
        by_host.setdefault(r["host"], {}).setdefault(r["agent"], []).append(r)
    bodies = {}
    for host, groups in by_host.items():
        parts = []
        for agent, rs in groups.items():
            parts.append(f"User-agent: {agent}")
            delay = None
            for r in rs:
                parts.append(f"{r['rule'].capitalize()}: {r['path_prefix']}")
                if r.get("crawl_delay_ms"):
                    delay = r["crawl_delay_ms"]
            if delay is not None:
                parts.append(f"Crawl-delay: {delay / 1000:g}")
            parts.append("")
        bodies[host] = "\n".join(parts)
    return bodies
