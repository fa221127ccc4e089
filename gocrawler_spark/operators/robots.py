"""robots.txt admission filter (F5) — broadcast-joined rules table.

The reference relies on colly's default robots handling
(``IgnoreRobotsTxt=false`` via temoto/robotstxt, go.mod:21)
[colly v1.2.0]. Here the per-host rules live in a small ``robots``
table; matching follows Google's REP specificity rule — the longest
matching *pattern* wins, allow wins length ties, no rule ⇒ allowed —
including the spec's ``*`` (any chars) and trailing ``$`` (end anchor)
wildcards that temoto/robotstxt also implements. Plain-prefix rules
(the overwhelming majority in real robots files) keep the cheap
``startswith`` path; only rules containing a wildcard pay a regex
match. temoto's findRule has a file-order quirk on exact length ties
(later prefix rule wins via ``>=``); we keep the documented allow-wins
tie like Google's spec — ties between an allow and a disallow of equal
length are the only divergence, and the spec-side choice is safer.

Plan shape: rules are pre-aggregated to one array per host and
broadcast; the verdict is a pure JVM ``aggregate`` over that array
(startswith + running longest-match fold). No shuffle, no UDF — the
whole check stays inside whole-stage codegen, which matters because it
runs on every candidate URL every round.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _wild_regex_col(pattern):
    """Java-regex column for a robots pattern containing ``*`` or a
    trailing ``$`` (Google REP semantics): regex specials escaped,
    ``*`` -> ``.*``, one trailing ``$`` -> end anchor, anchored at the
    start. Built with JVM string functions so a million-host rules
    table never collects to the driver."""
    # escape Java-regex specials EXCEPT '*' (handled below); '$' is
    # escaped here and the trailing one un-escaped back into an anchor
    esc = F.regexp_replace(pattern, r"([.\[\]{}()+?^$\\|])", r"\\$1")
    esc = F.regexp_replace(esc, r"\*", ".*")
    # replacement '\$' keeps Java's replaceAll from reading '$' as a
    # group reference
    esc = F.regexp_replace(esc, r"\\\$$", r"\$")
    return F.concat(F.lit("^"), esc)


def _is_wild(pattern):
    return pattern.contains("*") | pattern.endswith("$")


def _wild_regex_py(pattern: str) -> str:
    """Driver-side twin of :func:`_wild_regex_col` for the map-literal
    plan (rules already collected)."""
    esc = re.sub(r"([.\[\]{}()+?^$\\|])", r"\\\1", pattern)
    esc = esc.replace("*", ".*")
    if esc.endswith("\\$"):
        esc = esc[:-2] + "$"
    return "^" + esc


def _rule_matches(path_col, prefix, rx):
    """Match verdict for one rule: prefix rules stay startswith
    (codegen), wildcard rules regex-match; ``rx`` is null for plain
    prefixes."""
    return F.when(rx.isNull(), path_col.startswith(prefix)).otherwise(
        F.regexp_like(path_col, rx)
    )


def max_rules_per_host(robots: DataFrame) -> int | None:
    """Metadata probe for :func:`robots_filter`'s fast-path choice.

    One tiny aggregation over the (broadcast-scale) rules table. Callers
    with a static rules table — the crawl loop, a streaming ingest —
    should run it ONCE (via :func:`compile_robots`) and pass the result
    to every ``robots_filter`` call: the probe is an eager driver
    action, and inside a per-round / per-micro-batch loop it would
    otherwise re-run every iteration."""
    return robots.groupBy("host").count().agg(F.max("count")).collect()[0][0]


@dataclass(frozen=True)
class CompiledRobots:
    """Pre-probed :func:`robots_filter` strategy for a static rules
    table: the max-rules fast-path verdict plus, when the table is tiny
    AND single-rule, the rules collected driver-side for the map-literal
    path (``None`` past the gate — a million-host table must stay a
    broadcast join, both for plan size and driver memory)."""

    max_rules: int | None
    single_rule_rows: tuple | None  # ((host, rule, path_prefix), ...)
    # None = unknown (keep the wildcard-capable verdict); False = probed
    # wildcard-free, so every plan drops back to the pure-startswith
    # expression shape — real robots tables are overwhelmingly plain
    # prefixes and the per-row when(x IS NULL, ...) dispatch + 3-field
    # structs measurably tax the hot scheduling path
    has_wild: bool | None = None


# map-literal gate. Spark evaluates a literal-map lookup as a LINEAR
# scan over the keys (ArrayBasedMapData has no hash index), and the
# verdict references the lookup up to 3 times per row, so the plan is
# O(3·hosts) string compares per candidate vs the broadcast join's one
# O(1) hash probe. Interleaved same-window A/B at 200 hosts / 8M
# candidates: map-literal 5.5-5.9 s vs broadcast join 3.8-4.1 s
# end-to-end (the round-4 schedule_dedupe regression, BASELINE.md
# round-5 notes) — so the join-free plan only pays below a handful of
# hosts, where 3·n compares is cheaper than the join's row shuffling.
ROBOTS_MAP_MAX_HOSTS = 16


def compile_robots(robots: DataFrame,
                   map_max_hosts: int = ROBOTS_MAP_MAX_HOSTS) -> CompiledRobots:
    """Probe (and for tiny single-rule tables, collect) the rules ONCE.

    Two driver actions at most, each metadata-scale; the result is
    reused by every ``robots_filter`` call in a loop."""
    mr = max_rules_per_host(robots)
    rows = None
    if mr is not None and mr <= 1:
        head = robots.select("host", "rule", "path_prefix").limit(map_max_hosts + 1).collect()
        if len(head) <= map_max_hosts:
            rows = tuple((r["host"], r["rule"], r["path_prefix"]) for r in head)
    if rows is not None:
        hw = any("*" in p or p.endswith("$") for _h, _r, p in rows)
    else:
        # one more metadata-scale scalar: lets every plan skip the
        # wildcard dispatch when the table is plain prefixes
        hw = bool(
            robots.agg(
                F.max(_is_wild(F.col("path_prefix")).cast("int"))
            ).first()[0]
        )
    return CompiledRobots(mr, rows, hw)


def robots_filter(
    candidates: DataFrame, robots: DataFrame, url_col: str = "url",
    host_col: str = "host", path_col: str = "path",
    compiled: CompiledRobots | None = None,
) -> DataFrame:
    """Return candidates allowed by robots rules.

    Three plans, picked by the rules table's shape:

    * TINY (<= ROBOTS_MAP_MAX_HOSTS) AND at-most-one-rule-per-host:
      the rules are inlined as a literal map and the verdict is a pure
      projection — NO join node at all. Literal-map lookups are linear
      key scans re-evaluated per verdict reference, so this only wins
      for a handful of hosts (at 200 hosts it measured 1.45x SLOWER
      end-to-end than the join — see the gate comment);
    * at most one rule per host (any size): broadcast join + a single
      codegen-friendly boolean verdict;
    * general multi-rule-per-host: broadcast join + longest-prefix fold
      over the host's rule array — a higher-order function, which Spark
      *interprets* (~300ns/row); measured 6x slower than the codegen
      path, so don't put it on the hot path unless the rules need it.

    ``compiled``: pre-computed :func:`compile_robots` result; pass it
    when calling in a loop so the probes don't re-run per call."""
    if compiled is None:
        compiled = compile_robots(robots)
    max_rules = compiled.max_rules
    # probed wildcard-free (the overwhelmingly common real-world shape):
    # every plan keeps the pre-wildcard pure-startswith expression — no
    # per-row null-dispatch, 2-field structs, smaller literals
    plain = compiled.has_wild is False
    if compiled.single_rule_rows is not None:
        if not compiled.single_rule_rows:
            return candidates  # no rules at all -> everything allowed
        entries = []
        for host, rule, prefix in compiled.single_rule_rows:
            rx = (
                _wild_regex_py(prefix)
                if ("*" in prefix or prefix.endswith("$"))
                else None
            )
            fields = [F.lit(rule).alias("r"), F.lit(prefix).alias("p")]
            if not plain:
                fields.append(F.lit(rx).cast("string").alias("x"))
            entries += [F.lit(host), F.struct(*fields)]
        e = F.create_map(*entries)[F.col(host_col)]
        match = (
            F.col(path_col).startswith(e["p"])
            if plain
            else _rule_matches(F.col(path_col), e["p"], e["x"])
        )
        verdict = e.isNull() | (e["r"] == "allow") | ~match
        return candidates.filter(verdict)
    if max_rules is not None and max_rules <= 1:
        sel = [
            F.col("host").alias("_r_host"),
            F.col("rule").alias("_r_rule"),
            F.col("path_prefix").alias("_r_prefix"),
        ]
        if not plain:
            sel.append(
                F.when(
                    _is_wild(F.col("path_prefix")),
                    _wild_regex_col(F.col("path_prefix")),
                ).alias("_r_rx")
            )
        rules1 = robots.select(*sel)
        joined = candidates.join(
            F.broadcast(rules1), F.col(host_col) == F.col("_r_host"), "left"
        )
        match = (
            F.col(path_col).startswith(F.col("_r_prefix"))
            if plain
            else _rule_matches(F.col(path_col), F.col("_r_prefix"), F.col("_r_rx"))
        )
        verdict = (
            F.col("_r_rule").isNull()
            | (F.col("_r_rule") == "allow")
            | ~match
        )
        out = joined.filter(verdict).drop("_r_host", "_r_rule", "_r_prefix")
        return out if plain else out.drop("_r_rx")

    rule_fields = [
        F.col("path_prefix").alias("p"),
        (F.col("rule") == "allow").alias("a"),
    ]
    if not plain:
        rule_fields.append(
            F.when(
                _is_wild(F.col("path_prefix")),
                _wild_regex_col(F.col("path_prefix")),
            ).alias("x")
        )
    rules_by_host = robots.groupBy(F.col("host").alias("_r_host")).agg(
        F.collect_list(F.struct(*rule_fields)).alias("_rules")
    )
    joined = candidates.join(
        F.broadcast(rules_by_host), F.col(host_col) == F.col("_r_host"), "left"
    )
    # fold: track (best_len, allow); longer pattern wins (Google REP
    # specificity — raw pattern length, wildcards included), equal
    # length -> allow wins; no matching rule -> allowed
    empty_t = (
        "array<struct<p:string,a:boolean>>"
        if plain
        else "array<struct<p:string,a:boolean,x:string>>"
    )
    verdict = F.aggregate(
        F.coalesce(F.col("_rules"), F.array().cast(empty_t)),
        F.struct(F.lit(-1).alias("len"), F.lit(True).alias("allow")),
        lambda acc, r: F.when(
            (
                F.col(path_col).startswith(r["p"])
                if plain
                else _rule_matches(F.col(path_col), r["p"], r["x"])
            )
            & (
                (F.length(r["p"]) > acc["len"])
                | ((F.length(r["p"]) == acc["len"]) & r["a"] & ~acc["allow"])
            ),
            F.struct(F.length(r["p"]).alias("len"), r["a"].alias("allow")),
        ).otherwise(acc),
        lambda acc: acc["allow"],
    )
    return joined.filter(verdict).drop("_r_host", "_rules")
