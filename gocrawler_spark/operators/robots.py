"""robots.txt admission filter (F5) — broadcast-joined rules table.

The reference relies on colly's default robots handling
(``IgnoreRobotsTxt=false`` via temoto/robotstxt, go.mod:21)
[colly v1.2.0]. Here the per-host rules live in a small ``robots``
table broadcast to every executor; matching follows the standard
longest-prefix-wins rule (allow wins prefix-length ties), evaluated
relationally so Catalyst keeps the whole check JVM-side:

candidates ⋈ broadcast(rules) on host, prefix match via startswith,
max-length rule per url via window, verdict = rule=='allow' (hosts with
no matching rule are allowed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_filter(
    candidates: DataFrame, robots: DataFrame, url_col: str = "url",
    host_col: str = "host", path_col: str = "path",
) -> DataFrame:
    """Return candidates allowed by robots rules (broadcast join)."""
    rules = robots.select(
        F.col("host").alias("_r_host"),
        F.col("rule").alias("_r_rule"),
        F.col("path_prefix").alias("_r_prefix"),
    )
    joined = candidates.join(
        F.broadcast(rules),
        (F.col(host_col) == F.col("_r_host"))
        & F.col(path_col).startswith(F.col("_r_prefix")),
        "left",
    )
    w = Window.partitionBy(url_col).orderBy(
        F.length("_r_prefix").desc(),
        # tie on length: allow wins
        F.when(F.col("_r_rule") == "allow", 0).otherwise(1),
    )
    best = joined.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    allowed = best.filter((F.col("_r_rule").isNull()) | (F.col("_r_rule") == "allow"))
    return allowed.drop("_r_host", "_r_rule", "_r_prefix", "_rn")
