"""Parser-stage analogue: review sentiment/entity analysis (E19 stub).

The reference Lambda (`/root/reference/pkg/itemparser/`) SCANs Redis in
200-key batches, fans each item to a goroutine pool, and calls AWS
Comprehend DetectSentiment/DetectEntities per review
(`analyzer.go:42-116`). The external service is stubbed here as a
deterministic lexicon scorer; the dataflow — scan → explode reviews →
analyze → re-aggregate per item — is the real rebuild (SURVEY §3.2):
Spark's partitioned execution replaces the SCAN-cursor/worker-pool/
channel machinery wholesale.

Everything is JVM-side (split/filter/size) so the per-review scoring is
SQL-expressible for the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POSITIVE = ("excelente", "buena", "bueno", "rapida", "rapido", "great", "good",
            "cumple", "recomendado", "perfecto")
NEGATIVE = ("mala", "malo", "lento", "lenta", "bad", "poor", "defecto",
            "roto", "terrible", "pesimo")


def _toks(col):
    return F.filter(F.split(F.lower(col), r"[^\w]+"), lambda t: t != "")


def sentiment_score(col) -> "F.Column":
    """(pos_hits - neg_hits) / max(tokens,1) in [-1, 1]."""
    t = _toks(col)
    pos = F.size(F.filter(t, lambda x: x.isin(*POSITIVE)))
    neg = F.size(F.filter(t, lambda x: x.isin(*NEGATIVE)))
    return F.round((pos - neg) / F.greatest(F.size(t), F.lit(1)), 6)


def sentiment_label(col) -> "F.Column":
    s = sentiment_score(col)
    return (
        F.when(s > 0, "POSITIVE").when(s < 0, "NEGATIVE").otherwise("NEUTRAL")
    )


def analyze_items(items: DataFrame) -> DataFrame:
    """items (nested reviews) -> per-item sentiment analysis map.

    Mirrors extractor.go:30-67 + analyzer.go:42-72: only items with
    reviews are analyzed; result keyed per comment index; plus an
    aggregate mean score per item."""
    exploded = (
        items.filter(F.size("reviews") > 0)
        .select("id", F.posexplode("reviews").alias("pos", "r"))
        .select(
            "id",
            "pos",
            F.col("r.content").alias("content"),
            sentiment_score(F.col("r.content")).alias("score"),
            sentiment_label(F.col("r.content")).alias("label"),
        )
    )
    return exploded.groupBy("id").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("label").alias("v")))
            )
        ).alias("comment_labels"),
        F.round(F.avg("score"), 6).alias("mean_score"),
        F.count("*").alias("n_reviews"),
    )
