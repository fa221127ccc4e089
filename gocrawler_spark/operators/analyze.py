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


# E19 second half: DetectEntities stub (analyzer.go:96-116). Comprehend
# returns (Text, Type) entities per review; the deterministic stand-in is
# a typed lexicon (case-insensitive) plus a Capitalized-word heuristic
# typed OTHER. Both legs are SQL-expressible for the oracle harness.
ENTITY_LEXICON: dict[str, str] = {
    "spark": "ORGANIZATION",
    "redis": "ORGANIZATION",
    "amazon": "ORGANIZATION",
    "mixup": "ORGANIZATION",
    "apple": "ORGANIZATION",
    "sony": "ORGANIZATION",
    "juan": "PERSON",
    "ana": "PERSON",
    "customer": "PERSON",
    "mexico": "LOCATION",
    "madrid": "LOCATION",
    "enero": "DATE",
    "febrero": "DATE",
}
_CAP_RE = "^[A-Z][a-z]+$"


def _case_tokens(col):
    """Case-preserving ASCII-alphabetic tokens (entity surface forms).
    Accented characters split tokens ('José' -> 'Jos') — a deliberate
    stub simplification kept bit-identical on the DuckDB oracle side,
    which uses the same ASCII classes."""
    return F.filter(F.split(col, r"[^A-Za-z]+"), lambda t: t != "")


def _etype_of(tok) -> "F.Column":
    expr = None
    for word, etype in ENTITY_LEXICON.items():
        cond = F.lower(tok) == word
        expr = F.when(cond, etype) if expr is None else expr.when(cond, etype)
    return expr.otherwise("OTHER")


def extract_entities(col) -> "F.Column":
    """array<struct<entity,etype>>: distinct lexicon hits (typed) and
    Capitalized words (OTHER), sorted by surface form."""
    lex = list(ENTITY_LEXICON)
    cand = F.array_sort(
        F.array_distinct(
            F.filter(
                _case_tokens(col),
                lambda t: F.lower(t).isin(*lex) | t.rlike(_CAP_RE),
            )
        )
    )
    return F.transform(
        cand, lambda t: F.struct(t.alias("entity"), _etype_of(t).alias("etype"))
    )


def entities_exploded(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, entity, etype) — one row per distinct entity per document."""
    return (
        df.select(id_col, F.explode(extract_entities(F.col(text_col))).alias("e"))
        .select(id_col, F.col("e.entity").alias("entity"), F.col("e.etype").alias("etype"))
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
            # the per-comment DetectEntities twin (analyzer.go:57-64):
            # surface forms only, as the commentAnalysis.entities leg
            F.transform(extract_entities(F.col("r.content")), lambda e: e["entity"]).alias("ents"),
        )
    )
    return exploded.groupBy("id").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("label").alias("v")))
            )
        ).alias("comment_labels"),
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("ents").alias("v")))
            )
        ).alias("comment_entities"),
        F.round(F.avg("score"), 6).alias("mean_score"),
        F.count("*").alias("n_reviews"),
    )
