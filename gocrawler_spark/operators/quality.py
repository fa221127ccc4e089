"""CCNet-style perplexity quality filtering (Wenzek et al. 2020).

CCNet scores every document with a language model trained on a trusted
corpus (Wikipedia) and splits the crawl into head/middle/tail perplexity
terciles; the tail is dropped or down-weighted before pretraining. KenLM
is not in this sandbox, so the LM here is an add-k smoothed *bigram*
model — the smallest model with real context — trained and scored
entirely with DataFrame built-ins, which is the part that has to be
right at 100 TB:

 - **Training is two groupBy counts.** Bigram counts c(w1,w2) and
   context counts c(w1) are map-side-partial aggregations over the
   exploded token stream; the model size is bounded by the distinct
   bigram count of the *trusted* corpus (Wikipedia-scale, not
   crawl-scale), so the scoring join's build side is small relative to
   the data being scored.
 - **Scoring is explode → join → agg.** Each document's bigrams left-
   join the model; unseen bigrams back off to the smoothed per-context
   mass and unseen contexts to 1/V. No UDFs anywhere — the whole plan
   is whole-stage-codegen eligible, and AQE broadcasts the model when
   it fits.
 - **Bucketing uses approxQuantile thresholds** (two driver scalars),
   not a global sort: the same pattern as `graph.rank_priorities`.

Model semantics (the test reference mirrors these exactly):
 - tokens: lowercase whitespace split (`functions.text.tokens`);
 - each doc contributes bigrams over ``["<s>"] + tokens`` (a 1-token
   doc yields one bigram; an empty doc yields none and scores NULL);
 - V = distinct training tokens + 1 (one shared unseen type);
 - p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V), with c(·)=0 when unseen;
 - ppl(doc) = exp(mean over its bigrams of −ln p).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from gocrawler_spark.functions.text import tokens

__all__ = ["BigramLM", "train_bigram_lm", "perplexity", "ccnet_buckets"]

_BOS = "<s>"


def _doc_bigrams(text_col) -> "F.Column":
    """array<struct<w1,w2>> of the doc's bigrams over <s>-prefixed tokens."""
    p = F.concat(F.array(F.lit(_BOS)), tokens(text_col))
    n = F.size(p) - 1
    return F.zip_with(
        F.slice(p, 1, n),
        F.slice(p, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


@dataclass
class BigramLM:
    """A trained model: two small DataFrames + scalars.

    `bigram_logp` (w1, w2, logp) carries the seen-bigram log-probs;
    `context_logp` (w1, ctx_logp_unseen) the per-context backoff for
    unseen continuations; `logp_oov` the fully-unseen scalar ln(1/V).
    """

    bigram_logp: DataFrame
    context_logp: DataFrame
    vocab_size: int
    k: float
    logp_oov: float
    _counts: DataFrame | None = None
    # distinct bigram count, probed at fit time: lets `perplexity` make
    # the broadcast decision from the TRUE model size instead of
    # Catalyst's estimate for a post-aggregation subtree (guide §3.1:
    # "estimates are often badly wrong after filters or UDFs — use an
    # explicit broadcast when you know a side is small"). None = unknown
    # (hand-built models): the joins stay planner-chosen.
    n_entries: int | None = None

    def unpersist(self) -> None:
        """Release the cached bigram-count table backing both model DFs."""
        if self._counts is not None:
            self._counts.unpersist()


def train_bigram_lm(corpus: DataFrame, text_col: str = "text",
                    k: float = 1.0) -> BigramLM:
    """Fit the add-k bigram model on a trusted corpus.

    ONE scan of the corpus: the bigram-count table is cached (it is
    model-sized, not corpus-sized), V is probed from it, and the
    context counts are its w1 marginal — c(w1) = Σ_w2 c(w1,w2) holds
    exactly because every gram stream position contributes one bigram.
    Call `lm.unpersist()` when done scoring.
    """
    counts = (
        corpus.select(F.explode(_doc_bigrams(F.col(text_col))).alias("g"))
        .groupBy("g.w1", "g.w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .cache()
    )
    # V over actual tokens (w2 side: <s> is never a continuation), +1
    # for the shared unseen type, and the model row count for the
    # scoring joins' broadcast gate. One aggregation over the cached
    # counts probes both (this action also materializes the cache).
    probe = counts.agg(
        F.countDistinct("w2").alias("v"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    v = probe["v"] + 1
    ctx = counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    bi = counts.join(ctx, "w1").select(
        "w1", "w2",
        F.log((F.col("c12") + k) / (F.col("c1") + k * v)).alias("logp"),
    )
    ctx_unseen = ctx.select(
        "w1", F.log(F.lit(k) / (F.col("c1") + k * v)).alias("ctx_logp_unseen")
    )
    return BigramLM(bi, ctx_unseen, v, k, math.log(1.0 / v), counts,
                    n_entries=int(probe["n"]))


def perplexity(docs: DataFrame, lm: BigramLM, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Score each doc: (id_col, n_bigrams, ppl).

    Empty docs keep their row with ppl NULL (explode_outer + null-
    skipping avg). Joins are plain equi-joins — Catalyst/AQE broadcasts
    the model side when it is small enough, which it is whenever the
    trusted corpus is much smaller than the corpus being scored.
    """
    grams = docs.select(
        F.col(id_col),
        F.explode_outer(_doc_bigrams(F.col(text_col))).alias("g"),
    ).select(id_col, "g.w1", "g.w2")
    # broadcast the model when its TRUE fit-time row count says it fits
    # (guide §3.1): Catalyst's size estimate for the aggregated/joined
    # model subtree is corpus-derived and routinely overshoots, falling
    # back to sort-merge — which shuffles the corpus-sized gram stream
    # twice for a model-sized build side. 4M entries ≈ low hundreds of
    # MB built; bigger models keep the planner's choice (scale-safe).
    bi, ctx = lm.bigram_logp, lm.context_logp
    if lm.n_entries is not None and lm.n_entries <= 4_000_000:
        bi, ctx = F.broadcast(bi), F.broadcast(ctx)
    scored = (
        grams.join(bi, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .select(
            id_col,
            F.when(
                F.col("w1").isNotNull(),
                F.coalesce("logp", "ctx_logp_unseen", F.lit(lm.logp_oov)),
            ).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("lp").alias("n_bigrams"),
        F.exp(-F.avg("lp")).alias("ppl"),
    )


def ccnet_buckets(scored: DataFrame, ppl_col: str = "ppl",
                  probs: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
                  relative_error: float = 0.001) -> DataFrame:
    """Label rows head/middle/tail by perplexity terciles (CCNet §4.3).

    head = lowest perplexity (most fluent). Thresholds come from
    approxQuantile — two driver scalars, no global sort; rows with NULL
    perplexity get a NULL bucket.
    """
    lo, hi = scored.approxQuantile(ppl_col, list(probs), relative_error)
    c = F.col(ppl_col)
    return scored.withColumn(
        "ppl_bucket",
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c <= lo, F.lit("head"))
        .when(c <= hi, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
