"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023).

Pretraining-data selection: given a huge *raw* crawl corpus and a small
*target* corpus (the distribution you want — e.g. Wikipedia+books),
weight every raw document by how much more likely its hashed-n-gram
features are under the target distribution than under the raw one, then
sample without replacement proportionally to those weights. The paper's
pipeline maps one-to-one onto DataFrame built-ins:

 1. **Features** — unigrams + bigrams hashed into B buckets
    (`xxhash64 pmod B`, all inside one higher-order-function chain; no
    Python in the loop). B is a knob (paper: 10k); the model is always
    exactly B rows, independent of corpus size.
 2. **Fit** — each distribution is one groupBy count over the exploded
    feature stream + add-1 smoothing; `FeatureDist` is B rows + one
    scalar, broadcast-joined everywhere it is used.
 3. **Weights** — log importance weight of a doc is the sum over its
    feature occurrences of ln p_target(b) − ln p_raw(b): explode →
    two broadcast joins → one sum agg. Map-side partial, no skew (the
    hash spreads hot grams).
 4. **Select** — Gumbel-top-k: adding an independent Gumbel to each
    log-weight and taking the global top-k draws a weighted sample
    *without replacement* ∝ exp(weight) (the paper's resampling step).
    The Gumbel comes from md5(id:seed) → uniform, so selection is
    deterministic and partition-layout independent (same trick as
    `operators.sample`); the top-k itself is a sort-limit, which Spark
    executes as TakeOrderedAndProject — per-partition heaps, no global
    sort.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from gocrawler_spark.functions.text import tokens
from gocrawler_spark.operators.dedup import _hash64

__all__ = [
    "hashed_ngram_features", "FeatureDist", "fit_feature_dist",
    "importance_weights", "dsir_select",
]


def hashed_ngram_features(text_col, buckets: int = 10_000,
                          hash_fn: str = "xxhash64") -> "F.Column":
    """array<long> of hashed unigram+bigram bucket ids (one per
    occurrence — counts are implicit in the multiset).

    ``hash_fn="md5"`` swaps in the engine-portable 60-bit md5-prefix
    hash (``dedup._hash64``) so a DuckDB twin can recompute identical
    bucket ids — the q67 oracle's trick; ``xxhash64`` (one codegen
    intrinsic, no string materialization) stays the scale default."""
    t = tokens(text_col)
    # greatest(..., 0): an empty doc has size-1 = -1, and slice rejects
    # negative lengths outright (ANSI) rather than returning [].
    n = F.greatest(F.size(t) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(t, 1, n), F.slice(t, 2, n),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    # size-1 arrays: n = 0 -> slice len 0 -> empty bigram list (correct)
    return F.transform(
        F.concat(t, bigrams),
        lambda g: F.pmod(_hash64(g, hash_fn), F.lit(buckets)),
    )


@dataclass
class FeatureDist:
    """Add-1-smoothed categorical over the B hash buckets.

    `logp` holds (bucket, logp) for buckets seen in the fit corpus;
    `logp_unseen` = ln(1 / (total + B)) covers the rest, so probabilities
    sum to 1 over all B buckets exactly.
    """

    logp: DataFrame
    logp_unseen: float
    buckets: int
    _counts: DataFrame | None = None

    def unpersist(self) -> None:
        """Release the cached bucket-count table backing `logp`."""
        if self._counts is not None:
            self._counts.unpersist()


def fit_feature_dist(corpus: DataFrame, text_col: str = "text",
                     buckets: int = 10_000,
                     hash_fn: str = "xxhash64") -> FeatureDist:
    """One groupBy over the exploded feature stream; ≤ B result rows."""
    feats = corpus.select(
        F.explode(
            hashed_ngram_features(F.col(text_col), buckets, hash_fn)
        ).alias("b")
    )
    # ≤ B rows — cache so the total probe and the weight joins share one
    # corpus scan.
    counts = feats.groupBy("b").agg(F.count(F.lit(1)).alias("c")).cache()
    total = counts.agg(F.sum("c")).collect()[0][0] or 0
    denom = float(total + buckets)
    logp = counts.select("b", F.log((F.col("c") + 1) / denom).alias("lp"))
    return FeatureDist(logp, math.log(1.0 / denom), buckets, counts)


def importance_weights(docs: DataFrame, target: FeatureDist,
                       raw: FeatureDist, id_col: str = "doc_id",
                       text_col: str = "text",
                       hash_fn: str = "xxhash64") -> DataFrame:
    """(id_col, n_feats, log_weight): sum over the doc's feature
    occurrences of ln p_target − ln p_raw. Feature-less docs keep their
    row with log_weight 0.0 (they carry no evidence either way)."""
    if target.buckets != raw.buckets:
        raise ValueError(
            f"bucket mismatch: target {target.buckets} vs raw {raw.buckets}"
        )
    feats = docs.select(
        F.col(id_col),
        F.explode_outer(
            hashed_ngram_features(F.col(text_col), target.buckets, hash_fn)
        ).alias("b"),
    )
    t = F.broadcast(target.logp.withColumnRenamed("lp", "lp_t"))
    r = F.broadcast(raw.logp.withColumnRenamed("lp", "lp_r"))
    llr = (
        feats.join(t, ["b"], "left").join(r, ["b"], "left")
        .select(
            id_col,
            F.when(
                F.col("b").isNotNull(),
                F.coalesce("lp_t", F.lit(target.logp_unseen))
                - F.coalesce("lp_r", F.lit(raw.logp_unseen)),
            ).alias("llr"),
        )
    )
    return llr.groupBy(id_col).agg(
        F.count("llr").alias("n_feats"),
        F.coalesce(F.sum("llr"), F.lit(0.0)).alias("log_weight"),
    )


def dsir_select(weighted: DataFrame, n: int, seed: str = "0",
                id_col: str = "doc_id",
                weight_col: str = "log_weight") -> DataFrame:
    """Gumbel-top-k: a deterministic weighted sample of n docs without
    replacement, P(doc in sample) increasing in its log-weight.

    gumbel = −ln(−ln u) with u ∈ (0,1) from the first 15 hex digits of
    md5(id ':' seed) — content-derived, so the draw is reproducible on
    any partition layout and `seed` indexes independent draws. The
    ordering executes as TakeOrderedAndProject (per-partition top-n
    heaps), never a full sort.
    """
    # (x+1)/(16^15+1) keeps u strictly inside (0,1): ln(u) and ln(-ln u)
    # both stay finite even at the hash extremes.
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                                  F.lit(seed))), 1, 15),
            16, 10,
        ).cast("double") + 1.0
    ) / float(16 ** 15 + 1)
    key = F.col(weight_col) + (-F.log(-F.log(u)))
    return (
        weighted.withColumn("_gumbel_key", key)
        .orderBy(F.col("_gumbel_key").desc(), F.col(id_col))
        .limit(n)
        .drop("_gumbel_key")
    )
