"""Model-based quality classification: a fastText-style linear
classifier over hashed n-gram features, trained distributively.

The third standard web-corpus quality filter alongside perplexity
(operators/quality.py) and importance resampling (operators/dsir.py):
label a trusted corpus positive and a random crawl slice negative,
train a logistic regression on hashed unigram+bigram counts, and score
every document (the GPT-3/LLaMA "quality classifier" recipe;
architecture = fastText's linear bag-of-n-grams, Joulin et al. 2017).

Distributed shape:
 - Features reuse `dsir.hashed_ngram_features` (xxhash64 pmod B — the
   model is exactly B+1 floats, independent of corpus size). The
   exploded (doc, bucket) table is cached once; it is the only
   corpus-scale artifact and every iteration reuses it.
 - One full-batch gradient-descent iteration = two aggregations:
   margins (features ⋈ broadcast weights → per-doc sum) and gradients
   (per-doc residual joined back → per-bucket sum). The weight vector
   itself lives driver-side as a numpy array — B ≤ 10^6, metadata-
   scale — and re-enters the plan as a small createDataFrame each
   round, never as a giant literal expression.
 - Full-batch GD with w₀ = 0 and no RNG: training is deterministic on
   any cluster size / partition layout, and the pure-numpy reference
   in tests reproduces the trajectory exactly (sums are
   order-independent up to float addition order; tests use tolerances).

Loss: mean logistic loss + (l2/2)·‖w‖² (bias unregularized);
update: w ← w − lr·( (1/n)·Σ_d (σ(margin_d) − y_d)·x_d + l2·w ).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .dsir import hashed_ngram_features

__all__ = ["LinearQualityModel", "train_quality_classifier", "classifier_score"]

_BIAS = -1  # bias pseudo-bucket: one occurrence per doc


@dataclass
class LinearQualityModel:
    weights: np.ndarray  # shape (buckets,), index = bucket id
    bias: float
    buckets: int


def _doc_features(docs: DataFrame, id_col: str, text_col: str,
                  buckets: int, hash_fn: str = "xxhash64") -> DataFrame:
    """(id, bucket, x): per-doc feature counts + the bias row. Count
    features (not binary) — fastText's bag-of-n-grams with sum pooling."""
    feats = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.concat(
                hashed_ngram_features(F.col(text_col), buckets, hash_fn),
                F.array(F.lit(_BIAS).cast("long")),  # bias for every doc
            )
        ).alias("b"),
    )
    return feats.groupBy("_id", "b").agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )


def _weights_df(spark, w: np.ndarray, bias: float) -> DataFrame:
    rows = [(int(b), float(v)) for b, v in enumerate(w) if v != 0.0]
    rows.append((_BIAS, float(bias)))
    return F.broadcast(spark.createDataFrame(rows, "b long, w double"))


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    buckets: int = 10_000,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> LinearQualityModel:
    """Fit the classifier: positives get label 1, negatives 0.

    Doc ids need only be unique WITHIN each input (labels are attached
    before the union). Returns the trained model; per iteration the
    driver runs one gradient collect of ≤ buckets+1 rows.
    """
    spark = positives.sparkSession
    labeled = positives.select(
        F.concat(F.lit("p:"), F.col(id_col).cast("string")).alias(id_col),
        F.col(text_col), F.lit(1.0).alias("_y"),
    ).unionByName(
        negatives.select(
            F.concat(F.lit("n:"), F.col(id_col).cast("string")).alias(id_col),
            F.col(text_col), F.lit(0.0).alias("_y"),
        )
    )
    feats = _doc_features(labeled, id_col, text_col, buckets, hash_fn).join(
        labeled.select(F.col(id_col).alias("_id"), "_y"), "_id"
    ).cache()
    n_docs = feats.select("_id").distinct().count()
    if n_docs == 0:
        raise ValueError("train_quality_classifier: no training documents")

    w = np.zeros(buckets, dtype=np.float64)
    bias = 0.0
    for _ in range(iters):
        wdf = _weights_df(spark, w, bias)
        margins = (
            feats.join(wdf, "b", "left")
            .groupBy("_id", "_y")
            .agg(F.sum(F.col("x") * F.coalesce("w", F.lit(0.0))).alias("m"))
        )
        resid = margins.select(
            "_id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))) - F.col("_y")).alias(
                "r"
            ),
        )
        grad_rows = (
            feats.join(resid, "_id")
            .groupBy("b")
            .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
            .collect()
        )
        grad = np.zeros(buckets, dtype=np.float64)
        gbias = 0.0
        for row in grad_rows:
            if row["b"] == _BIAS:
                gbias = row["g"]
            else:
                grad[row["b"]] = row["g"]
        w -= lr * (grad / n_docs + l2 * w)
        bias -= lr * (gbias / n_docs)
    feats.unpersist()
    return LinearQualityModel(w, bias, buckets)


def classifier_score(
    docs: DataFrame,
    model: LinearQualityModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id_col, score): σ(w·x + b) ∈ (0,1), higher = more positive-like.
    Docs with no tokens score σ(bias) — the prior."""
    spark = docs.sparkSession
    wdf = _weights_df(spark, model.weights, model.bias)
    feats = _doc_features(docs, id_col, text_col, model.buckets, hash_fn)
    return (
        feats.join(wdf, "b", "left")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(-F.sum(F.col("x") * F.coalesce("w", F.lit(0.0))))
                )
            ).alias("score")
        )
    )
