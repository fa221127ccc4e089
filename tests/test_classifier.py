"""fastText-style quality classifier vs an independent numpy reference
running the identical full-batch GD trajectory (only the xxhash64
gram->bucket primitive is shared, same pattern as the DSIR test)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gocrawler_spark.operators.classifier import (
    classifier_score, train_quality_classifier,
)

POS = [
    (0, "the history of the roman empire spans centuries"),
    (1, "a detailed study of medieval trade routes"),
    (2, "the empire declined over centuries of history"),
]
NEG = [
    (0, "buy cheap pills online now click here"),
    (1, "win money now cheap pills click"),
    (2, "cheap cheap buy buy click win"),
]
BUCKETS = 256


def _grams(text):
    toks = [w for w in text.lower().split() if w]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket_map(spark, texts):
    grams = sorted({g for t in texts for g in _grams(t)})
    df = spark.createDataFrame([(g,) for g in grams], "g string").select(
        "g", F.pmod(F.xxhash64("g"), F.lit(BUCKETS)).alias("b")
    )
    return {r["g"]: r["b"] for r in df.collect()}


def _ref_train(bmap, iters, lr, l2=0.0):
    """Numpy reference: same counts-features, same update rule."""
    X, y = [], []
    for _, t in POS:
        X.append(_grams(t)), y.append(1.0)
    for _, t in NEG:
        X.append(_grams(t)), y.append(0.0)
    n = len(X)
    counts = []
    for grams in X:
        c = np.zeros(BUCKETS)
        for g in grams:
            c[bmap[g]] += 1.0
        counts.append(c)
    M = np.stack(counts)
    y = np.array(y)
    w = np.zeros(BUCKETS)
    b = 0.0
    for _ in range(iters):
        m = M @ w + b
        r = 1.0 / (1.0 + np.exp(-m)) - y
        w -= lr * ((M.T @ r) / n + l2 * w)
        b -= lr * (r.sum() / n)
    return w, b


def test_classifier_matches_numpy_reference(spark):
    pos = spark.createDataFrame(POS, "doc_id long, text string")
    neg = spark.createDataFrame(NEG, "doc_id long, text string")
    model = train_quality_classifier(
        pos, neg, buckets=BUCKETS, iters=15, lr=0.5, l2=0.01
    )
    bmap = _bucket_map(spark, [t for _, t in POS + NEG])
    ref_w, ref_b = _ref_train(bmap, iters=15, lr=0.5, l2=0.01)
    assert model.bias == pytest.approx(ref_b, abs=1e-9)
    np.testing.assert_allclose(model.weights, ref_w, atol=1e-9)


def test_classifier_separates_and_scores(spark):
    pos = spark.createDataFrame(POS, "doc_id long, text string")
    neg = spark.createDataFrame(NEG, "doc_id long, text string")
    model = train_quality_classifier(pos, neg, buckets=BUCKETS, iters=30, lr=1.0)
    to_score = spark.createDataFrame(
        [(10, "the history of trade in the roman empire"),
         (11, "cheap pills click now"),
         (12, "")],
        "doc_id long, text string",
    )
    scored = classifier_score(to_score, model)
    got = {r["doc_id"]: r["score"] for r in scored.collect()}
    assert got[10] > 0.5 > got[11]          # wiki-like vs spam-like
    assert got[12] == pytest.approx(        # empty doc = prior
        1.0 / (1.0 + math.exp(-model.bias)), abs=1e-12
    )
    # training docs fully separated after 30 rounds on separable data
    train_scores = classifier_score(
        pos.unionByName(neg.withColumn("doc_id", F.col("doc_id") + 100)), model
    ).collect()
    by_id = {r["doc_id"]: r["score"] for r in train_scores}
    assert min(by_id[i] for i, _ in POS) > max(by_id[i + 100] for i, _ in NEG)


def test_classifier_score_plan_is_jvm(spark):
    pos = spark.createDataFrame(POS, "doc_id long, text string")
    neg = spark.createDataFrame(NEG, "doc_id long, text string")
    model = train_quality_classifier(pos, neg, buckets=BUCKETS, iters=2)
    scored = classifier_score(pos, model)
    scored.collect()
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def _md5_bucket(g: str) -> int:
    import hashlib

    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % BUCKETS


def test_classifier_md5_path_matches_hashlib_reference(spark):
    """hash_fn="md5" (the q67-oracle portable hash) trains the same
    trajectory as a reference whose bucket map comes from hashlib.md5
    directly — unlike the xxhash64 test, NO primitive is shared with
    Spark, so this pins both the hash portability and the GD math."""
    pos = spark.createDataFrame(POS, "doc_id long, text string")
    neg = spark.createDataFrame(NEG, "doc_id long, text string")
    model = train_quality_classifier(
        pos, neg, buckets=BUCKETS, iters=15, lr=0.5, l2=0.01, hash_fn="md5"
    )
    bmap = {
        g: _md5_bucket(g)
        for t in [t for _, t in POS + NEG]
        for g in _grams(t)
    }
    ref_w, ref_b = _ref_train(bmap, iters=15, lr=0.5, l2=0.01)
    assert model.bias == pytest.approx(ref_b, abs=1e-9)
    np.testing.assert_allclose(model.weights, ref_w, atol=1e-9)
