"""CCNet-style perplexity filter + DSIR importance resampling vs
independent driver-side references (pure-Python LM math; Spark is used
only to obtain the xxhash64 gram->bucket mapping for DSIR, everything
downstream of the hash is recomputed independently)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from gocrawler_spark.operators.dsir import (
    dsir_select, fit_feature_dist, hashed_ngram_features, importance_weights,
)
from gocrawler_spark.operators.quality import (
    ccnet_buckets, perplexity, train_bigram_lm,
)

TRAIN = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a cat and a dog"),
    (3, "the cat and the dog sat"),
]
SCORE = [
    (10, "the cat sat"),          # fluent under TRAIN
    (11, "zebra quux flurble"),   # all-OOV
    (12, "mat"),                  # single token: one (<s>, mat) bigram
    (13, ""),                     # empty: NULL ppl
    (14, "the dog"),
]


def _ref_bigram_lm(texts, k=1.0):
    """Independent reference: same semantics as quality.train_bigram_lm."""
    bi, ctx, vocab = Counter(), Counter(), set()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        vocab.update(toks)
        seq = ["<s>"] + toks
        for a, b in zip(seq, seq[1:]):
            bi[(a, b)] += 1
            ctx[a] += 1
    v = len(vocab) + 1
    return bi, ctx, v, k


def _ref_ppl(text, model):
    bi, ctx, v, k = model
    toks = [w for w in text.lower().split() if w]
    if not toks:
        return None
    seq = ["<s>"] + toks
    lps = [
        math.log((bi.get((a, b), 0) + k) / (ctx.get(a, 0) + k * v))
        for a, b in zip(seq, seq[1:])
    ]
    return math.exp(-sum(lps) / len(lps))


def test_perplexity_matches_reference(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    lm = train_bigram_lm(train, k=0.5)
    got = {r["doc_id"]: (r["n_bigrams"], r["ppl"])
           for r in perplexity(score, lm).collect()}
    ref = _ref_bigram_lm([t for _, t in TRAIN], k=0.5)
    assert set(got) == {10, 11, 12, 13, 14}  # empty doc keeps its row
    for doc_id, text in SCORE:
        n, ppl = got[doc_id]
        want = _ref_ppl(text, ref)
        if want is None:
            assert n == 0 and ppl is None
        else:
            assert n == len(text.split())
            assert ppl == pytest.approx(want, rel=1e-9)
    # fluent text scores far lower than all-OOV text
    assert got[10][1] < got[11][1]


def test_perplexity_plan_is_jvm_only(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    scored = perplexity(score, train_bigram_lm(train))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_ccnet_buckets(spark):
    rows = [(i, float(i)) for i in range(1, 10)] + [(99, None)]
    scored = spark.createDataFrame(rows, "doc_id long, ppl double")
    got = {r["doc_id"]: r["ppl_bucket"]
           for r in ccnet_buckets(scored).collect()}
    assert got[99] is None
    # terciles of 1..9: head <= ~3, tail > ~6; exact cut from approxQuantile
    assert got[1] == "head" and got[9] == "tail"
    order = {"head": 0, "middle": 1, "tail": 2}
    labels = [got[i] for i in range(1, 10)]
    assert [order[x] for x in labels] == sorted(order[x] for x in labels)
    assert set(labels) == {"head", "middle", "tail"}


RAW = [
    (0, "buy cheap pills online now"),
    (1, "click here to win money now"),
    (2, "the history of the roman empire"),
    (3, "buy cheap watches online"),
    (4, ""),
]
TARGET = [
    (100, "the history of the roman empire spans centuries"),
    (101, "the empire declined over many centuries of history"),
]
BUCKETS = 64


def _grams(text):
    toks = [w for w in text.lower().split() if w]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket_map(spark, texts):
    """gram -> bucket via Spark's own xxhash64 (the one primitive the
    reference borrows; all distribution math is recomputed in Python)."""
    grams = sorted({g for t in texts for g in _grams(t)})
    if not grams:
        return {}
    df = spark.createDataFrame([(g,) for g in grams], "g string").select(
        "g", F.pmod(F.xxhash64("g"), F.lit(BUCKETS)).alias("b")
    )
    return {r["g"]: r["b"] for r in df.collect()}


def _ref_dist(texts, bmap):
    c = Counter(bmap[g] for t in texts for g in _grams(t))
    total = sum(c.values())
    denom = total + BUCKETS
    return c, denom


def _ref_weight(text, bmap, tdist, rdist):
    tc, tdenom = tdist
    rc, rdenom = rdist
    w = 0.0
    for g in _grams(text):
        b = bmap[g]
        w += math.log((tc.get(b, 0) + 1) / tdenom)
        w -= math.log((rc.get(b, 0) + 1) / rdenom)
    return w


def test_dsir_weights_match_reference(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    t_dist = fit_feature_dist(target, buckets=BUCKETS)
    r_dist = fit_feature_dist(raw, buckets=BUCKETS)
    got = {r["doc_id"]: (r["n_feats"], r["log_weight"])
           for r in importance_weights(raw, t_dist, r_dist).collect()}

    bmap = _bucket_map(spark, [t for _, t in RAW + TARGET])
    tdist = _ref_dist([t for _, t in TARGET], bmap)
    rdist = _ref_dist([t for _, t in RAW], bmap)
    for doc_id, text in RAW:
        n, w = got[doc_id]
        assert n == len(_grams(text))
        assert w == pytest.approx(_ref_weight(text, bmap, tdist, rdist),
                                  abs=1e-9)
    # empty doc: row kept, zero evidence
    assert got[4] == (0, 0.0)
    # wiki-like doc must outweigh spam under a wiki-like target
    assert got[2][1] > got[0][1] and got[2][1] > got[1][1]


def test_dsir_select_matches_reference_and_is_deterministic(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    weighted = importance_weights(
        raw, fit_feature_dist(target, buckets=BUCKETS),
        fit_feature_dist(raw, buckets=BUCKETS),
    ).cache()
    sel = dsir_select(weighted, n=2, seed="s1")
    got = sorted(r["doc_id"] for r in sel.collect())

    # independent gumbel-top-k over the (already verified) weights
    import hashlib
    rows = {r["doc_id"]: r["log_weight"] for r in weighted.collect()}
    def gumbel_key(doc_id, w):
        h = hashlib.md5(f"{doc_id}:s1".encode()).hexdigest()[:15]
        u = (int(h, 16) + 1.0) / float(16 ** 15 + 1)
        return w + -math.log(-math.log(u))
    want = sorted(sorted(rows, key=lambda d: (-gumbel_key(d, rows[d]), d))[:2])
    assert got == want
    # re-run and repartition invariance
    again = sorted(r["doc_id"]
                   for r in dsir_select(weighted.repartition(7), 2, "s1").collect())
    assert again == got
    # a different seed is allowed to (and here does not have to) differ,
    # but must still be deterministic
    s2a = sorted(r["doc_id"] for r in dsir_select(weighted, 2, "s2").collect())
    s2b = sorted(r["doc_id"] for r in dsir_select(weighted, 2, "s2").collect())
    assert s2a == s2b


def test_dsir_plan_broadcasts_model_and_stays_jvm(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    w = importance_weights(
        raw, fit_feature_dist(target, buckets=BUCKETS),
        fit_feature_dist(raw, buckets=BUCKETS),
    )
    w.collect()
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
