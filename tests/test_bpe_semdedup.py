"""Distributed BPE training vs an independent pure-Python Sennrich
reference (identical tie-break + greedy-merge semantics), and SemDeDup
vs brute-force cosine pairs."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from gocrawler_spark.operators.bpe import bpe_segment, learn_bpe, word_counts
from gocrawler_spark.operators.dedup import semdedup, semdedup_pairs

CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "wide wider widest new low"),
    (3, "low low low newer"),
    (4, ""),  # empty doc
]


# ---------- independent Sennrich reference ----------

def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        c.update(w for w in t.lower().split() if w)
    return c


def _ref_merge_word(sym, a, b):
    out = []
    for s in sym:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _ref_learn_bpe(wc, n_merges, min_pair_count=2):
    vocab = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, sym in vocab.items():
            for x, y in zip(sym, sym[1:]):
                pairs[(x, y)] += wc[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        vocab = {w: _ref_merge_word(s, a, b) for w, s in vocab.items()}
    return merges, vocab


def test_learn_bpe_matches_sennrich_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wc = word_counts(docs)
    merges, vocab = learn_bpe(wc, n_merges=12)

    ref_wc = _ref_word_counts([t for _, t in CORPUS])
    ref_merges, ref_vocab = _ref_learn_bpe(ref_wc, 12)
    assert merges == ref_merges
    assert len(merges) > 3  # the planted corpus must actually train
    got_vocab = {r["word"]: (r["sym"], r["count"]) for r in vocab.collect()}
    assert set(got_vocab) == set(ref_vocab)
    for w, sym in ref_vocab.items():
        assert got_vocab[w][0] == sym, w
        assert got_vocab[w][1] == ref_wc[w]


def test_learn_bpe_stops_when_no_pair_repeats(spark):
    wc = spark.createDataFrame([("ab", 1), ("cd", 1)], "word string, count long")
    merges, vocab = learn_bpe(wc, n_merges=10, min_pair_count=2)
    assert merges == []  # every pair occurs once -> below min_pair_count
    got = {r["word"]: r["sym"] for r in vocab.collect()}
    assert got == {"ab": ["a", "b", "</w>"], "cd": ["c", "d", "</w>"]}


def test_bpe_segment_seen_and_oov(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges, vocab = learn_bpe(word_counts(docs), n_merges=12)
    to_seg = spark.createDataFrame(
        [(100, "low lowest zebra"), (101, ""), (102, "low low")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_segment(to_seg, vocab).collect()}

    ref_merges, ref_vocab = _ref_learn_bpe(
        _ref_word_counts([t for _, t in CORPUS]), 12
    )
    def ref_seg(word):
        # seen words take the trained segmentation; OOV fall back to chars
        return ref_vocab.get(word, list(word) + ["</w>"])
    assert got[100] == ref_seg("low") + ref_seg("lowest") + ref_seg("zebra")
    assert got[101] == []
    assert got[102] == ref_seg("low") * 2
    assert got[100].count("</w>") >= 1  # OOV fallback carries the marker


def test_bpe_plans_stay_jvm(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wc = word_counts(docs)
    merges, vocab = learn_bpe(wc, n_merges=3)
    seg = bpe_segment(docs, vocab)
    seg.collect()
    assert "BatchEvalPython" not in seg._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in vocab._jdf.queryExecution().executedPlan().toString()


# ---------- SemDeDup ----------

def _vec(seed, dims=8):
    # deterministic unit-ish vector
    return [math.sin(seed * (i + 1) * 0.7) + 0.01 * i for i in range(dims)]


def _cos(u, v):
    d = sum(a * b for a, b in zip(u, v))
    return d / (math.sqrt(sum(a * a for a in u)) * math.sqrt(sum(b * b for b in v)))


def test_semdedup_matches_bruteforce_pairs(spark):
    # two far-apart groups; inside each, planted near-identical vectors
    base_a, base_b = _vec(1), _vec(9)
    vecs = {
        0: base_a,
        1: [x + 1e-4 for x in base_a],            # near-dup of 0
        2: [x * 1.0001 for x in base_a],          # near-dup of 0 and 1
        3: base_b,
        4: [x + 1e-4 for x in base_b],            # near-dup of 3
        5: _vec(5),                               # unique
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "doc_id long, embedding array<double>"
    )
    # n_clusters=2: deterministic_centroids seeds by md5(vec_id) order —
    # md5("4") < md5("1") < the rest — one seed per planted group, so
    # k-means keeps the groups intact and within-group recall is exact.
    # (With n_clusters=3 all three seeds land inside group A and the
    # near-dup group straddles cells — the boundary recall loss the
    # SemDeDup paper accepts by using large cells.)
    got = {(r["a"], r["b"]) for r in
           semdedup_pairs(emb, n_clusters=2, threshold=0.999).collect()}
    want_all = {
        (i, j)
        for i in vecs for j in vecs
        if i < j and _cos(vecs[i], vecs[j]) >= 0.999
    }
    # exact: every brute-force pair is within-group, groups share a cell
    assert got == want_all
    assert {(0, 1), (0, 2), (1, 2), (3, 4)} <= got

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in vecs], "doc_id long, text string"
    )
    kept = sorted(r["doc_id"] for r in
                  semdedup(docs, emb, n_clusters=2, threshold=0.999).collect())
    assert kept == [0, 3, 5]  # min-id canonical per component

def test_blocked_cell_pairs_bounds_per_task_input(spark):
    # Planted skew: 200 of 210 vectors in one cell. The triangle-blocked
    # self-join must emit exactly the naive pair set while no hash block
    # (the per-task join input) holds more than ~cap rows.
    from pyspark.sql import functions as F

    from gocrawler_spark.operators.dedup import _blocked_cell_pairs

    n_big, n_small, cap = 200, 10, 32
    rows = [(i, [1.0, float(i % 7)], 0) for i in range(n_big)]
    rows += [(1000 + i, [1.0, float(i)], 1) for i in range(n_small)]
    assigned = spark.createDataFrame(
        rows, "_id long, _v array<double>, centroid_id int"
    )
    pairs = _blocked_cell_pairs(assigned, cap).select("a", "b").collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert len(got) == len(pairs)  # every unordered pair exactly once
    want = {(i, j) for i in range(n_big) for j in range(n_big) if i < j}
    want |= {
        (1000 + i, 1000 + j)
        for i in range(n_small)
        for j in range(n_small)
        if i < j
    }
    assert got == want
    # the guard really fans out: the big cell splits into g blocks and
    # hash-uniform assignment keeps each block well under 2x the cap
    g = math.ceil(n_big / cap)
    assert g > 1
    blk = F.pmod(F.xxhash64("_id"), F.lit(g)).cast("int")
    sizes = (
        assigned.where("centroid_id = 0")
        .select(blk.alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    assert len(sizes) == g
    assert max(r["count"] for r in sizes) <= 2 * cap


def test_semdedup_cell_cap_matches_unguarded_on_skewed_corpus(spark):
    # >=80% of vectors collapse into one k-means cell (the SemDeDup
    # worst case); the capped path must return the identical pair set.
    base = _vec(3)
    vecs = {i: [x * (1 + 1e-6 * i) for x in base] for i in range(100)}
    for i in range(100, 120):
        vecs[i] = _vec(i)
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "doc_id long, embedding array<double>"
    )
    kw = dict(n_clusters=4, threshold=0.999)
    guarded = {
        (r["a"], r["b"], round(r["cos"], 9), r["centroid_id"])
        for r in semdedup_pairs(emb, cell_cap=16, **kw).collect()
    }
    bare = {
        (r["a"], r["b"], round(r["cos"], 9), r["centroid_id"])
        for r in semdedup_pairs(emb, cell_cap=None, **kw).collect()
    }
    assert guarded == bare
    dense = {(i, j) for i in range(100) for j in range(100) if i < j}
    assert dense <= {(a, b) for a, b, _, _ in guarded}


# ---------- batched merges (fastBPE trick, made exact) ----------

BIG_CORPUS = [
    (i, " ".join(
        w for j in range(6)
        for w in ("alpha bravo charlie delta echo foxtrot golf hotel "
                  "india juliet kilo lima mike november oscar papa "
                  "quebec romeo sierra tango uniform victor whiskey "
                  "xray yankee zulu").split()[(i + j) % 26: (i + j) % 26 + 7]
    ))
    for i in range(40)
]


def test_batched_bpe_identical_to_sequential_and_reference(spark):
    """batch_max>1 must give the bit-identical merge SEQUENCE (not just
    set) as one-at-a-time greedy AND the pure-Python Sennrich reference,
    in strictly fewer driver-synchronous passes."""
    docs = spark.createDataFrame(BIG_CORPUS, "doc_id long, text string")
    wc = word_counts(docs).localCheckpoint()
    n = 48
    seq_stats, bat_stats = {}, {}
    seq_merges, seq_vocab = learn_bpe(wc, n_merges=n, batch_max=1, stats=seq_stats)
    bat_merges, bat_vocab = learn_bpe(wc, n_merges=n, batch_max=16, stats=bat_stats)
    assert bat_merges == seq_merges and len(seq_merges) == n
    ref_merges, ref_vocab = _ref_learn_bpe(
        _ref_word_counts([t for _, t in BIG_CORPUS]), n
    )
    assert bat_merges == ref_merges
    got = {r["word"]: r["sym"] for r in bat_vocab.collect()}
    for w, sym in ref_vocab.items():
        assert got[w] == sym, w
    # the whole point: fewer driver-synchronous passes. Exact greedy
    # BPE is partly chain-sequential (each merge's product is often the
    # next argmax, so no batch can contain it) — the win is bounded by
    # the corpus's chain structure, hence < 3/4 here rather than 1/16.
    assert seq_stats["passes"] == n
    assert bat_stats["passes"] < 0.75 * n


def test_batched_bpe_chained_merges_stay_exact(spark):
    """A corpus engineered so the top pairs CHAIN (each merge's product
    feeds the next-best pair): the batch selector must shrink to one
    merge per pass rather than mis-order, and still match the
    reference."""
    rows = [(0, "a b c d " * 50), (1, "a b " * 30), (2, "x y " * 20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {}
    merges, _ = learn_bpe(word_counts(docs), n_merges=6, batch_max=16, stats=stats)
    ref_merges, _ = _ref_learn_bpe(
        _ref_word_counts([t for _, t in rows]), 6
    )
    assert merges == ref_merges


def test_q66_sql_replay_matches_learn_bpe_on_repeated_symbols(spark):
    """The q66 oracle re-runs BPE training in DuckDB; its greedy-
    rewrite SQL (run-island parity over match positions) must equal the
    JVM fold exactly on the corpus class where they can diverge —
    repeated-symbol runs, where merge sites overlap and greedy
    left-to-right non-overlap is load-bearing. The gate corpus may not
    exercise this, so pin it here on a planted battery that trains
    merges like (a,a) -> (aa,aa) and (an,an)."""
    import duckdb

    import __spark_entry__ as entry

    texts = [
        "aaaaaa aaaa aa baba abab bbbb",
        "aaaaaa aaaa abab banana bananana",
        "xxyxxyxxy xyxy yy yy xx aaaaaa",
        "mississippi mississippi banana aaaa",
        "aaaaaa bbbb xyxy mississippi aa",
    ]
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") t(doc_id, text)"
    )
    duck = sorted(tuple(r) for r in con.sql(entry._q66_oracle()).fetchall())

    d = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges, vocab = learn_bpe(word_counts(d), n_merges=entry._Q66_MERGES)
    got = sorted(
        tuple(r)
        for r in vocab.select(
            "word",
            F.array_join("sym", " ").alias("segmentation"),
            F.size("sym").alias("n_syms"),
            "count",
        ).collect()
    )
    # the battery must actually hit the overlap cases
    assert ("a", "a") in merges and ("aa", "aa") in merges
    assert duck == got
