"""Training-data operators: dedup family, ANN, text functions,
multimodal plumbing, sentiment stub."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy cat", "en"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (3, "el gato que salta por la ventana es un gato", "es"),
        (4, "completely different words here about spark engines", "en"),
        (5, "short", "en"),
        (6, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(spark, docs):
    from gocrawler_spark.operators.dedup import exact_dedup

    out = {r["doc_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 2 collapse, representative = min id
    assert 2 not in out
    assert out[1] == 1


def test_ngram_jaccard(spark, docs):
    from gocrawler_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0
    assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0
    assert (0, 4) not in pairs


def test_ngram_jaccard_max_df_cap(spark):
    """Hot-shingle skew cap: a stopword trigram shared by EVERY doc is
    excluded from candidate generation, but jaccard values stay exact
    (intersection over all ngrams) and near-dup pairs sharing rare
    shingles are still found."""
    from gocrawler_spark.operators.dedup import ngram_jaccard_pairs

    hot = "the of and in to is that it for as"  # every doc shares these
    rows = [
        (0, f"{hot} unique alpha beta gamma delta epsilon"),
        (1, f"{hot} unique alpha beta gamma delta zeta"),  # near-dup of 0
        (2, f"{hot} totally different tail words here now"),
    ] + [(10 + i, f"{hot} filler{i} pad{i} more{i} words{i} tail{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # threshold above the hot-prefix floor (~0.42): pairs similar ONLY
    # through capped shingles can't qualify, so results must be identical
    uncapped = {(r["a"], r["b"]): r["jaccard"]
                for r in ngram_jaccard_pairs(docs, threshold=0.6).collect()}
    capped = {(r["a"], r["b"]): r["jaccard"]
              for r in ngram_jaccard_pairs(docs, threshold=0.6, max_df=3).collect()}
    assert (0, 1) in capped
    # same pairs, same exact values: capping changed cost, not results
    assert capped == uncapped


def test_ngram_jaccard_prefix_filter_equals_all(spark):
    """The default prefix-filter candidate path must return EXACTLY the
    all-pairs result — pair set and jaccard values — on a corpus with
    hot shared shingles, near-dup chains, and edge sizes. This is the
    scale-safe default q21/q46/q47 ride (VERDICT r2 'wrong #2')."""
    from gocrawler_spark.operators.dedup import ngram_jaccard_pairs

    hot = "the of and in to is that it for as"
    rows = [
        (0, f"{hot} unique alpha beta gamma delta epsilon"),
        (1, f"{hot} unique alpha beta gamma delta zeta"),
        (2, f"{hot} unique alpha beta gamma delta zeta"),  # exact dup of 1
        (3, f"{hot} totally different tail words here now"),
        (4, "tiny doc"),
        (5, ""),
    ] + [(10 + i, f"{hot} filler{i} pad{i} more{i} words{i} tail{i}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.5, 0.85):
        allp = {(r["a"], r["b"]): r["jaccard"]
                for r in ngram_jaccard_pairs(docs, threshold=t, candidates="all").collect()}
        pref = {(r["a"], r["b"]): r["jaccard"]
                for r in ngram_jaccard_pairs(docs, threshold=t).collect()}
        assert pref == allp, f"prefix != all at t={t}"
    assert (1, 2) in pref  # sanity: the planted dup survived


def test_ngram_jaccard_prefix_filter_on_driver_corpus(spark):
    """Same equality on the real driver fixture (sf0.001 documents) at
    the exact threshold q46/q47 use."""
    from gocrawler_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    allp = {(r["a"], r["b"]) for r in
            ngram_jaccard_pairs(docs, threshold=0.85, n=3, candidates="all").collect()}
    pref = {(r["a"], r["b"]) for r in
            ngram_jaccard_pairs(docs, threshold=0.85, n=3).collect()}
    assert pref == allp


def test_dedup_clusters_and_canonical(spark):
    """Connected components over near-dup pairs: chains collapse to one
    cluster labeled by the min id; canonical dedup keeps one doc per
    cluster plus all unpaired docs."""
    from gocrawler_spark.operators.dedup import (
        connected_components,
        dedup_keep_canonical,
    )

    # components: {1,2,3,4 via chain}, {7,9}, singletons untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 7)], "a long, b long"
    )
    cc = {r["id"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7}

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 4, 5, 7, 9)], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect()}
    assert kept == {1, 5, 7}


def test_connected_components_random_graphs(spark):
    """Min-label propagation vs a pure-Python union-find oracle on
    seeded random graphs (incl. long chains that need many hops)."""
    import random

    from gocrawler_spark.operators.dedup import connected_components

    def union_find_labels(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonicalize to min member per component
        comp = {}
        for v in list(parent):
            comp.setdefault(find(v), []).append(v)
        return {v: min(members) for r, members in comp.items() for v in members}

    rng = random.Random(42)
    cases = [
        [(i, i + 1) for i in range(25)],  # one 26-node chain (deep)
        [(rng.randrange(60), rng.randrange(60)) for _ in range(40)],
        [(rng.randrange(200), rng.randrange(200)) for _ in range(80)],
    ]
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        expected = union_find_labels(edges)
        pairs = spark.createDataFrame(edges, "a long, b long")
        got = {r["id"]: r["cluster"] for r in connected_components(pairs).collect()}
        assert got == expected


def test_minhash_lsh_agrees_with_exact(spark, docs):
    from gocrawler_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {(r["a"], r["b"]) for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    lsh = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # verification step makes LSH precision exact; recall on trivial dups
    assert lsh <= exact
    assert (0, 2) in lsh  # identical docs always share all bands


def test_simhash_near_pairs(spark, docs):
    from gocrawler_spark.operators.dedup import simhash, simhash_near_pairs

    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[0] == sh[2]  # identical text -> identical simhash
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_pairs(docs, 10).collect()}
    assert pairs[(0, 2)] == 0


def test_sketches_md5_hash_path(spark, docs):
    """The md5 hash_fn (q22's oracle-portable variant) must find the
    planted identical pair through both sketches, and the md5 token
    hash must stay within 60 bits (the engine-portable range)."""
    from gocrawler_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash,
        simhash_near_pairs,
    )

    lsh = {(r["a"], r["b"]) for r in
           minhash_lsh_pairs(docs, threshold=0.5, hash_fn="md5").collect()}
    assert (0, 2) in lsh  # identical docs share all bands under any hash
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs, hash_fn="md5").collect()}
    assert sh[0] == sh[2]
    assert all(0 <= v < (1 << 60) for v in sh.values())
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in simhash_near_pairs(docs, 10, hash_fn="md5").collect()}
    assert pairs[(0, 2)] == 0


def test_simhash_pairs_recall_guarantee(spark):
    """Round-1 bug regression: a hamming-8 pair whose differing bits are
    spread 2-per-16-bit-chunk shares NO chunk under the old fixed 4x16
    blocking and was silently dropped. With chunks derived from
    max_hamming (pigeonhole: h+1 chunks), it must be found."""
    from gocrawler_spark.operators.dedup import simhash_pairs_from_hashes

    base = 0x123456789ABCDE5
    # flip 2 bits inside each of the old 16-bit chunks (offsets 0/16/32/48)
    diff = (0b11) | (0b11 << 16) | (0b11 << 32) | (0b11 << 48)
    other = base ^ diff
    assert bin(diff).count("1") == 8
    sh = spark.createDataFrame(
        [(0, base), (1, other), (2, 0x7FFFFFFFFFFFFFF ^ base)],
        "doc_id long, simhash long",
    )
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in simhash_pairs_from_hashes(sh, max_hamming=8).collect()}
    assert pairs == {(0, 1): 8}

    # tighter budget excludes the pair again (verification, not blocking)
    assert simhash_pairs_from_hashes(sh, max_hamming=7).count() == 0

    with pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs_from_hashes(sh, max_hamming=17)


def test_embedding_ann(spark):
    import numpy as np

    from gocrawler_spark.operators.similarity import (
        cosine_topk_bruteforce,
        deterministic_centroids,
        ivf_assign,
        ivf_topk,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(40, 64)
    rows = [(i, (base[i] / np.linalg.norm(base[i])).tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id < 3").select(F.col("vec_id").alias("q_id"), "embedding")
    corpus = emb.filter("vec_id >= 3")

    bf = cosine_topk_bruteforce(corpus, queries, k=3)
    got = {(r["q_id"], r["rank"]): r["vec_id"] for r in bf.collect()}
    assert len(got) == 9

    cents = deterministic_centroids(corpus, 4)
    assigned = ivf_assign(corpus, cents)
    ivf = ivf_topk(assigned, cents, queries, k=3, nprobe=4)  # nprobe=all -> exact
    ivf_got = {(r["q_id"], r["rank"]): r["vec_id"] for r in ivf.collect()}
    assert ivf_got == got  # probing all cells must equal brute force


def test_ivf_kmeans_and_index(spark, tmp_path):
    """Lloyd refinement must not worsen the quantization objective, IVF
    with refined centroids at nprobe=all stays exact, and the bucketed
    cell index prunes partitions on read."""
    import numpy as np

    from gocrawler_spark.operators.similarity import (
        cosine_topk_bruteforce,
        deterministic_centroids,
        ivf_assign,
        ivf_read_cells,
        ivf_topk,
        ivf_write_index,
        kmeans_centroids,
    )

    rng = np.random.RandomState(5)
    # 4 well-separated clusters of 15 vectors
    rows = []
    for c in range(4):
        center = rng.randn(64) * 3
        for j in range(15):
            v = center + rng.randn(64) * 0.3
            rows.append((c * 15 + j, (v / np.linalg.norm(v)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def objective(cents):
        a = ivf_assign(emb, cents)
        joined = a.join(cents, "centroid_id")
        from gocrawler_spark.operators.similarity import _dot, _norm

        sim = _dot(F.col("embedding"), F.col("centroid")) / (
            _norm(F.col("embedding")) * _norm(F.col("centroid"))
        )
        return joined.select(F.avg(sim).alias("o")).collect()[0]["o"]

    init = deterministic_centroids(emb, 4)
    refined = kmeans_centroids(emb, 4, iters=3)
    assert objective(refined) >= objective(init) - 1e-9

    queries = emb.filter("vec_id IN (0, 20, 40)").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    bf = {(r["q_id"], r["rank"]): r["vec_id"]
          for r in cosine_topk_bruteforce(emb, queries, k=3).collect()}
    assigned = ivf_assign(emb, refined)
    ivf = {(r["q_id"], r["rank"]): r["vec_id"]
           for r in ivf_topk(assigned, refined, queries, k=3, nprobe=4).collect()}
    assert ivf == bf  # nprobe=all cells == exact

    # bucketed index write + partition-pruned read
    idx = str(tmp_path / "ivf_index")
    ivf_write_index(assigned, idx)
    cells = {r["centroid_id"] for r in assigned.select("centroid_id").distinct().collect()}
    probe = sorted(cells)[:2]
    sub = ivf_read_cells(spark, idx, probe)
    assert {r["centroid_id"] for r in sub.collect()} == set(probe)
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan


def test_ivf_topk_indexed_prunes_and_matches(spark, tmp_path):
    """ivf_topk_indexed must (a) return exactly what the in-memory
    assignment path returns, and (b) read the written index with a
    partition-pruning filter (the q26 driver path)."""
    import numpy as np

    from gocrawler_spark.operators.similarity import (
        ivf_assign,
        ivf_probes,
        ivf_read_cells,
        ivf_topk,
        ivf_topk_indexed,
        ivf_write_index,
        kmeans_centroids,
    )

    rng = np.random.RandomState(7)
    emb = spark.createDataFrame(
        [(i, rng.randn(16).tolist()) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter("vec_id < 3").select(F.col("vec_id").alias("q_id"), "embedding")
    corpus = emb.filter("vec_id >= 3")
    cents = kmeans_centroids(corpus, 8, iters=2)
    assigned = ivf_assign(corpus, cents)
    idx = str(tmp_path / "idx")
    ivf_write_index(assigned, idx)

    mem = {(r["q_id"], r["rank"]): (r["vec_id"], r["cosine"])
           for r in ivf_topk(assigned, cents, queries, k=4, nprobe=3).collect()}
    viaidx = {(r["q_id"], r["rank"]): (r["vec_id"], r["cosine"])
              for r in ivf_topk_indexed(spark, idx, cents, queries, k=4, nprobe=3).collect()}
    assert viaidx == mem

    # the pruned read only lists the probed cells' files
    probes = ivf_probes(cents, queries, nprobe=3)
    cell_ids = sorted(r["centroid_id"] for r in probes.select("centroid_id").distinct().collect())
    assert len(cell_ids) < 8  # some cells are genuinely never probed
    plan = ivf_read_cells(spark, idx, cell_ids)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan


def test_embedding_cosine_dups(spark):
    import numpy as np

    from gocrawler_spark.operators.dedup import embedding_cosine_dups

    rng = np.random.RandomState(3)
    v = rng.randn(64)
    rows = [
        (0, (v / np.linalg.norm(v)).tolist()),
        (1, (v / np.linalg.norm(v)).tolist()),  # exact dup
        (2, (rng.randn(64)).tolist()),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["a"], r["b"]): r["cosine"] for r in embedding_cosine_dups(emb, 0.95).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0


def test_embedding_neardups_not_exact(spark):
    """Round-1 scale fix regression: banded sketches must find planted
    NEAR-duplicates (cosine ~0.96-0.99, non-identical vectors), which the
    old single full-equality 8-bit sketch missed ~57% of the time at the
    0.95 boundary. Verified against brute-force cosine over all pairs."""
    import itertools

    import numpy as np

    from gocrawler_spark.operators.dedup import embedding_cosine_dups

    rng = np.random.RandomState(11)
    rows = []
    for i in range(10):
        v = rng.randn(64)
        v /= np.linalg.norm(v)
        w = v + rng.randn(64) * 0.03  # |noise|~0.24 ⇒ cosine ~0.96-0.98
        w /= np.linalg.norm(w)
        rows.append((2 * i, v.tolist()))
        rows.append((2 * i + 1, w.tolist()))
    # brute-force oracle over all pairs
    vecs = {i: np.array(v) for i, v in rows}
    expected = {
        (a, b)
        for a, b in itertools.combinations(sorted(vecs), 2)
        if round(float(vecs[a] @ vecs[b]), 6) >= 0.95
    }
    assert len(expected) >= 8  # fixture sanity: most planted pairs qualify
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["a"], r["b"]) for r in embedding_cosine_dups(emb, 0.95).collect()}
    assert got == expected


def test_text_functions(spark, docs):
    from gocrawler_spark.functions.text import (
        fingerprint,
        lang_id,
        quality_score,
        token_count,
    )

    out = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("tc"),
        lang_id(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
        quality_score(F.col("text")).alias("q"),
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[0]["tc"] == 9
    assert rows[0]["lang"] == "en"
    assert rows[3]["lang"] == "es"
    assert rows[6]["lang"] == "und" and rows[6]["tc"] == 0
    assert rows[0]["fp"] == rows[2]["fp"] != rows[1]["fp"]
    assert 0.0 <= rows[6]["q"] < rows[0]["q"] <= 1.0


def test_sentiment(spark):
    from gocrawler_spark.operators.analyze import sentiment_label, sentiment_score

    df = spark.createDataFrame(
        [(1, "excelente maquina muy buena"), (2, "terrible producto roto"), (3, "caja con cable")],
        "id int, content string",
    )
    out = {r["id"]: (r["s"], r["l"]) for r in df.select(
        "id", sentiment_score(F.col("content")).alias("s"), sentiment_label(F.col("content")).alias("l")
    ).collect()}
    assert out[1][0] > 0 and out[1][1] == "POSITIVE"
    assert out[2][0] < 0 and out[2][1] == "NEGATIVE"
    assert out[3] == (0.0, "NEUTRAL")


def test_analyze_items(spark):
    from gocrawler_spark.operators.analyze import analyze_items

    items = spark.createDataFrame(
        [
            ("i1", [("t", "excelente maquina de Apple", "a", 5.0, None), ("t2", "roto", "b", 1.0, None)]),
            ("i2", []),
        ],
        "id string, reviews array<struct<title:string,content:string,author:string,stars:double,date:timestamp>>",
    )
    out = {r["id"]: r for r in analyze_items(items).collect()}
    assert "i2" not in out  # reviews-only gate (parser.go:36-40)
    # both Comprehend legs (analyzer.go:42-116): sentiment AND entities
    assert out["i1"]["comment_labels"] == {0: "POSITIVE", 1: "NEGATIVE"}
    assert out["i1"]["comment_entities"] == {0: ["Apple"], 1: []}
    assert out["i1"]["n_reviews"] == 2


def test_extract_entities(spark):
    from gocrawler_spark.operators.analyze import entities_exploded

    df = spark.createDataFrame(
        [(1, "Juan compro en amazon un disco de rock en Madrid"),
         (2, "nothing here but lowercase words"),
         (3, "Beatles Beatles spark")],
        "doc_id long, text string",
    )
    rows = {(r["doc_id"], r["entity"]): r["etype"] for r in entities_exploded(df).collect()}
    assert rows[(1, "Juan")] == "PERSON"
    assert rows[(1, "amazon")] == "ORGANIZATION"  # lexicon is case-insensitive
    assert rows[(1, "Madrid")] == "LOCATION"
    assert (2, "nothing") not in rows and not any(k[0] == 2 for k in rows)
    assert rows[(3, "Beatles")] == "OTHER" and rows[(3, "spark")] == "ORGANIZATION"
    assert sum(1 for k in rows if k[0] == 3) == 2  # distinct per doc


def test_multimodal_plumbing(spark):
    from gocrawler_spark.operators.multimodal import (
        frame_sample,
        image_features,
        synthetic_media,
    )

    media = synthetic_media(spark, 30)
    feats = image_features(media).collect()
    assert len(feats) == 30
    by_id = {r["media_id"]: r for r in feats}
    assert all(len(r["embedding"]) == 16 for r in feats)
    # determinism
    feats2 = {r["media_id"]: r["phash"] for r in image_features(media).collect()}
    assert all(feats2[k] == by_id[k]["phash"] for k in feats2)

    frames = frame_sample(media.filter("mime = 'video/mp4'"), every_ms=2000).collect()
    assert len(frames) > 10
    assert all(r["frame_ts_ms"] == r["frame_idx"] * 2000 for r in frames)

    with pytest.raises(NotImplementedError):
        image_features(media, backend="pillow").collect()


def test_multimodal_audio_and_resize(spark):
    from gocrawler_spark.operators.multimodal import (
        audio_features,
        image_resize,
        synthetic_media,
    )

    media = synthetic_media(spark, 32)
    audio = audio_features(media.filter("mime = 'audio/ogg'")).collect()
    assert len(audio) == 8
    assert all(len(r["mfcc"]) == 13 and 0.0 <= r["rms_level"] <= 1.0 for r in audio)
    assert all(r["duration_ms"] > 0 for r in audio)
    # determinism across runs
    again = {r["media_id"]: r["rms_level"]
             for r in audio_features(media.filter("mime = 'audio/ogg'")).collect()}
    assert all(again[r["media_id"]] == r["rms_level"] for r in audio)

    resized = image_resize(media.filter("mime LIKE 'image/%'"), 224, 224).collect()
    assert len(resized) == 16
    assert all(r["width"] == 224 and r["height"] == 224 for r in resized)
    assert len({len(r["payload"]) for r in resized}) == 1  # fixed target size

    with pytest.raises(NotImplementedError):
        audio_features(media, backend="librosa").collect()
    with pytest.raises(NotImplementedError):
        image_resize(media, backend="pillow").collect()


def test_streaming_frontier_ingest(spark, tmp_path):
    from gocrawler_spark.datagen import crawl_corpus
    from gocrawler_spark.streaming.microbatch import frontier_ingest_batch
    from gocrawler_spark.tables.catalog import SnapshotCatalog

    _, _, robots, hosts, profile = crawl_corpus(50, 8)
    from .conftest import robots_df as mk_robots

    cat = SnapshotCatalog(str(tmp_path), spark)
    rdf = mk_robots(spark, robots)
    batch1 = spark.createDataFrame(
        [(f"https://{hosts[0]}/Mixup/Home.aspx", 0),
         (f"https://{hosts[1]}/Mixup/Categoria.aspx?etq=rock", 0),
         ("https://evil.example/Mixup/Home.aspx", 0)],
        "url string, depth int",
    )
    frontier_ingest_batch(batch1, 0, cat, profile, rdf)
    assert cat.read("frontier").count() == 2  # evil host rejected
    # replay same batch -> seen dedup, no growth
    frontier_ingest_batch(batch1, 1, cat, profile, rdf)
    assert cat.read("frontier").count() == 2
    assert cat.read("seen").count() == 2


def test_streaming_host_budget_state(spark, tmp_path):
    """applyInPandasWithState: per-host budget persists across batches
    AND across query restarts (state lives in the checkpoint)."""
    import json
    import os

    from gocrawler_spark.streaming.microbatch import host_budget_admit

    src = tmp_path / "in"
    os.makedirs(src)
    with open(src / "b1.json", "w") as f:
        for u in ("a/1", "a/2", "a/3", "b/1"):
            host, _ = u.split("/")
            f.write(json.dumps({"url": u, "host": host}) + "\n")

    collected = []

    def sink(df, bid):
        collected.extend((r["url"], r["rank"]) for r in df.collect())

    def drain():
        stream = spark.readStream.schema("url string, host string").json(str(src))
        q = (
            host_budget_admit(stream, budget_per_host=2)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    # host a: budget 2 -> first two urls; host b: 1 of 2
    assert sorted(collected) == [("a/1", 1), ("a/2", 2), ("b/1", 1)]

    # second file arrives; a is exhausted, b has one credit left —
    # state survives the restart via the checkpoint
    collected.clear()
    with open(src / "b2.json", "w") as f:
        for u in ("a/4", "b/2", "b/3"):
            host, _ = u.split("/")
            f.write(json.dumps({"url": u, "host": host}) + "\n")
    drain()
    assert sorted(collected) == [("b/2", 2)]


def test_streaming_readstream_ingest(spark, tmp_path):
    """True Structured Streaming path: readStream file source ->
    foreachBatch admission/dedup -> frontier tables (availableNow)."""
    import json
    import os

    from gocrawler_spark.datagen import crawl_corpus
    from gocrawler_spark.streaming.microbatch import start_frontier_ingest
    from gocrawler_spark.tables.catalog import SnapshotCatalog

    from .conftest import robots_df as mk_robots

    _, _, robots, hosts, profile = crawl_corpus(50, 8)
    src = tmp_path / "incoming"
    os.makedirs(src)
    with open(src / "batch1.json", "w") as f:
        for u in (f"https://{hosts[0]}/Mixup/Home.aspx",
                  f"https://{hosts[1]}/Mixup/Categoria.aspx?etq=rock",
                  "https://evil.example/Mixup/Home.aspx"):
            f.write(json.dumps({"url": u, "depth": 0}) + "\n")

    cat = SnapshotCatalog(str(tmp_path / "wh"), spark)
    stream = (
        spark.readStream.schema("url string, depth int")
        .json(str(src))
    )
    q = start_frontier_ingest(
        stream, cat, profile, mk_robots(spark, robots),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert cat.read("frontier").count() == 2
    # second file arrives; replays + new url -> only the new one lands
    with open(src / "batch2.json", "w") as f:
        f.write(json.dumps({"url": f"https://{hosts[0]}/Mixup/Home.aspx", "depth": 0}) + "\n")
        f.write(json.dumps({"url": f"https://{hosts[2]}/Mixup/Home.aspx", "depth": 0}) + "\n")
    q2 = start_frontier_ingest(
        stream, cat, profile, mk_robots(spark, robots),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert cat.read("frontier").count() == 3
    assert cat.read("seen").count() == 3


def test_sitemap_to_frontier_ingest_end_to_end(spark, tmp_path):
    """VERDICT r3 #4: Sitemap directives drive the streaming frontier
    end-to-end — robots_sitemaps -> fetched sitemap XML ->
    sitemap_candidates -> readStream -> start_frontier_ingest — and the
    resulting frontier equals the batch-computed admission of the same
    candidate set."""
    import json
    import os

    from gocrawler_spark.datagen import crawl_corpus
    from gocrawler_spark.operators.frontier import admission_filter, normalize_candidates
    from gocrawler_spark.operators.robots import robots_filter
    from gocrawler_spark.operators.robots_parse import robots_sitemaps, sitemap_candidates
    from gocrawler_spark.streaming.microbatch import start_frontier_ingest
    from gocrawler_spark.tables.catalog import SnapshotCatalog

    from .conftest import robots_df as mk_robots

    _, _, robots, hosts, profile = crawl_corpus(50, 8)
    h0, h1 = hosts[0], hosts[1]
    robots_bodies = spark.createDataFrame(
        [
            (f"https://{h0}/robots.txt",
             f"User-agent: *\nAllow: /\nSitemap: https://{h0}/sitemap.xml\n".encode()),
            (f"https://{h1}/robots.txt",
             f"Sitemap: https://{h1}/sitemap.xml\n".encode()),
        ],
        "url string, html binary",
    )
    sm = robots_sitemaps(robots_bodies)
    assert sorted(r["sitemap_url"] for r in sm.collect()) == [
        f"https://{h0}/sitemap.xml", f"https://{h1}/sitemap.xml",
    ]

    def urlset(urls):
        # spec-faithful rendering: urls are XML-entity-escaped (the
        # protocol REQUIRES it — '&' arrives as '&amp;'), and one entry
        # per set is CDATA-wrapped to pin that form too
        def esc(u):
            return u.replace("&", "&amp;").replace("<", "&lt;")

        entries = [f"<url><loc> {esc(u)} </loc></url>" for u in urls[:-1]]
        entries.append(f"<url><loc><![CDATA[ {urls[-1]} ]]></loc></url>")
        return (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + "".join(entries)
            + "</urlset>"
        ).encode()

    cands0 = [
        f"https://{h0}/Mixup/Home.aspx",
        # literal & in the query string: rendered as &amp;, must decode back
        f"https://{h0}/Mixup/Categoria.aspx?etq=rock&page=2",
        f"https://{h0}/Mixup/detproducto.aspx?sku=194397052312",
        "https://evil.example/Mixup/Home.aspx",   # foreign host: inadmissible
    ]
    cands1 = [f"https://{h1}/Mixup/Home.aspx", f"https://{h0}/Mixup/Home.aspx"]  # cross-listed dup
    sitemap_pages = spark.createDataFrame(
        [(f"https://{h0}/sitemap.xml", urlset(cands0)),
         (f"https://{h1}/sitemap.xml", urlset(cands1))],
        "url string, html binary",
    )
    cand = sitemap_candidates(sitemap_pages)
    assert {r["url"] for r in cand.collect()} == set(cands0) | set(cands1)

    # stream the candidate rows through the real readStream ingest
    src = tmp_path / "incoming"
    os.makedirs(src)
    with open(src / "sitemap_batch.json", "w") as f:
        for r in cand.collect():
            f.write(json.dumps({"url": r["url"], "depth": r["depth"]}) + "\n")
    cat = SnapshotCatalog(str(tmp_path / "wh"), spark)
    stream = spark.readStream.schema("url string, depth int").json(str(src))
    q = start_frontier_ingest(
        stream, cat, profile, mk_robots(spark, robots),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    # batch-computed expected frontier: the same candidates through the
    # batch admission operators directly
    c = normalize_candidates(cand)
    c = admission_filter(c, profile)
    c = robots_filter(c, mk_robots(spark, robots))
    expected = {r["url"] for r in c.select("url").collect()}
    got = {r["url"] for r in cat.read("frontier").select("url").collect()}
    assert got == expected
    assert f"https://{h0}/Mixup/Home.aspx" in got
    assert "https://evil.example/Mixup/Home.aspx" not in got
    assert cat.read("seen").count() == len(expected)


def test_streaming_windowed_fetch_rate_watermark(spark, tmp_path):
    """Watermarked tumbling windows: late-but-within-watermark rows
    update their window, too-late rows are dropped (bounded state),
    watermark persists across query restarts."""
    import json
    import os

    from gocrawler_spark.streaming.windows import fetch_rate_windows

    src = tmp_path / "in"
    os.makedirs(src)

    emitted = []

    def drain():
        stream = spark.readStream.schema("ts timestamp, host string").json(str(src))
        q = (
            fetch_rate_windows(stream, window="1 minute", watermark="2 minutes")
            .writeStream.foreachBatch(
                lambda df, b: emitted.extend(
                    (r["window_start"].strftime("%H:%M"), r["host"], r["fetches"])
                    for r in df.collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def write(name, rows):
        with open(src / name, "w") as f:
            for ts, host in rows:
                f.write(json.dumps({"ts": f"2021-01-01T{ts}", "host": host}) + "\n")

    write("b1.json", [("10:00:10", "a"), ("10:00:40", "a"), ("10:05:00", "a")])
    drain()
    assert ("10:00", "a", 2) in emitted and ("10:05", "a", 1) in emitted
    # watermark is now 10:05 - 2min = 10:03
    emitted.clear()
    write("b2.json", [
        ("10:02:30", "a"),  # too late (window < watermark): dropped
        ("10:03:30", "a"),  # late but within watermark: accepted
        ("10:08:00", "a"),
    ])
    drain()
    assert ("10:03", "a", 1) in emitted and ("10:08", "a", 1) in emitted
    assert not any(w == "10:02" for w, _, _ in emitted)  # dropped row


def test_redact_pii_and_count(spark):
    from gocrawler_spark.functions.text import pii_count, redact_pii

    rows = [
        (0, "mail me at john.doe+x@example.co.uk thanks"),
        (1, "server at 192.168.1.254 port 80"),
        (2, "call +1 (555) 123-4567 now"),
        (3, "clean text with number 42 and 3.14"),
        (4, "combo a@b.io from 10.0.0.1 tel 555-867-5309"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["red"], r["n"]) for r in df.select(
        "doc_id",
        redact_pii(F.col("text")).alias("red"),
        pii_count(F.col("text")).alias("n"),
    ).collect()}
    assert out[0] == ("mail me at <EMAIL> thanks", 1)
    assert out[1] == ("server at <IP> port 80", 1)
    assert out[2][0] == "call <PHONE> now" and out[2][1] == 1
    assert out[3] == ("clean text with number 42 and 3.14", 0)
    assert out[4][0] == "combo <EMAIL> from <IP> tel <PHONE>" and out[4][1] == 3


def test_repetition_signals(spark):
    from gocrawler_spark.functions.text import (
        duplicate_line_fraction,
        top_ngram_fraction,
    )

    rows = [
        (0, "a b\na b\na b\nc d"),          # 2 of 4 lines are dups
        (1, "one two three four five six"),  # no repetition
        (2, "spam ham spam ham spam ham"),   # 'spam ham' bigram x3
        (3, ""),
        (4, "x"),                            # too short for bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dl = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", duplicate_line_fraction(F.col("text")).alias("f")).collect()}
    assert dl[0] == 0.5 and dl[1] == 0.0 and dl[3] == 0.0
    tg = {r["doc_id"]: r["top_ngram_frac"]
          for r in top_ngram_fraction(df, n=2).collect()}
    assert tg[1] == round(2 / 6, 6)   # every bigram unique: top covers 2/6
    assert tg[2] == 1.0               # 'spam ham' x3 * 2 tokens / 6 tokens
    assert tg[3] == 0.0 and tg[4] == 0.0
    # ADVICE r3: self-overlapping repeats ('a a a a': bigram 'a a' x3,
    # 3*2/4 = 1.5 uncapped) must clamp to the 1.0 covered-fraction bound
    over = spark.createDataFrame([(9, "a a a a")], "doc_id long, text string")
    tg2 = {r["doc_id"]: r["top_ngram_frac"]
           for r in top_ngram_fraction(over, n=2).collect()}
    assert tg2[9] == 1.0


def test_boilerplate_line_filter(spark):
    """C4-style cross-corpus line removal: hot lines (>= min_docs
    distinct docs) vanish, unique lines survive in original order,
    blank lines are never treated as boilerplate, and an all-boilerplate
    doc comes back empty rather than dropped."""
    from gocrawler_spark.functions.text import boilerplate_line_filter

    footer = "(c) example all rights reserved"
    nav = "home | products | about"
    rows = [
        (0, f"alpha body zero\n{footer}\n{nav}"),
        (1, f"{nav}\nbeta body one\n\nmore beta\n{footer}"),
        (2, f"gamma body two\n{footer}"),
        (3, f"  {footer}  \n{nav}"),      # whitespace-padded -> all removed
        (4, "delta body four\n\n\ndelta tail"),  # blanks survive
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           boilerplate_line_filter(df, min_docs=3).collect()}
    assert out[0]["text"] == "alpha body zero" and out[0]["n_lines_removed"] == 2
    # order preserved around removed + blank lines
    assert out[1]["text"] == "beta body one\n\nmore beta"
    assert out[1]["n_lines_removed"] == 2
    # footer appears in 4 docs (hot), nav in 3 (hot at min_docs=3)
    assert out[2]["text"] == "gamma body two" and out[2]["n_lines_removed"] == 1
    # trim-matched: padded footer removed; all lines gone -> empty text
    assert out[3]["text"] == "" and out[3]["n_lines_removed"] == 2
    # blank lines never counted as boilerplate even though every doc
    # with blanks shares them
    assert out[4]["text"] == "delta body four\n\n\ndelta tail"
    assert out[4]["n_lines_removed"] == 0
    # min_docs above any line's doc-frequency -> identity transform
    ident = {r["doc_id"]: r for r in
             boilerplate_line_filter(df, min_docs=10).collect()}
    assert all(ident[i]["text"] == rows[i][1] for i in range(5))
    assert all(ident[i]["n_lines_removed"] == 0 for i in range(5))


def test_ngram_contamination(spark):
    """Benchmark decontamination: docs sharing a word 8-gram with the
    eval set are flagged; self-matches (a benchmark doc present in the
    corpus under the same id) are excluded; short docs never match."""
    from gocrawler_spark.functions.text import ngram_contamination

    eval_q = "which ancient river crosses the old capital city of the empire"
    corpus = spark.createDataFrame(
        [
            (0, f"some original prose here and then {eval_q} appended"),
            (1, "completely clean document with enough words to have many grams"),
            (2, "tiny doc"),                       # < 8 tokens: no grams
            (100, f"benchmark row also in corpus {eval_q}"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"benchmark row also in corpus {eval_q}")],
        "bench_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           ngram_contamination(corpus, bench, n=8).collect()}
    assert len(out) == 4                      # every doc gets a row
    # eval_q has 11 words -> 4 contiguous 8-grams, all shared by doc 0
    assert out[0]["n_contam_grams"] >= 4 and out[0]["n_bench_docs"] == 1
    assert out[1]["n_contam_grams"] == 0 and out[1]["n_bench_docs"] == 0
    assert out[2]["n_contam_grams"] == 0
    # doc 100 IS the benchmark row: self-match excluded
    assert out[100]["n_contam_grams"] == 0 and out[100]["n_bench_docs"] == 0
    # the join side is broadcast (eval sets are small by construction)
    plan = ngram_contamination(corpus, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def _ref_exact_substring(rows, k, min_count):
    """Independent driver-side reference for exact_substring_dedup."""
    toks = {i: t.split() for i, t in rows}
    counts = {}
    for t in toks.values():
        for p in range(len(t) - k + 1):
            w = tuple(t[p:p + k])
            counts[w] = counts.get(w, 0) + 1
    out = {}
    for i, t in toks.items():
        marked = [False] * len(t)
        for p in range(len(t) - k + 1):
            if counts[tuple(t[p:p + k])] >= min_count:
                for j in range(p, p + k):
                    marked[j] = True
        kept = [w for w, m in zip(t, marked) if not m]
        spans = sum(
            1 for j in range(len(t)) if marked[j] and (j == 0 or not marked[j - 1])
        )
        out[i] = (" ".join(kept), len(t), len(t) - len(kept), spans)
    return out


def test_exact_substring_dedup(spark):
    from gocrawler_spark.operators.dedup import exact_substring_dedup

    boiler = " ".join(f"b{j}" for j in range(12))  # 12-token shared paragraph
    rows = [
        (0, "alpha beta gamma " + boiler + " delta epsilon"),
        (1, "zeta eta " + boiler + " theta iota kappa " + boiler),  # twice in-doc
        (2, "totally unique words nothing shared here at all ok fine"),
        (3, "x0 x1 x2 x3 x4 x5 x6 x7"),  # shorter than k -> untouched
        (4, ""),  # empty doc
    ]
    k, mc = 10, 2
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_tokens"], r["n_tokens_dropped"], r["n_spans"])
        for r in exact_substring_dedup(docs, k=k, min_count=mc).collect()
    }
    want = _ref_exact_substring(rows, k, mc)
    assert got == want
    # the planted paragraph is gone from every occurrence
    for i in (0, 1):
        assert "b0" not in got[i][0] and got[i][2] > 0
    assert got[2][0] == rows[2][1] and got[2][2] == 0  # unique doc untouched
    assert got[3] == (rows[3][1], 8, 0, 0)  # shorter than k
    assert got[4] == ("", 0, 0, 0)
    # same-doc repetition alone reaches min_count (doc 5 repeats itself)
    self_rep = " ".join(f"s{j}" for j in range(10))
    solo = spark.createDataFrame(
        [(9, self_rep + " mid " + self_rep)], "doc_id long, text string"
    )
    out9 = exact_substring_dedup(solo, k=10, min_count=2).collect()[0]
    assert out9["text_dedup"] == "mid" and out9["n_spans"] == 2
    # stays JVM-side: no row-at-a-time Python in the plan
    plan = exact_substring_dedup(docs, k=k, min_count=mc)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def _ref_gopher(text):
    """Independent python recomputation of the Gopher §A1.1 signals
    (re/str ops only — no shared helpers with the Spark operator)."""
    import re as _re

    words = [w for w in text.lower().split() if w]
    nw = len(words)
    mwl = sum(len(w) for w in words) / nw if nw else 0.0
    n_sym = len(_re.findall(r"#|\.\.\.|…", text))
    swr = n_sym / nw if nw else 0.0
    lines = [ln for ln in text.split("\n") if ln.strip()]
    nl = len(lines)
    bullets = sum(1 for ln in lines if ln.lstrip()[:2] in ("- ", "* ", "• "))
    ells = sum(1 for ln in lines if ln.rstrip().endswith(("...", "…")))
    alpha = sum(1 for w in words if _re.search(r"[a-zA-Z]", w))
    stops = sum(
        1
        for s in ("the", "be", "to", "of", "and", "that", "have", "with")
        if s in words
    )
    keep = (
        50 <= nw <= 100000
        and 3.0 <= mwl <= 10.0
        and swr <= 0.1
        and (bullets / nl if nl else 0.0) <= 0.9
        and (ells / nl if nl else 0.0) <= 0.3
        and (alpha / nw if nw else 0.0) >= 0.8
        and stops >= 2
    )
    return (
        nw,
        round(mwl, 6),
        round(swr, 6),
        round(bullets / nl if nl else 0.0, 6),
        round(ells / nl if nl else 0.0, 6),
        round(alpha / nw if nw else 0.0, 6),
        stops,
        keep,
    )


def test_gopher_quality_rules(spark):
    from gocrawler_spark.functions.text import gopher_quality_rules

    good = (
        "The quick brown fox jumps over the lazy dog and runs be with "
        "that have of to something more words here today " * 3
    )
    bullet_doc = "\n".join(f"- item {i} of the list be" for i in range(20))
    ellipsis_doc = "\n".join(
        f"the line {i} of text trails off be..." for i in range(10)
    )
    symbol_doc = "the " + "# " * 30 + "of be words " * 10
    numeric_doc = ("12345 67890 " * 30) + "the of be"
    short_doc = "the of be too short"
    empty_doc = ""
    rows = [
        (0, good),
        (1, bullet_doc),
        (2, ellipsis_doc),
        (3, symbol_doc),
        (4, numeric_doc),
        (5, short_doc),
        (6, empty_doc),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (
            r["g"]["n_words"],
            r["g"]["mean_wlen6"],
            r["g"]["symbol_ratio6"],
            r["g"]["bullet_frac6"],
            r["g"]["ellipsis_frac6"],
            r["g"]["alpha_frac6"],
            r["g"]["stop_hits"],
            r["g"]["keep"],
        )
        for r in df.select(
            "doc_id", gopher_quality_rules(F.col("text")).alias("g")
        ).collect()
    }
    for doc_id, text in rows:
        assert out[doc_id] == _ref_gopher(text), f"doc {doc_id}"
    # the planted failures fail for the planted reasons
    assert out[0][7] is True
    assert out[1][7] is False and out[1][3] == 1.0  # all-bullet
    assert out[2][7] is False and out[2][4] == 1.0  # all-ellipsis
    assert out[3][7] is False and out[3][2] > 0.1  # symbol-heavy
    assert out[4][7] is False and out[4][5] < 0.8  # numeric words
    assert out[5][7] is False  # too short
    assert out[6][7] is False and out[6][0] == 0  # empty
    # JVM-only plan
    plan = (
        df.select(gopher_quality_rules(F.col("text")).alias("g"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan


def test_exact_substring_rolling_hash_differential(spark):
    """hasher='rolling' (O(n) Rabin-Karp mapInPandas) must produce the
    IDENTICAL dedup output as the codegen O(n·k) path and the
    independent reference — hash values differ, hash-equality structure
    must not. Includes long docs (the rolling path's target), same-doc
    repeats, unicode tokens, sub-k docs and empty docs."""
    from gocrawler_spark.operators.dedup import (
        _rolling_window_grams,
        exact_substring_dedup,
    )

    boiler = " ".join(f"b{j}" for j in range(12))
    long_doc = " ".join(f"w{j % 97}" for j in range(900)) + " " + boiler
    rows = [
        (0, "alpha beta gamma " + boiler + " delta epsilon"),
        (1, "zeta eta " + boiler + " theta iota kappa " + boiler),
        (2, long_doc),
        (3, long_doc + " tail tokens differ here"),
        (4, "x0 x1 x2 x3"),
        (5, ""),
        (6, "héllo wörld " * 8 + boiler),
    ]
    k, mc = 10, 2
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def snap(df):
        return {
            r["doc_id"]: (r["text_dedup"], r["n_tokens"],
                          r["n_tokens_dropped"], r["n_spans"])
            for r in df.collect()
        }

    got_roll = snap(exact_substring_dedup(docs, k=k, min_count=mc, hasher="rolling"))
    got_code = snap(exact_substring_dedup(docs, k=k, min_count=mc, hasher="codegen"))
    assert got_roll == got_code
    assert got_roll == _ref_exact_substring(rows, k, mc)
    # rolling hash structure: equal windows hash equal, shifted windows
    # don't collide, and every position is emitted
    grams = _rolling_window_grams(docs, k, "text", "doc_id").collect()
    per_doc = {}
    for g in grams:
        per_doc.setdefault(g["doc_id"], {})[g["pos"]] = g["h"]
    n2 = len(rows[2][1].split())
    assert set(per_doc[2]) == set(range(n2 - k + 1))
    # docs 2 and 3 share their 900-token prefix: every shared window
    # position hashes identically across docs
    for p in range(0, 900 - k + 1):
        assert per_doc[2][p] == per_doc[3][p]
    # hash-equality structure matches token-window equality exactly on
    # this corpus: distinct hashes == distinct token k-grams (doc 2 is
    # periodic, so repeated windows MUST collide and distinct ones not)
    toks2 = rows[2][1].split()
    want_distinct = len({tuple(toks2[p:p + k]) for p in range(n2 - k + 1)})
    assert len(set(per_doc[2].values())) == want_distinct
