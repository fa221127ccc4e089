"""Deduplication operators for web-scale training-data pipelines.

The crawl side already dedups URLs (seen-set, F4/J4); these operators
dedup *content* — the step a 100 TB Common-Crawl-style corpus needs
before training. All are DataFrame-native: shingling/hashing stays in
whole-stage codegen (``xxhash64``/``md5`` built-ins), candidate
generation is hash-bucket blocking (shuffles on high-cardinality
band/ngram keys, never on document ids), and only verified pairs leave
the join. No per-row Python anywhere.

Conventions: every function returns a DataFrame with deterministic,
aliased columns so the DuckDB oracles in ``__spark_entry__`` can check
them value-for-value.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

# Mersenne prime 2^31-1: hash values and multipliers stay < 2^31 so the
# permutation products stay < 2^62 (no int64 overflow under ANSI mode)
_PRIME = 2147483647


def _tokens(col):
    """Lowercased whitespace tokens, empties dropped (SQL-portable)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: keep the smallest id per md5(text).

    Returns (doc_id, content_hash, dup_count) for the kept representative.
    """
    h = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
    return (
        h.groupBy("content_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("dup_count"),
        )
        .select(id_col, "content_hash", "dup_count")
    )


def token_ngrams(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ngram) distinct token n-grams — JVM-side via transform/
    sequence over the token array (no UDF)."""
    toks = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("t"))
    # NB: Spark sequence(0, -1) is a DESCENDING range, so short docs must
    # be guarded with when(), not greatest()
    grams_expr = F.when(
        F.size("t") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - n),
            lambda i: F.concat_ws(" ", F.slice("t", i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select(id_col, F.explode(grams_expr).alias("ngram"))
    return grams.distinct()


def _jaccard_from_inter(inter: DataFrame, sizes: DataFrame, threshold: float, id_col: str) -> DataFrame:
    """(a, b, inter) + per-doc sizes -> (a, b, jaccard >= threshold)."""
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _verify_pairs_exact(cands: DataFrame, grams: DataFrame, sizes: DataFrame,
                        threshold: float, id_col: str) -> DataFrame:
    """Exact Jaccard over candidate (a, b) pairs: intersection counted
    over ALL ngrams (capping/LSH affect candidate generation only,
    never the similarity value)."""
    ga = grams.select(F.col(id_col).alias("a"), "ngram")
    gb = grams.select(F.col(id_col).alias("b"), "ngram")
    inter = (
        cands.join(ga, "a")
        .join(gb, ["b", "ngram"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return _jaccard_from_inter(inter, sizes, threshold, id_col)


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
    candidates: str = "prefix",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a < b): |A∩B| from an
    equi-join on ngram, |A|/|B| from per-doc counts; pure relational,
    SQL-oracle-checkable.

    ``candidates`` picks the candidate-generation strategy; the Jaccard
    values (and, for "prefix"/"all", the returned pair SET) are exact
    regardless:

    * "prefix" (default) — prefix filtering (Bayardo et al. All-Pairs /
      PPJoin): order every doc's shingles by ascending global document
      frequency and self-join only each doc's first
      ``|x| − ⌈t·|x|⌉ + 1`` shingles. Guarantee: Jaccard(A,B) ≥ t ⟹
      |A∩B| ≥ t·|A∪B| ≥ t·max(|A|,|B|), and the smallest (in df order)
      common shingle sits within both prefixes, so every qualifying
      pair is generated — equality with "all" is mathematical, not
      empirical (and pinned by test). Hot stopword shingles land at the
      END of the df order, so the quadratic hot-key self-join the
      uncapped path suffers at corpus scale is pruned by construction.
      This is the 100 TB default.
    * "all" — plain self-join on every shingle (the r1/r2 path); exact
      but quadratic on hot shingles; fine below ~10^6 docs and used by
      tests as the ground truth for "prefix".
    * ``max_df`` (overrides ``candidates``) — drop shingles with
      document frequency above the cap from candidate generation only;
      similarity still exact, recall capped heuristically (a pair
      sharing ONLY hot shingles is missed). Kept for pipelines that
      want an explicit cost ceiling."""
    grams = token_ngrams(docs, n, text_col, id_col)
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("sz"))
    if max_df is not None:
        rare = grams.join(
            grams.groupBy("ngram").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("ngram"),
            "ngram",
        )
        a = rare.select(F.col(id_col).alias("a"), "ngram")
        b = rare.select(F.col(id_col).alias("b"), "ngram")
        cands = (
            a.join(b, "ngram").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
        )
        return _verify_pairs_exact(cands, grams, sizes, threshold, id_col)
    if candidates == "all":
        a = grams.select(F.col(id_col).alias("a"), "ngram")
        b = grams.select(F.col(id_col).alias("b"), "ngram")
        inter = (
            a.join(b, "ngram")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
        return _jaccard_from_inter(inter, sizes, threshold, id_col)
    if candidates != "prefix":
        raise ValueError(f"unknown candidates strategy {candidates!r}")
    dfreq = grams.groupBy("ngram").agg(F.count("*").alias("df"))
    ranked = grams.join(dfreq, "ngram").join(sizes, id_col)
    w = Window.partitionBy(id_col).orderBy("df", "ngram")
    # the 1e-9 nudge keeps fp noise in t*sz from inflating the ceil and
    # shortening the prefix below the guarantee (0.85*20 must ceil to
    # 17, not 18)
    prefix = ranked.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn")
        <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-9)) + 1
    )
    a = prefix.select(F.col(id_col).alias("a"), "ngram")
    b = prefix.select(F.col(id_col).alias("b"), "ngram")
    cands = (
        a.join(b, "ngram").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    return _verify_pairs_exact(cands, grams, sizes, threshold, id_col)


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 30,
) -> DataFrame:
    """Connected components over near-dup pairs by iterative min-label
    propagation: every vertex takes the smallest label among itself and
    its neighbors until fixpoint. Returns (id, cluster) where cluster =
    min doc id of the component.

    Each iteration combines neighbor-min propagation (one equi-join +
    groupBy on the edge list, shuffle on vertex ids, skew-free) with a
    pointer-jumping contraction (label := label of label), giving
    O(log diameter) convergence — a 2^30-long chain converges inside
    the default iteration budget. Raises if the budget is exhausted
    before fixpoint rather than returning silently-wrong labels. For
    10^10-edge graphs the same loop applies with edges/labels as
    bucketed tables (cf. large-star/small-star, Kiveris et al.,
    "Connected Components in MapReduce and Beyond").
    """
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    # localCheckpoint (not cache): iterative DataFrames must TRUNCATE
    # lineage each round or Catalyst re-analyzes an ever-deeper nested
    # plan and iteration time explodes. Local checkpoints are
    # executor-resident; a multi-hour cluster job would use
    # spark.sparkContext.setCheckpointDir + .checkpoint() instead.
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    # labels are monotone non-increasing, so the exact label sum
    # strictly decreases until fixpoint — one agg per iteration replaces
    # a join-based change detector (decimal: no int64 overflow at any n)
    def label_sum(df):
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    prev = label_sum(labels)
    converged = False
    for _ in range(max_iters):
        # neighbor-min: smallest label among my neighbors
        prop = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("_nl"))
            .withColumnRenamed("dst", "id")
        )
        stepped = labels.join(prop, "id", "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("_nl", F.col("label"))).alias("label"),
        )
        # pointer jump: my label's current label (halves chain depth)
        jump = labels.select(F.col("id").alias("_lid"), F.col("label").alias("_ll"))
        labels = (
            stepped.join(jump, stepped["label"] == jump["_lid"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("_ll", F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        cur = label_sum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations"
        )
    return labels.select(F.col("id"), F.col("label").alias("cluster"))


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus after near-dup removal: for each connected component of
    ``pairs`` keep only the canonical (min-id) member; docs in no pair
    survive untouched. The standard last step of a web-corpus dedup
    pipeline (pairs from any of the blockers above)."""
    cc = connected_components(pairs)
    losers = cc.filter(F.col("id") != F.col("cluster")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def _hash64(col, hash_fn: str):
    """64-bit-ish token/ngram hash as a JVM expression.

    ``xxhash64`` (default everywhere) is the scale path — one codegen
    intrinsic. ``md5`` takes the first 15 hex chars of md5 as a base-16
    bigint (< 2^60, always non-negative): slower, but DuckDB computes
    the identical value (``('0x' || substring(md5(x),1,15))::BIGINT``),
    which is what lets the q22 gate entry carry a real oracle."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def _perm_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per permutation (odd multipliers)."""
    params = []
    for i in range(num_perm):
        a = ((2 * i + 1) * 0x9E3779B1) % _PRIME
        b = (i * 0x85EBCA77 + 0xC2B2AE3D) % _PRIME
        params.append((a | 1, b))
    return params


def minhash_signatures(
    docs: DataFrame,
    num_perm: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    grams: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures: shingle → xxhash64 → per-permutation min, all
    as JVM aggregate expressions (num_perm ``min()`` columns in one
    map-side-combinable groupBy). Returns (doc_id, sig array<long>).

    ``grams``: pass an existing ``token_ngrams(docs, ...)`` DataFrame to
    SHARE its subtree with other consumers (see minhash_lsh_pairs) —
    each ``token_ngrams`` call builds fresh lambda-variable ids inside
    its higher-order filter/transform expressions, which defeats
    Spark's exchange-reuse canonicalization, so two textually identical
    calls materialize the shingle shuffle twice."""
    if grams is None:
        grams = token_ngrams(docs, n, text_col, id_col)
    h = grams.select(id_col, F.pmod(_hash64(F.col("ngram"), hash_fn), F.lit(_PRIME)).alias("h"))
    aggs = [
        F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_PRIME))).alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_params(num_perm))
    ]
    sigs = h.groupBy(id_col).agg(*aggs)
    return sigs.select(
        id_col, F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash+LSH near-dup candidates, verified with exact Jaccard.

    band bucketing: signature split into ``bands`` rows of
    ``num_perm/bands`` values; docs sharing any band bucket become
    candidates (shuffle key = (band_idx, band_hash) — high cardinality,
    skew-free); candidates verified with exact n-gram Jaccard so LSH
    recall/precision never changes results, only cost."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    # ONE gram stream (shared DataFrame object) feeds signatures, the
    # verify join's two sides and the size table. Measured r6 notes:
    # Spark does not exchange-reuse this subtree even when shared — the
    # higher-order filter/transform lambdas defeat plan canonicalization
    # (0 ReusedExchange in the formatted plan) — but the duplicate gram
    # stages run CONCURRENTLY, so on an idle cluster their wall cost is
    # ~one stage. Two attempted "fixes" both measured SLOWER end-to-end
    # and were rejected: localCheckpointing grams (+15%: it serialized
    # exactly the work the duplicates overlapped) and repartitioning a
    # single-file corpus to cluster parallelism before the explode
    # (+9%: the extra shuffle + stage rounds outweighed the wider fan).
    grams = token_ngrams(docs, n, text_col, id_col)
    sigs = minhash_signatures(docs, num_perm, n, text_col, id_col, hash_fn,
                              grams=grams)
    banded = sigs.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.md5(
                        F.concat_ws(",", F.slice("sig", bi * rows_per_band + 1, rows_per_band))
                    ).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")
    a = banded.select(F.col(id_col).alias("a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("b"), "band", "bh")
    cands = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # verify candidates with exact jaccard (correctness never depends on
    # LSH); same shared grams subtree as the signatures above
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("sz"))
    return _verify_pairs_exact(cands, grams, sizes, threshold, id_col)


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per doc: token xxhash64, per-bit sign sums as 64
    JVM aggregate expressions (map-side combine; no UDF).

    Returns (doc_id, simhash long). With ``hash_fn="md5"`` the token
    hash carries 60 usable bits (bits 60-62 are constant-zero), which
    weakens the sketch slightly — it exists for the DuckDB oracle twin,
    not for scale runs."""
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", _hash64(F.col("tok"), hash_fn))
    bit_aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(63)  # bit 63 = sign bit; 63-bit simhash avoids overflow
    ]
    per_doc = toks.groupBy(id_col).agg(*bit_aggs)
    expr = None
    for b in range(63):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        expr = term if expr is None else expr + term
    return per_doc.select(F.col(id_col), expr.cast("long").alias("simhash"))


_SIMHASH_BITS = 63  # simhash() emits 63-bit hashes (sign bit unused)


def _chunk_bounds(n_chunks: int, n_bits: int = _SIMHASH_BITS) -> list[tuple[int, int]]:
    """(offset, width) per chunk, widths as even as possible."""
    base, extra = divmod(n_bits, n_chunks)
    bounds, off = [], 0
    for c in range(n_chunks):
        w = base + (1 if c < extra else 0)
        bounds.append((off, w))
        off += w
    return bounds


def simhash_pairs_from_hashes(
    sh: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
) -> DataFrame:
    """Near-pairs from a (id, simhash) DataFrame.

    Blocking: the hash is split into ``max_hamming + 1`` chunks — by
    pigeonhole, a pair within hamming distance ``max_hamming`` differs
    in at most ``max_hamming`` chunks, so it MUST agree on at least one
    chunk; chunk equality is therefore a recall-lossless candidate key.
    Candidates are verified exactly via bit_count(xor).

    Cost note for scale: chunk width = 63/(h+1) bits, so large ``h``
    means few distinct chunk values and quadratic within-bucket pairing
    (h=8 → 7-bit chunks → ≤1152 buckets). For aggressive thresholds on
    a 10^9-doc corpus use minhash_lsh_pairs instead, or pre-partition
    by a coarse shard key; this operator guards with an assertion
    rather than silently losing recall (the round-1 bug: fixed 4 chunks
    guaranteed recall only for h ≤ 3 regardless of the h requested).
    """
    if not 0 <= max_hamming <= 16:
        raise ValueError(
            f"max_hamming={max_hamming} out of range [0, 16]: chunk "
            "blocking degenerates past 16 (chunks < 4 bits); use "
            "minhash_lsh_pairs for looser similarity"
        )
    n_chunks = max_hamming + 1
    chunked = sh.select(
        id_col,
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(hash_col, off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("cv"),
                    )
                    for c, (off, w) in enumerate(_chunk_bounds(n_chunks))
                ]
            )
        ).alias("cc"),
    ).select(id_col, hash_col, "cc.chunk", "cc.cv")
    a = chunked.select(F.col(id_col).alias("a"), F.col(hash_col).alias("ha"), "chunk", "cv")
    b = chunked.select(F.col(id_col).alias("b"), F.col(hash_col).alias("hb"), "chunk", "cv")
    cands = (
        a.join(b, ["chunk", "cv"]).filter(F.col("a") < F.col("b")).select("a", "b", "ha", "hb").distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs over documents: simhash() then
    chunk-blocked pairing with a pigeonhole recall guarantee derived
    from ``max_hamming`` (see simhash_pairs_from_hashes)."""
    sh = simhash(docs, text_col, id_col, hash_fn)
    return simhash_pairs_from_hashes(sh, max_hamming, id_col=id_col)


# cosine primitives shared with the ANN operators (one definition,
# one place to grow numeric guards)
from .similarity import _dot as _vec_dot  # noqa: E402
from .similarity import _norm as _vec_norm  # noqa: E402
from .similarity import ivf_assign, kmeans_centroids  # noqa: E402


def embedding_cosine_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bands: int = 8,
    bits_per_band: int = 12,
    dims: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs by cosine ≥ threshold, blocked by a
    banded random-hyperplane (SimHash-for-vectors) LSH sketch.

    ``n_bands`` independent sketches of ``bits_per_band`` sign bits
    each; a candidate pair must agree on the FULL bit pattern of at
    least one band (shuffle key = (band, band_sketch) — cardinality
    n_bands × 2^bits, skew-free). Per-bit agreement probability for
    angle θ is 1−θ/π, so recall = 1−(1−p^bits)^bands: at cosine 0.95
    the defaults give ~0.97; tighter thresholds do better. Scale
    knobs: grow ``bits_per_band`` with corpus size (smaller buckets,
    each band bucket pairs quadratically) and ``n_bands`` with the
    recall target — the round-1 single full-equality 8-bit sketch had
    only 256 buckets (quadratic at 10^9 vectors) AND ~0.43 recall at
    the 0.95 boundary; banding fixes both at once. Candidates are
    verified with exact cosine (zip_with/aggregate, JVM-side), so
    precision is always exact."""
    import numpy as np

    n_bits = n_bands * bits_per_band
    # deterministic Gaussian hyperplanes (fixed seed), baked into the
    # plan as literals — real random projections, unlike an LCG pattern
    # whose linear structure correlates the planes and wrecks recall
    hp = np.random.RandomState(0xC0FFEE % (2**32)).randn(n_bits, dims)

    planes = [
        F.array(*[F.lit(float(hp[b, d])) for d in range(dims)])
        for b in range(n_bits)
    ]
    bits = [
        F.when(_vec_dot(F.col(vec_col), p) >= 0, F.lit(1 << (i % bits_per_band))).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    band_sketches = []
    for band in range(n_bands):
        sk = None
        for i in range(band * bits_per_band, (band + 1) * bits_per_band):
            sk = bits[i] if sk is None else sk + bits[i]
        band_sketches.append(F.struct(F.lit(band).alias("band"), sk.alias("bsk")))
    # per-vector norm computed ONCE (before the band explode replicates
    # the row n_bands ways), carried to the verify stage
    e = emb.select(
        F.col(id_col),
        F.col(vec_col),
        _vec_norm(F.col(vec_col)).alias("_nrm"),
        F.explode(F.array(*band_sketches)).alias("bb"),
    ).select(id_col, vec_col, "_nrm", "bb.band", "bb.bsk")
    a = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
                 F.col("_nrm").alias("na"), "band", "bsk")
    b2 = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                  F.col("_nrm").alias("nb"), "band", "bsk")
    cands = (
        a.join(b2, ["band", "bsk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "va", "vb", "na", "nb")
        .dropDuplicates(["a", "b"])  # a pair may collide in several bands
    )
    return (
        cands.withColumn(
            "cosine",
            F.round(_vec_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def _rolling_window_grams(
    docs: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """O(n)-per-doc Rabin-Karp window hashes — the long-document path
    of ExactSubstr. The codegen path hashes k tokens per position
    (O(n·k) bytes); here each doc is hashed once: per-token crc32,
    then every k-window's polynomial hash comes from wrapping-uint64
    prefix sums (H_i = B^{i+k-1} · (Q_{i+k-1} − Q_{i−1}) with
    Q_m = Σ t_j·B^{−j}; B odd ⟹ invertible mod 2^64), fully
    numpy-vectorized inside mapInPandas — no Python loop over
    positions. Hash VALUES differ from the codegen xxhash64 (a rolling
    xxhash doesn't exist), but dedup only consumes hash EQUALITY, so
    the resulting spans are identical absent collisions —
    differential-tested. Tokenization mirrors the JVM split
    (ASCII \\s+ with empties dropped) so positions line up."""
    import re
    import zlib

    import numpy as np

    b_int = 0x9E3779B97F4A7C15
    binv_int = pow(b_int, -1, 1 << 64)
    ws = re.compile("[ \\t\\n\\x0b\\f\\r]+")
    schema = f"{id_col} long, pos int, h bigint"

    def run(batches: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        for pdf in batches:
            out_id, out_pos, out_h = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split(text or "") if t]
                n = len(toks)
                if n < k:
                    continue
                t = np.array(
                    [zlib.crc32(w.encode("utf-8")) for w in toks],
                    dtype=np.uint64,
                )
                with np.errstate(over="ignore"):
                    pow_binv = np.empty(n, dtype=np.uint64)
                    pow_binv[0] = 1
                    if n > 1:
                        np.cumprod(
                            np.full(n - 1, binv_int, dtype=np.uint64),
                            out=pow_binv[1:],
                        )
                    pow_b = np.empty(n, dtype=np.uint64)
                    pow_b[0] = 1
                    if n > 1:
                        np.cumprod(
                            np.full(n - 1, b_int, dtype=np.uint64),
                            out=pow_b[1:],
                        )
                    q = np.cumsum(t * pow_binv, dtype=np.uint64)
                    hi = q[k - 1:]                      # Q_{i+k-1}
                    lo = np.concatenate(
                        (np.zeros(1, dtype=np.uint64), q[: n - k])
                    )                                    # Q_{i-1}
                    h = (pow_b[k - 1:] * (hi - lo)).astype(np.int64)
                out_id.extend([did] * (n - k + 1))
                out_pos.extend(range(n - k + 1))
                out_h.extend(h.tolist())
            yield pd.DataFrame({id_col: out_id, "pos": out_pos, "h": out_h})

    return docs.select(id_col, text_col).mapInPandas(run, schema)


def exact_substring_dedup(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hasher: str = "codegen",
) -> DataFrame:
    """Exact substring dedup: remove every token span covered by a
    k-token window that occurs >= ``min_count`` times corpus-wide
    (the ExactSubstr technique of Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — their suffix-array
    match becomes a distributed window-hash join here).

    Windows are case-sensitive whitespace token k-grams hashed with
    ``xxhash64``; a window's total occurrence count (same-doc repeats
    included, as in the paper) reaching ``min_count`` marks ALL its
    occurrences for removal. Overlapping marked windows are merged
    into maximal spans per doc (JVM ``aggregate`` fold over sorted
    positions — with fixed k, sorted starts give monotone ends, so the
    fold is a plain last-interval extend). Surviving tokens are
    reassembled in order, single-space joined.

    Scale shape (100 TB): the one big shuffle is the groupBy on the
    64-bit window hash — high-cardinality, skew-free, map-side
    partial counts. The explode emits one row per token position
    (~n rows/doc) and each hash reads k tokens (O(n*k) bytes hashed,
    all whole-stage codegen — the ``hasher="codegen"`` default, which
    wins on simplicity at k=50 and stays embarrassingly parallel).
    ``hasher="rolling"`` swaps the gram stage for the O(n)-per-doc
    Rabin-Karp path (:func:`_rolling_window_grams`, numpy-vectorized
    mapInPandas) — the right trade for long-document corpora where
    n·k byte-hashing dominates; both paths produce identical spans
    (differential-tested) since downstream consumes hash equality
    only. The dup-hash set joins back hash-to-hash; AQE broadcasts it
    when the duplicated fraction is small (the common case).

    Returns (id_col, text_dedup, n_tokens, n_tokens_dropped, n_spans);
    docs shorter than k tokens pass through untouched.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    if hasher not in ("codegen", "rolling"):
        raise ValueError(f"hasher must be 'codegen' or 'rolling', got {hasher!r}")
    toks = docs.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "").alias("t"),
    )
    if hasher == "rolling":
        grams = _rolling_window_grams(docs, k, text_col, id_col)
    else:
        # one (pos, hash) per window start; sequence(0, -1) descends, so guard
        windows_expr = F.when(
            F.size("t") >= k,
            F.transform(
                F.sequence(F.lit(0), F.size("t") - k),
                lambda p: F.struct(
                    p.alias("pos"),
                    F.xxhash64(F.concat_ws("\x1f", F.slice("t", p + 1, k))).alias("h"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))
        grams = toks.select(id_col, F.explode(windows_expr).alias("w")).select(
            id_col, "w.pos", "w.h"
        )
    dup_hashes = (
        grams.groupBy("h").agg(F.count("*").alias("c")).filter(F.col("c") >= min_count).select("h")
    )
    # sorted duplicated-window starts per doc, folded to disjoint spans
    per_doc = (
        grams.join(dup_hashes, "h")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("ps"))
        .select(
            id_col,
            F.aggregate(
                "ps",
                F.array().cast("array<struct<s:int,e:int>>"),
                lambda acc, p: F.when(
                    (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["e"]),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1),
                        F.array(
                            F.struct(
                                F.element_at(acc, -1)["s"].alias("s"),
                                (p + k).alias("e"),
                            )
                        ),
                    ),
                ).otherwise(
                    F.concat(acc, F.array(F.struct(p.alias("s"), (p + k).alias("e"))))
                ),
            ).alias("spans"),
        )
    )
    joined = toks.join(per_doc, id_col, "left").select(
        id_col,
        "t",
        F.coalesce("spans", F.array().cast("array<struct<s:int,e:int>>")).alias("spans"),
    )
    idx = F.when(F.size("t") > 0, F.sequence(F.lit(0), F.size("t") - 1)).otherwise(
        F.array().cast("array<int>")
    )
    kept = F.filter(
        idx,
        lambda i: ~F.exists("spans", lambda sp: (i >= sp["s"]) & (i < sp["e"])),
    )
    return joined.select(
        id_col,
        F.array_join(
            F.transform(kept, lambda i: F.element_at("t", i + 1)), " "
        ).alias("text_dedup"),
        F.size("t").alias("n_tokens"),
        (F.size("t") - F.size(kept)).alias("n_tokens_dropped"),
        F.size("spans").alias("n_spans"),
    )


def _blocked_cell_pairs(assigned: DataFrame, cell_cap: int) -> DataFrame:
    """Within-cell self-join with per-task work bounded by ``cell_cap²``.

    A near-duplicate-heavy corpus — the exact case SemDeDup targets —
    can collapse most vectors into one k-means cell, degenerating the
    naive within-cell self-join toward a single all-pairs task. Guard:
    split each cell of size m into ``g = ceil(m / cell_cap)`` hash
    blocks and join block-pair keys (lo <= hi) instead of the bare
    cell id, the classic triangle-blocking self-join. Every unordered
    pair is covered exactly once:

    * cross-block pair (block(x) != block(y)): x replicates its own
      block as ``lo`` across ``hi`` in [block(x), g), y replicates
      ``lo`` in [0, block(y)] with its own block as ``hi`` — they meet
      only at (min(bx,by), max(bx,by)), once.
    * same-block pair: both rows land on the diagonal key (s, s) from
      both sides; the ``a < b`` filter keeps one orientation.

    Per row replication is g+1 across both sides; per-task pair work
    is ~cell_cap², independent of the largest cell, and total work is
    unchanged (SemDeDup semantics need every within-cell pair). Cells
    of size <= cell_cap get g=1, which reduces to the plain self-join.

    Side columns: ``_v`` (always) and, when present, the precomputed
    per-vector norm ``_n`` (r6) are carried as ``_va/_vb`` and
    ``_na/_nb`` — the verify stage then multiplies two cached norms
    instead of re-folding 2×dims elements per pair. Direct callers with
    a bare (_id, _v, centroid_id) frame keep the old output shape.
    """
    carry = [c for c in ("_v", "_n") if c in assigned.columns]

    def side(tag: str):
        return [F.col(c).alias(f"{c}{tag}") for c in carry]

    sizes = assigned.groupBy("centroid_id").agg(F.count("*").alias("_csz"))
    # one metadata-scale agg over the checkpointed assignment decides the
    # path: the common (unskewed) case pays NO row replication and no
    # 3-key join — only skewed tables enter the triangle blocking
    h = sizes.agg(
        F.max("_csz").alias("mx"),
        F.avg("_csz").alias("avg"),
        F.sum(F.when(F.col("_csz") > cell_cap, 1).otherwise(0)).alias("over"),
        F.count("*").alias("cells"),
    ).collect()[0]
    _LOG.info(
        "semdedup cell histogram: %d cells, max=%d avg=%.1f, %d over cap=%d",
        h["cells"], h["mx"] or 0, h["avg"] or 0.0, h["over"] or 0, cell_cap,
    )
    if (h["mx"] or 0) <= cell_cap:
        a = assigned.select(F.col("_id").alias("a"), *side("a"), "centroid_id")
        b = assigned.select(F.col("_id").alias("b"), *side("b"), "centroid_id")
        return a.join(b, "centroid_id").where(F.col("a") < F.col("b"))
    blocks = sizes.select(
        "centroid_id",
        F.ceil(F.col("_csz") / cell_cap).cast("int").alias("_g"),
    )
    sized = assigned.join(F.broadcast(blocks), "centroid_id")
    blk = F.pmod(F.xxhash64("_id"), F.col("_g")).cast("int")
    left = sized.select(
        "centroid_id",
        F.col("_id").alias("a"),
        *side("a"),
        blk.alias("_lo"),
        F.explode(F.sequence(blk, F.col("_g") - 1)).alias("_hi"),
    )
    right = sized.select(
        "centroid_id",
        F.col("_id").alias("b"),
        *side("b"),
        F.explode(F.sequence(F.lit(0), blk)).alias("_lo"),
        blk.alias("_hi"),
    )
    return (
        left.join(right, ["centroid_id", "_lo", "_hi"])
        .where((F.col("_lo") < F.col("_hi")) | (F.col("a") < F.col("b")))
        .select(
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
            *[F.col(f"{c}a") for c in carry],
            *[F.col(f"{c}b") for c in carry],
            "centroid_id",
        )
    )


def semdedup_pairs(
    emb: DataFrame,
    n_clusters: int,
    threshold: float = 0.95,
    kmeans_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    cell_cap: int | None = 8192,
) -> DataFrame:
    """SemDeDup candidate pairs (Abbas et al. 2023): k-means the
    embedding space, then compare pairs ONLY within a cluster.

    The paper's observation is that semantic duplicates land in the
    same k-means cell, so the O(N^2) global comparison collapses to
    sum-of-squares over cells — pick ``n_clusters`` so the expected cell
    size keeps the per-cell self-join tractable (paper: 11k clusters
    for 233M docs). Clustering reuses `similarity.kmeans_centroids`
    (deterministic init, Arrow-vectorized assignment); the within-cell
    join + exact cosine verify are JVM built-ins. The assignment is
    localCheckpoint'd so the pandas-UDF assign stage runs once, not
    once per join side.

    ``cell_cap`` guards the skewed-cell case: cells larger than the cap
    are triangle-blocked (`_blocked_cell_pairs`) so no single task ever
    joins more than ~cap² candidate pairs, whatever the cell-size
    distribution. The pair set is provably identical to the unguarded
    join (tested); pass ``cell_cap=None`` for the bare self-join.

    Returns (a, b, cos, centroid_id) with a < b and cos >= threshold.
    """
    cents = kmeans_centroids(
        emb, n_clusters, iters=kmeans_iters, id_col=id_col, vec_col=vec_col
    )
    # r6 plan shape: each vector's norm is computed ONCE here and
    # checkpointed with the assignment; the within-cell verify then
    # multiplies two cached norms per pair instead of re-folding 2×dims
    # elements per pair (a 3x cut of the verify stage's fold work).
    # Values are bit-identical — same per-row norm expression.
    assigned = (
        ivf_assign(emb, cents, vec_col=vec_col, id_col=id_col)
        .select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                _vec_norm(F.col(vec_col)).alias("_n"),
                "centroid_id")
        .localCheckpoint()
    )
    if cell_cap is not None:
        paired = _blocked_cell_pairs(assigned, int(cell_cap))
    else:
        a = assigned.select(
            F.col("_id").alias("a"), F.col("_v").alias("_va"),
            F.col("_n").alias("_na"), "centroid_id"
        )
        b = assigned.select(
            F.col("_id").alias("b"), F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"), "centroid_id"
        )
        paired = a.join(b, "centroid_id").where(F.col("a") < F.col("b"))
    cos = _vec_dot(F.col("_va"), F.col("_vb")) / (
        F.col("_na") * F.col("_nb")
    )
    return (
        paired.withColumn("cos", cos)
        .where(F.col("cos") >= F.lit(float(threshold)))
        .select("a", "b", "cos", "centroid_id")
    )


def semdedup(
    docs: DataFrame,
    emb: DataFrame,
    n_clusters: int,
    threshold: float = 0.95,
    kmeans_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus after SemDeDup pruning: within every k-means cell, docs
    whose embeddings are near-identical (cos >= threshold) collapse to
    one representative (min-id canonical via the shared
    connected-components + keep-canonical path, consistent with the
    other dedup operators; the paper keeps the member farthest from the
    centroid instead — swap the keep rule by consuming
    `semdedup_pairs` directly if that variant is wanted)."""
    pairs = semdedup_pairs(
        emb, n_clusters, threshold, kmeans_iters, vec_col, id_col
    )
    return dedup_keep_canonical(docs, pairs.select("a", "b"), id_col=id_col)
