"""BM25 full-text retrieval over crawled documents.

The Go reference stores extracted items in Redis and has no search
surface (`/root/reference/pkg/storage/redis/repository.go:95-248` —
Get by id / Scan by cursor, point lookups only);
a webtext corpus at 10^10 pages needs ranked retrieval both for serving
and for corpus analysis (probe-query audits for decontamination, topic
coverage checks, hard-negative mining for quality classifiers). This
implements the classic Okapi BM25 ranking (Robertson & Walker, TREC-3)
with Lucene's non-negative idf variant::

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(q, d) = sum over distinct t in q of
                  idf(t) * tf_td * (k1 + 1)
                         / (tf_td + k1 * (1 - b + b * dl_d / avgdl))

Query-side term frequency is intentionally ignored (each DISTINCT query
term contributes once) — the common engine behavior for short web
queries.

Tokenization matches the engine-wide convention used by the perplexity
LM and token stats (lowercase, split on whitespace runs, drop empties)
so one tokenizer definition covers training, quality filters and
retrieval.

Scale design (10^10 docs):

* ``build_bm25_index`` is the corpus-wide one-off: ONE explode over the
  text column (all JVM built-ins — ``split``/``explode``; no Python in
  the path) feeding two map-side-partial aggregations, (term, doc) → tf
  and doc → dl. The postings DataFrame IS the inverted index: persisted
  bucketed-by-term it serves point-term lookups with partition pruning,
  exactly like the seen-set's bucket layout. df per term and the
  (N, avgdl) scalars derive from postings/doclens — no extra corpus
  scan.
* ``bm25_topk`` joins the tiny distinct (query, term) set against
  postings ON TERM — a broadcast join (queries are human-scale; the
  corpus never re-shuffles), so a query batch touches only the postings
  of its own terms. Per-(query, doc) scoring is one map-side-partial
  sum; the final top-k is a literal-bounded ``row_number`` window that
  plans as WindowGroupLimit (map-side partial top-k below the
  query-key shuffle) — never a global sort.
* Ranking determinism across engines: doubles summed in different
  orders differ in the last ulp, so ranks order by the score ROUNDED to
  6 decimals (ulp-noise-proof) with doc id as the tiebreak. The DuckDB
  twin (tests + gate oracle) replays the same rounded ordering, making
  the whole pipeline hash-comparable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "Bm25Index",
    "build_bm25_index",
    "bm25_topk",
    "write_bm25_index",
    "append_bm25_index",
    "read_bm25_index",
]

# engine-wide tokenizer: lowercase, split on whitespace runs, drop empties
_WS = r"\s+"


def _tokens(col: str) -> F.Column:
    return F.filter(F.split(F.lower(F.col(col)), _WS), lambda x: x != "")


@dataclass
class Bm25Index:
    """Inverted index + corpus stats. ``postings`` carries one row per
    (term, doc) with the term frequency and the doc's length so scoring
    needs no extra join; ``docfreq`` is vocabulary-sized; ``n_docs`` /
    ``avgdl`` are the two corpus scalars (avgdl over docs with >= 1
    token — empty docs can never match and would only dilute the
    normalization)."""

    postings: DataFrame  # term, doc, tf, dl
    docfreq: DataFrame  # term, df
    n_docs: int
    avgdl: float


def build_bm25_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> Bm25Index:
    """One tokenize pass, ONE shuffle (guide §2.4).

    ``dl`` (doc token count) is projected from the token array at
    tokenization time and rides the (term, doc) aggregation as a
    ``min`` (constant per doc), instead of being re-derived from the
    postings with a second groupBy(doc) + a join back onto the postings
    — that join re-shuffled the whole postings table by doc for a value
    already known at the scan. ``sum(tf) over terms of a doc`` equals
    ``size(tokens)`` exactly (every exploded token lands in exactly one
    (term, doc) group), so the dl values are identical. The (N, avgdl)
    corpus scalars likewise come straight from the doc scan — a
    shuffle-free partial aggregation instead of a full postings build
    for two scalars. Contract (unchanged, same as append_bm25_index):
    doc ids are unique."""
    tok_arr = docs.select(F.col(id_col).alias("doc"), _tokens(text_col).alias("_t"))
    toks = tok_arr.select(
        "doc",
        F.size("_t").alias("dl"),
        F.explode("_t").alias("term"),
    )
    postings = (
        toks.groupBy("term", "doc")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
        .select("term", "doc", "tf", "dl")
    )
    docfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = (
        tok_arr.select(F.size("_t").alias("dl"))
        .where(F.col("dl") > 0)  # empty docs never enter the postings
        .agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
        .first()
    )
    return Bm25Index(
        postings=postings,
        docfreq=docfreq,
        n_docs=int(stats["n"] or 0),
        avgdl=float(stats["avgdl"] or 0.0),
    )


_STATS_DDL = "n_docs long, avgdl double"


def write_bm25_index(cat, index: Bm25Index, name: str = "bm25",
                     n_buckets: int = 64) -> None:
    """Persist the index as catalog tables — the serving path. The
    postings table is bucket-partitioned on term (the same Iceberg-style
    ``bucket(N, col)`` layout the seen-set uses), so a query batch reads
    only its own terms' buckets (see :func:`read_bm25_index`); docfreq
    is vocabulary-sized and stays unpartitioned; the two corpus scalars
    land via a driver-side row append (no Spark job). Re-writing under
    the same name replaces the index (snapshot-versioned, so readers of
    the previous snapshot are unaffected — the catalog's time travel)."""
    from ..tables.catalog import BUCKET_COL, bucket_of

    post = index.postings.withColumn(BUCKET_COL, bucket_of(F.col("term"), n_buckets))
    cat.overwrite(f"{name}_postings", post, partition_by=BUCKET_COL,
                  bucket_spec=("term", n_buckets))
    cat.overwrite(f"{name}_docfreq", index.docfreq)
    if cat.exists(f"{name}_stats"):
        cat.drop(f"{name}_stats")
    cat.append_local_rows(f"{name}_stats",
                          [(index.n_docs, float(index.avgdl))], _STATS_DDL)


def append_bm25_index(cat, new_docs: DataFrame, name: str = "bm25",
                      id_col: str = "doc_id", text_col: str = "text") -> None:
    """Incremental index maintenance — the crawl's shape: each round
    appends newly fetched documents, so the index grows by appending the
    NEW docs' postings (tokenize + aggregate over the new batch only —
    never a corpus re-scan) into the bucketed postings table, then
    re-deriving docfreq and the two corpus scalars from the postings
    table itself (term-cardinality work, a tiny fraction of a corpus
    scan; this is exactly how the stats stay consistent without reading
    any document twice).

    Contract: ``new_docs`` ids must be NEW (the crawl's items table is
    keyed and re-crawls go through upsert, not append) — appending an
    existing doc_id would double its postings, same as appending a
    duplicate row to any Iceberg table."""
    from ..tables.catalog import BUCKET_COL, bucket_of

    spec = cat.bucket_spec(f"{name}_postings")
    n_buckets = int(spec[1]) if spec else 64
    delta = build_bm25_index(new_docs, id_col=id_col, text_col=text_col)
    post = delta.postings.withColumn(BUCKET_COL, bucket_of(F.col("term"), n_buckets))
    cat.append(f"{name}_postings", post, partition_by=BUCKET_COL,
               bucket_spec=("term", n_buckets))
    merged = cat.read(f"{name}_postings")
    cat.overwrite(f"{name}_docfreq",
                  merged.groupBy("term").agg(F.count(F.lit(1)).alias("df")))
    doclens = merged.groupBy("doc").agg(F.first("dl").alias("dl"))
    stats = doclens.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")).first()
    if cat.exists(f"{name}_stats"):
        cat.drop(f"{name}_stats")
    cat.append_local_rows(f"{name}_stats",
                          [(int(stats["n"]), float(stats["avgdl"]))], _STATS_DDL)


def read_bm25_index(cat, name: str = "bm25",
                    query_terms: list[str] | None = None) -> Bm25Index:
    """Load a persisted index. With ``query_terms``, the postings read
    is PRUNED to those terms' buckets (hive partition filter on the
    bucket column → the scan never opens other buckets' files — at
    archive scale that is the difference between touching ~k/N_buckets
    of the index and a full scan per query batch). Scores are identical
    to the unpruned index: postings of non-query terms can never join a
    query term. docfreq and the corpus scalars are global inputs and
    load whole (vocabulary-sized and 1 row)."""
    from ..tables.catalog import BUCKET_COL, bucket_of

    post = cat.read(f"{name}_postings")
    if query_terms is not None:
        spec = cat.bucket_spec(f"{name}_postings")
        if spec:
            import re as _re

            n_b = int(spec[1])
            # run each entry through the engine tokenizer (split on
            # whitespace runs, drop empties): a multi-word entry like
            # 'fast join' hashed as ONE term would prune to the wrong
            # bucket and silently return partial results (ADVICE r5)
            terms = sorted(
                {w for t in query_terms for w in _re.split(r"\s+", t.lower()) if w}
            )
            tdf = cat.spark.createDataFrame([(t,) for t in terms], "term string")
            buckets = sorted(
                {r[0] for r in tdf.select(bucket_of(F.col("term"), n_b).alias("b")).collect()}
            )
            post = post.where(F.col(BUCKET_COL).isin(buckets))
    stats = cat.read(f"{name}_stats").first()
    return Bm25Index(
        postings=post.drop(BUCKET_COL),
        docfreq=cat.read(f"{name}_docfreq"),
        n_docs=int(stats["n_docs"]),
        avgdl=float(stats["avgdl"]),
    )


def bm25_topk(
    index: Bm25Index,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
) -> DataFrame:
    """Top-k documents per query by BM25. Returns
    (query_id, doc, score6, dl, rn) with rn = 1 the best match and
    score6 the 6-decimal-rounded BM25 score (see module notes on
    cross-engine rank determinism). Only documents containing at least
    one query term appear (score > 0 by construction with the Lucene
    idf, which is non-negative even for df = N)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if index.n_docs == 0:
        raise ValueError("empty index")
    qterms = (
        queries.select(
            F.col(qid_col).alias("query_id"),
            F.explode(_tokens(qtext_col)).alias("term"),
        )
        .distinct()
        .join(index.docfreq, "term")  # drop out-of-vocabulary terms early
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(index.n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
    )
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(index.avgdl)
    )
    contrib = F.col("idf") * tf * F.lit(k1 + 1.0) / norm
    scored = (
        index.postings.join(F.broadcast(qterms), "term")
        .select("query_id", "doc", "dl", contrib.alias("contrib"))
        .groupBy("query_id", "doc", "dl")
        .agg(F.round(F.sum("contrib"), 6).alias("score6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score6").desc(), F.col("doc").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "doc", "score6", "dl", "rn")
    )
