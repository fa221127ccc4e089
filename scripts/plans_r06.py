"""Capture .explain("formatted") for every bench query (guide §1 / §7.2).

Builds the SAME DataFrames the frozen bench.py constructs (importing its
module-level helpers) and writes plans/r06/<query>_<tag>.txt. Run once
before optimizing (tag=before) and once after (tag=after):

    python scripts/plans_r06.py before
    python scripts/plans_r06.py after [query,query,...]

crawl_round is a multi-action loop, not one DataFrame; its sub-plans are
captured separately where touched (see OPTIMIZATION_r06.md).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (frozen harness: reuse its constructors)
from pyspark.sql import functions as F  # noqa: E402

from gocrawler_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r06")


def _dump(name: str, tag: str, df):
    os.makedirs(OUT, exist_ok=True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    path = os.path.join(OUT, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path}")


def plan_schedule_dedupe(spark):
    from gocrawler_spark.datagen import hosts_list
    from gocrawler_spark.operators.frontier import admission_filter, normalize_candidates
    from gocrawler_spark.operators.politeness import select_fetch_set
    from gocrawler_spark.operators.robots import compile_robots, robots_filter
    from gocrawler_spark.profiles import synthetic_profile

    n_hosts = 200
    hosts = hosts_list(n_hosts)
    profile = synthetic_profile(tuple(hosts))
    cand = bench.synthetic_frontier(spark, bench.N_FRONTIER, n_hosts)
    seen = bench.synthetic_frontier(spark, bench.N_FRONTIER // 2, n_hosts).select(
        F.md5(F.concat("url", F.when(F.pmod(F.xxhash64("url"), 5) == 0, F.lit(""))
                       .otherwise(F.lit("#prev")))).alias("url_hash"))
    robots = spark.createDataFrame(
        [(h, "*", "disallow" if k == 3 else "allow",
          "/Mixup/detproducto" if k == 3 else "/", 1500)
         for k, h in enumerate(hosts)],
        "host string, agent string, rule string, path_prefix string, crawl_delay_ms long",
    )
    compiled = compile_robots(robots)
    c = normalize_candidates(cand)
    c = admission_filter(c, profile)
    c = robots_filter(c, robots, compiled=compiled)
    new = c.join(seen.hint("shuffle_hash"), "url_hash", "left_anti")
    sel = select_fetch_set(new, credit_per_host=256, salt_parts=16)
    return sel.filter("is_selected")


def plan_minhash_lsh(spark):
    from gocrawler_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(os.path.join(bench.SF_DIR, "documents.parquet"))
    return minhash_lsh_pairs(docs, num_perm=64, bands=16, threshold=0.9)


def plan_ann_bruteforce(spark):
    from gocrawler_spark.operators.similarity import cosine_topk_bruteforce

    emb = spark.read.parquet(os.path.join(bench.SF_DIR, "embeddings.parquet")).withColumn(
        "embedding", F.col("embedding").cast("array<double>"))
    queries = emb.filter("vec_id < 50").select(F.col("vec_id").alias("q_id"), "embedding")
    corpus = emb.filter("vec_id >= 50")
    return cosine_topk_bruteforce(corpus, queries, k=10)


def plan_fetch_join(spark):
    o = spark.read.parquet(os.path.join(bench.SF_DIR, "orders.parquet"))
    l = spark.read.parquet(os.path.join(bench.SF_DIR, "lineitem.parquet"))
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")).alias("rc"))
    )


def plan_page_extract(spark):
    from gocrawler_spark.operators.extraction import extract_fetched
    from gocrawler_spark.profiles import synthetic_profile

    hosts = tuple(f"shop{k:03d}.example" for k in range(16))
    profile = synthetic_profile(hosts)
    fetched = spark.range(100).select(
        F.concat(F.lit("https://shop000.example/x"), F.col("id").cast("string")).alias("url"),
        F.md5(F.col("id").cast("string")).alias("url_hash"),
        F.lit("shop000.example").alias("host"),
        F.lit(1).alias("depth"), F.lit(0).alias("priority"),
        F.col("id").alias("fetch_rank"),
        F.encode(F.lit("<html></html>"), "utf-8").alias("html"),
    )
    return (
        extract_fetched(fetched, profile)
        .select(F.size("links").alias("nl"), F.length("text").alias("nt"))
        .agg(F.sum("nl"), F.sum("nt"), F.count(F.lit(1)))
    )


def plan_trap_scan(spark):
    from gocrawler_spark.operators.traps import host_trap_stats

    cand = bench.synthetic_frontier(spark, bench.N_FRONTIER, 200)
    return (
        host_trap_stats(cand, min_urls=1000, max_urls_per_template=200)
        .agg(F.count(F.lit(1)).alias("hosts"),
             F.sum(F.col("is_trap").cast("int")).alias("traps"))
    )


def plan_recrawl(spark):
    from gocrawler_spark.operators.recrawl import recrawl_priorities, select_recrawl_set

    n_urls = max(bench.N_FRONTIER // 4, 1000)
    hist = (
        bench.synthetic_frontier(spark, n_urls, 200)
        .select("url")
        .withColumn("f", F.explode(F.array(*[F.lit(i) for i in range(4)])))
        .select(
            "url",
            (F.col("f") * 3600.0).alias("fetch_ts"),
            F.md5(F.concat(F.col("url"),
                           F.when(F.pmod(F.xxhash64("url"), 2) == 0,
                                  F.col("f").cast("string"))
                           .otherwise(F.lit("static")))).alias("content_hash"),
        )
    )
    pri = recrawl_priorities(hist, now=4 * 3600.0)
    return select_recrawl_set(pri, per_host_budget=256)


def plan_quality_dsir(spark):
    from gocrawler_spark.operators.dsir import fit_feature_dist, importance_weights
    from gocrawler_spark.operators.quality import perplexity, train_bigram_lm

    reps = 20
    base = spark.read.parquet(os.path.join(bench.SF_DIR, "documents.parquet")).select("doc_id", "text")
    corpus = (
        base.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .select((F.col("doc_id") * reps + F.col("r")).alias("doc_id"), "text")
    )
    trusted = corpus.filter(F.pmod(F.xxhash64("doc_id"), 20) == 0)
    rest = corpus.filter(F.pmod(F.xxhash64("doc_id"), 20) != 0)
    lm = train_bigram_lm(trusted)
    scored = perplexity(rest, lm)
    t_dist, r_dist = fit_feature_dist(trusted), fit_feature_dist(rest)
    w = importance_weights(rest, t_dist, r_dist)
    return {"quality_ppl": scored, "quality_weights": w}


def plan_semdedup(spark):
    from gocrawler_spark.operators.dedup import semdedup_pairs

    n = 60000
    dims, clusters = 64, 512
    idx = F.sequence(F.lit(0), F.lit(dims - 1))
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(idx, lambda i: F.sin(F.xxhash64("id", i))).alias("embedding"),
    )
    planted = spark.range(n // 500).select(
        (F.col("id") + n).alias("vec_id"),
        F.transform(
            idx,
            lambda i: F.sin(F.xxhash64(F.col("id") * 500, i))
            + F.when(i == 0, F.lit(1e-3)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    emb = base.unionByName(planted).repartition(bench.CPUS * 2)
    return semdedup_pairs(emb, n_clusters=clusters, threshold=0.95,
                          kmeans_iters=1, id_col="vec_id")


def plan_cdx_index(spark):
    from gocrawler_spark.sources.cdx import cdx_lines

    n = max(bench.N_FRONTIER // 4, 10_000)
    rows = (
        bench.synthetic_frontier(spark, n, 200)
        .select(
            "url",
            F.lit("2021-06-01T00:00:00Z").alias("wdate"),
            F.lit(200).alias("status"),
            F.lit("text/html").alias("mime"),
            F.concat(F.lit("sha1:"), F.upper(F.md5("url"))).alias("digest"),
            F.format_string("part-%05d.warc.gz",
                            F.pmod(F.xxhash64("url"), 100).cast("int")).alias("filename"),
            F.pmod(F.xxhash64("url", F.lit(7)), 1 << 30).alias("offset"),
            (F.pmod(F.xxhash64("url", F.lit(8)), 100_000) + 500).alias("length"),
        )
    )
    return (
        cdx_lines(rows)
        .repartitionByRange(bench.CPUS, "urlkey", "ts")
        .sortWithinPartitions("urlkey", "ts")
    )


def plan_bm25(spark):
    from gocrawler_spark.operators.retrieval import bm25_topk, build_bm25_index

    n_docs = 100000
    vocab = F.array(*[F.lit(f"w{v:03d}") for v in range(512)])
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), (F.pmod(F.xxhash64("id"), 41) + 40).cast("int")),
            lambda i: F.element_at(vocab, (F.pmod(F.xxhash64(F.col("id"), i), 512) + 1).cast("int")),
        ),
    )
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"), text.alias("text"))
    queries = spark.range(128).select(
        F.col("id").alias("query_id"),
        F.concat_ws(
            " ",
            F.element_at(vocab, (F.pmod(F.xxhash64("id", F.lit(1)), 512) + 1).cast("int")),
            F.element_at(vocab, (F.pmod(F.xxhash64("id", F.lit(2)), 512) + 1).cast("int")),
            F.element_at(vocab, (F.pmod(F.xxhash64("id", F.lit(3)), 512) + 1).cast("int")),
        ).alias("query_text"),
    )
    idx = build_bm25_index(docs)
    return bm25_topk(idx, queries, k=10)


PLANS = {
    "schedule_dedupe": plan_schedule_dedupe,
    "minhash_lsh": plan_minhash_lsh,
    "ann_bruteforce": plan_ann_bruteforce,
    "fetch_join": plan_fetch_join,
    "page_extract": plan_page_extract,
    "trap_scan": plan_trap_scan,
    "recrawl": plan_recrawl,
    "quality_dsir": plan_quality_dsir,
    "semdedup": plan_semdedup,
    "cdx_index": plan_cdx_index,
    "bm25": plan_bm25,
}


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark(cpus=bench.CPUS, app_name="gocrawler-plans-r06",
                      shuffle_partitions=max(bench.CPUS * 2, 16))
    for name, fn in PLANS.items():
        if only and name not in only:
            continue
        out = fn(spark)
        if isinstance(out, dict):
            for sub, df in out.items():
                _dump(sub, tag, df)
        else:
            _dump(name, tag, out)
    spark.stop()


if __name__ == "__main__":
    main()
