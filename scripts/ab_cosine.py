"""In-process A/B: interpreted fold cosine vs codegen unroll (r6).

Same Spark session, warmup + alternating timed reps, noop-equivalent
action (count of the top-k output — identical for both variants).
Also asserts the two variants return IDENTICAL rows (bit-equality of
the rounded cosine and the full ranking).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from gocrawler_spark.session import default_parallelism, get_spark
from gocrawler_spark.operators.similarity import (
    _dot, _norm, cosine_topk_bruteforce,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_topk(emb, queries, k=10, vec_col="embedding", id_col="vec_id", q_id_col="q_id"):
    """The pre-r6 plan: fold dot + per-pair norms."""
    q = queries.select(F.col(q_id_col), F.col(vec_col).alias("_qv"))
    c = emb.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        q_id_col, id_col,
        F.round(_dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv"))), 6).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "rank", "cosine")
    )


def main():
    cpus = default_parallelism()
    spark = get_spark(cpus=cpus, app_name="ab-cosine",
                      shuffle_partitions=max(cpus * 2, 16))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).withColumn(
        "embedding", F.col("embedding").cast("array<double>"))
    queries = emb.filter("vec_id < 50").select(F.col("vec_id").alias("q_id"), "embedding").cache()
    corpus = emb.filter("vec_id >= 50").cache()
    n = corpus.count(); queries.count()
    print(f"corpus={n}")

    variants = {"old_fold": lambda: old_topk(corpus, queries, k=10),
                "new_unrolled": lambda: cosine_topk_bruteforce(corpus, queries, k=10)}
    # identity check
    a = sorted(map(tuple, variants["old_fold"]().collect()))
    b = sorted(map(tuple, variants["new_unrolled"]().collect()))
    assert a == b, "variant results differ!"
    print("results identical:", len(a), "rows")

    for name, fn in variants.items():  # warmup both
        fn().count()
    times = {k: [] for k in variants}
    for rep in range(5):
        for name, fn in variants.items():
            t0 = time.time()
            fn().count()
            times[name].append(round(time.time() - t0, 3))
    for name, ts in times.items():
        print(name, "min", min(ts), "all", ts)
    spark.stop()


if __name__ == "__main__":
    main()
