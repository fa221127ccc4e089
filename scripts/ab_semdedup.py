"""In-process A/B: pre-r6 semdedup_pairs (per-pair norm folds) vs the
r6 version (norms computed once per vector, checkpointed with the
assignment). Same session, same synthetic corpus as bench_semdedup,
identity-asserted, warmup + alternating reps."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gocrawler_spark.session import default_parallelism, get_spark
from gocrawler_spark.operators.dedup import semdedup_pairs, _vec_dot, _vec_norm
from gocrawler_spark.operators.similarity import ivf_assign, kmeans_centroids


def old_semdedup_pairs(emb, n_clusters, threshold=0.95, kmeans_iters=1,
                       vec_col="embedding", id_col="vec_id", cell_cap=8192):
    from gocrawler_spark.operators.dedup import _blocked_cell_pairs

    cents = kmeans_centroids(emb, n_clusters, iters=kmeans_iters,
                             id_col=id_col, vec_col=vec_col)
    assigned = (
        ivf_assign(emb, cents, vec_col=vec_col, id_col=id_col)
        .select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "centroid_id")
        .localCheckpoint()
    )
    paired = _blocked_cell_pairs(assigned, int(cell_cap))
    cos = _vec_dot(F.col("_va"), F.col("_vb")) / (
        _vec_norm(F.col("_va")) * _vec_norm(F.col("_vb"))
    )
    return (
        paired.withColumn("cos", cos)
        .where(F.col("cos") >= F.lit(float(threshold)))
        .select("a", "b", "cos", "centroid_id")
    )


def main():
    cpus = default_parallelism()
    spark = get_spark(cpus=cpus, app_name="ab-semdedup",
                      shuffle_partitions=max(cpus * 2, 16))
    n = int(os.environ.get("N", "60000"))
    dims, clusters = 64, 512
    idx = F.sequence(F.lit(0), F.lit(dims - 1))
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(idx, lambda i: F.sin(F.xxhash64("id", i))).alias("embedding"),
    )
    planted = spark.range(n // 500).select(
        (F.col("id") + n).alias("vec_id"),
        F.transform(idx, lambda i: F.sin(F.xxhash64(F.col("id") * 500, i))
                    + F.when(i == 0, F.lit(1e-3)).otherwise(F.lit(0.0))).alias("embedding"),
    )
    emb = base.unionByName(planted).repartition(cpus * 2).cache()
    emb.count()

    variants = {
        "old": lambda: old_semdedup_pairs(emb, clusters, 0.95, 1),
        "new": lambda: semdedup_pairs(emb, clusters, 0.95, 1, id_col="vec_id"),
    }
    a = sorted((r["a"], r["b"], round(r["cos"], 9)) for r in variants["old"]().collect())
    b = sorted((r["a"], r["b"], round(r["cos"], 9)) for r in variants["new"]().collect())
    assert a == b, f"results differ: {len(a)} vs {len(b)}"
    print("results identical:", len(a), "pairs")

    times = {k: [] for k in variants}
    for rep in range(3):
        for name, fn in variants.items():
            t0 = time.time()
            fn().count()
            times[name].append(round(time.time() - t0, 3))
    for name, ts in times.items():
        print(name, "min", min(ts), "all", ts)
    spark.stop()


if __name__ == "__main__":
    main()
