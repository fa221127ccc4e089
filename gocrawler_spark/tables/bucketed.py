"""Bucketed-table co-located joins — the shuffle-free seen anti-join.

The SnapshotCatalog's hive-style ``bucket=N`` layout prunes reads and
bounds MERGE I/O, but Spark's *bucketed tables* (``bucketBy`` +
``saveAsTable``) carry the hash-partitioning guarantee into the query
plan: two tables bucketed on the same key with the same bucket count
join WITHOUT an Exchange on either side — at 10^10 URLs that removes
the largest per-round shuffle (the seen anti-join) entirely, the
parquet stand-in for Iceberg's storage-partitioned join.

``write_bucketed`` / ``colocated_anti_join`` are the minimal API; the
test asserts the executed plan contains no hashpartitioning Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str = "url_hash",
    n_buckets: int = 8,
    path: str | None = None,
):
    """Persist as a Spark bucketed table (sorted within buckets, so the
    join side is also sort-free)."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)


def colocated_anti_join(
    spark: SparkSession, cand_table: str, seen_table: str, key: str = "url_hash"
) -> DataFrame:
    """candidates ⟕̸ seen on the bucket key: with equal bucket specs the
    planner schedules bucket-to-bucket tasks, no shuffle."""
    return spark.table(cand_table).join(spark.table(seen_table), key, "left_anti")
