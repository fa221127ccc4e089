"""Deterministic exact-quota stratified sampling for training-data mixing.

A 100 TB curation run ends with a *mix* step: take exactly N_lang docs
per language (or per (lang, quality-bucket) cell) so the training
distribution is controlled, reproducible, and independent of input
order or partitioning. `df.sampleBy` gives only approximate fractions
and varies with partition layout; this operator gives exact per-stratum
quotas with a content-derived deterministic order, so the same inputs
always select the same rows on any cluster size.

Scale notes:
 - Selection is rank-over-window with a `row_number() <= quota`
   predicate, the same shape as the crawl's select_fetch_set — Spark
   3.5+ plans it as WindowGroupLimit, a map-side partial top-k that
   prunes each partition to `quota` rows BEFORE the stratum shuffle, so
   a billion-doc stratum with a 10k quota moves ~10k rows per input
   partition, not the stratum.
 - The order key is md5(id || seed): content-derived, so re-runs and
   re-partitions pick identical rows, and changing `seed` draws an
   independent sample. No rand(), which is partition-order dependent.
 - Quotas arrive as a small DataFrame and broadcast-join onto the data;
   strata missing from the quota table are dropped (quota 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["sample_stratified_exact"]


def sample_stratified_exact(
    docs: DataFrame,
    quotas: DataFrame,
    strata_cols: list[str],
    id_col: str = "doc_id",
    seed: str = "0",
    quota_col: str = "quota",
) -> DataFrame:
    """Select exactly `quota` rows per stratum (fewer iff the stratum is
    smaller than its quota), deterministically.

    `quotas` has the strata columns plus `quota_col` (int). The order
    within a stratum is md5(concat(id, ':', seed)) ascending with the id
    itself as tiebreaker, so duplicate-id inputs still rank totally.
    Returns the original columns (quota/rank dropped).
    """
    qt = quotas.select(
        *strata_cols, F.col(quota_col).cast("long").alias("_quota")
    )
    # Spark's InferWindowGroupLimit rule needs a LITERAL rank bound to
    # plan the map-side partial top-k; `rn <= _quota` (a column) alone
    # would shuffle whole strata. Probe the max quota (tiny table, one
    # driver scalar) and filter on the literal AND the per-stratum
    # column: the literal conjunct prunes every input partition to
    # max_quota rows before the shuffle, the column conjunct exacts it.
    max_q = qt.agg(F.max("_quota")).collect()[0][0]
    if max_q is None or max_q <= 0:
        return docs.limit(0)
    keyed = docs.join(F.broadcast(qt), strata_cols, "inner").withColumn(
        "_ord",
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))),
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in strata_cols])
        .orderBy(F.col("_ord"), F.col(id_col))
    )
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") <= F.lit(max_q)) & (F.col("_rn") <= F.col("_quota")))
        .drop("_ord", "_rn", "_quota")
    )
