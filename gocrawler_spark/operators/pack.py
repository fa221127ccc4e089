"""Token-budget sequence packing: assign docs to fixed-token training
shards by global token offset.

GPT-style pretraining consumes a corpus as one concatenated token
stream split into fixed-size sequences; the pipeline step that matters
at 100 TB is computing, for every doc, WHERE in that stream it starts —
then shard_id = offset div budget, and a writer groups by shard_id.
That is a global exclusive prefix sum over token counts in a
deterministic order, which a naive `Window.orderBy(...)` computes on ONE
partition (the classic scale bug). Here it is the same two-level
prefix-sum used for the crawl's deterministic fetch seq
(plans/crawl.py:190-254): cumsum within hash-prefix groups (distributed
window), then one tiny window over the 16^prefix_len group totals, then
a broadcast join of group offsets back.

The order is md5(id:seed) — content-derived, so packing is reproducible
across runs/partitionings and re-mixable by seed, and an external engine
(the DuckDB twin in tests) reproduces it bit-for-bit. Docs that straddle
a shard boundary are flagged (`crosses_boundary`); with concatenation
semantics that is normal — the doc's tail trains in the next sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import token_count

__all__ = ["pack_token_budget"]


def pack_token_budget(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
    seed: str = "0",
    prefix_len: int = 2,
) -> DataFrame:
    """Add (n_tokens, start_offset, shard_id, crosses_boundary) to docs.

    `token_col` supplies precomputed token counts (e.g. from a real BPE
    pass); default is whitespace token_count over `text_col`. Zero-token
    docs get the offset where they fall and never cross. `prefix_len`
    hex chars define the level-1 groups (16^2 = 256 groups by default:
    the level-2 window sorts 256 rows on one partition while level 1
    stays fully distributed; raise it for >10^4-partition inputs).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    n_tok = (
        F.col(token_col) if token_col else token_count(F.col(text_col))
    ).cast("long")
    d = docs.withColumn("n_tokens", n_tok).withColumn(
        "_ord", F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed)))
    )
    grp = F.substring(F.col("_ord"), 1, prefix_len)
    d = d.withColumn("_grp", grp)
    w1 = (
        Window.partitionBy("_grp")
        .orderBy(F.col("_ord"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_local_incl", F.sum("n_tokens").over(w1))
    totals = d.groupBy("_grp").agg(F.sum("n_tokens").alias("_grp_tot"))
    w2 = (
        Window.orderBy("_grp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "_grp_off", F.sum("_grp_tot").over(w2) - F.col("_grp_tot")
    ).select("_grp", "_grp_off")
    packed = (
        d.join(F.broadcast(offsets), "_grp")
        .withColumn(
            "start_offset",
            F.col("_grp_off") + F.col("_local_incl") - F.col("n_tokens"),
        )
        .withColumn("shard_id", F.floor(F.col("start_offset") / budget))
        .withColumn(
            "crosses_boundary",
            (F.col("n_tokens") > 0)
            & (
                F.pmod(F.col("start_offset"), F.lit(budget)) + F.col("n_tokens")
                > budget
            ),
        )
    )
    return packed.drop("_ord", "_grp", "_local_incl", "_grp_off")
