"""URL-seen bloom filter — per-partition vectorized build, treeAggregate merge.

North-rule operator F4/A6 (SURVEY §2.2/§2.5): the reference's URL-seen
set is colly's in-memory visited map [colly v1.2.0]; at 10^10-URL scale
it becomes (a) a sharded bloom filter used as a *definite-negative*
pre-filter and (b) the exact ``seen`` table anti-join as source of
truth. Bloom false positives therefore cost nothing (the exact anti-join
still runs on the survivors); false negatives are impossible.

Build path: JVM computes two xxhash64 values per url (whole-stage
codegen); ``mapInArrow`` turns each partition's hash columns into one
packed uint64 bitmap chunk (numpy, no per-row Python); the per-partition
bitmaps are OR-merged with ``RDD.treeAggregate`` (depth 2) so the driver
never receives more than ~sqrt(P) intermediate bitmaps at once.

Sharding: ``n_shards`` splits the bit space by ``h1 % n_shards``; at
10^10 scale shards align with the url_hash bucket partitioning so each
executor loads only its shards (SURVEY §7 "hard parts"). Locally one
filter is plenty (10^6-10^7 keys).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEED2 = 0x9E3779B9


class Bloom:
    """Fixed-size bloom filter over uint64 words (numpy).

    ``n_shards > 1`` splits the bit space into contiguous per-shard
    ranges addressed by ``h1 % n_shards`` — shard bitmaps can then be
    built independently (one task each) and merged by *concatenation*,
    so a distributed build moves exactly ``n_bits`` over the wire
    instead of ``partitions × n_bits``. At 10^10-URL scale the shards
    align with the url_hash bucket partitioning and executors load only
    the shards for their buckets."""

    def __init__(self, n_bits: int, n_hashes: int, bits: np.ndarray | None = None,
                 n_shards: int = 1):
        assert n_bits % 64 == 0
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.n_shards = n_shards
        assert (n_bits // n_shards) % 64 == 0, "shard bit-ranges must be word-aligned"
        self.shard_bits = n_bits // n_shards
        self.bits = bits if bits is not None else np.zeros(n_bits // 64, dtype=np.uint64)

    @classmethod
    def sized_for(cls, n_items: int, fpp: float = 0.01) -> "Bloom":
        n_items = max(n_items, 1024)
        m = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
        m = ((m + 63) // 64) * 64
        k = max(1, round(m / n_items * math.log(2)))
        return cls(m, min(k, 8))

    def _index(self, h1: np.ndarray, h2: np.ndarray, i: int) -> np.ndarray:
        if self.n_shards == 1:
            return (h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)
        shard = h1 % np.uint64(self.n_shards)
        within = (h1 // np.uint64(self.n_shards) + np.uint64(i) * h2) % np.uint64(self.shard_bits)
        return shard * np.uint64(self.shard_bits) + within

    def add_hashes(self, h1: np.ndarray, h2: np.ndarray):
        for i in range(self.n_hashes):
            idx = self._index(h1, h2, i)
            np.bitwise_or.at(
                self.bits, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.n_hashes):
            idx = self._index(h1, h2, i)
            word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
        return out

    def union(self, other: "Bloom") -> "Bloom":
        return Bloom(self.n_bits, self.n_hashes,
                     np.bitwise_or(self.bits, other.bits), self.n_shards)

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, n_bits: int, n_hashes: int, n_shards: int = 1) -> "Bloom":
        return cls(n_bits, n_hashes, np.frombuffer(b, dtype=np.uint64).copy(), n_shards)


def _hash_cols(df: DataFrame, url_col: str) -> DataFrame:
    return df.select(
        F.xxhash64(F.col(url_col)).alias("h1"),
        F.xxhash64(F.col(url_col), F.lit(_SEED2)).alias("h2"),
    )


def build_bloom(df: DataFrame, url_col: str, n_bits: int, n_hashes: int) -> Bloom:
    """Per-partition vectorized build + treeAggregate OR-merge."""
    hashed = _hash_cols(df, url_col)

    def per_partition(batches):
        bloom = Bloom(n_bits, n_hashes)
        saw = False
        for batch in batches:
            h1 = batch.column("h1").to_numpy(zero_copy_only=False).view(np.uint64)
            h2 = batch.column("h2").to_numpy(zero_copy_only=False).view(np.uint64)
            bloom.add_hashes(h1, h2)
            saw = True
        if saw:
            yield pa.RecordBatch.from_pydict({"bloom": [bloom.to_bytes()]})

    parts = hashed.mapInArrow(per_partition, "bloom binary")
    zero = Bloom(n_bits, n_hashes)

    def seq(acc: Bloom, row) -> Bloom:
        return acc.union(Bloom.from_bytes(bytes(row.bloom), n_bits, n_hashes))

    return parts.rdd.treeAggregate(zero, seq, Bloom.union, depth=2)


def build_bloom_sharded(
    df: DataFrame, url_col: str, n_bits: int, n_hashes: int, n_shards: int = 64
) -> Bloom:
    """Scale-path build: each shard's bit-range is built by exactly one
    group task (groupBy ``h1 % n_shards`` + applyInPandas), and the
    driver assembles the filter by concatenation — total network
    transfer is ``n_bits`` regardless of parallelism, where the
    per-partition treeAggregate merge moves ``partitions × n_bits``.
    Per-shard bitmaps are what a 10^10-URL deployment stores alongside
    the url_hash buckets (executors load only their shards)."""
    # power-of-two shards: JVM pmod (signed) and numpy % (uint64 view)
    # then both reduce to the same low bits of h1
    assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of two"
    step = 64 * n_shards
    n_bits = ((n_bits + step - 1) // step) * step
    shard_bits = n_bits // n_shards
    hashed = _hash_cols(df, url_col).withColumn(
        "shard", F.pmod(F.col("h1"), F.lit(n_shards))
    )

    def build_shard(key, pdf):
        import pandas as pd

        s = int(key[0])
        local = Bloom(shard_bits, n_hashes)
        h1 = pdf["h1"].to_numpy().view(np.uint64)
        h2 = pdf["h2"].to_numpy().view(np.uint64)
        # same index math as Bloom._index, offset into the local shard
        for i in range(n_hashes):
            idx = (h1 // np.uint64(n_shards) + np.uint64(i) * h2) % np.uint64(shard_bits)
            np.bitwise_or.at(
                local.bits, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
        return pd.DataFrame({"shard": [s], "bits": [local.to_bytes()]})

    rows = (
        hashed.groupBy("shard")
        .applyInPandas(build_shard, "shard int, bits binary")
        .collect()
    )
    bloom = Bloom(n_bits, n_hashes, n_shards=n_shards)
    words_per_shard = shard_bits // 64
    for r in rows:
        s = r["shard"]
        bloom.bits[s * words_per_shard : (s + 1) * words_per_shard] = np.frombuffer(
            bytes(r["bits"]), dtype=np.uint64
        )
    return bloom


def bloom_prefilter(df: DataFrame, url_col: str, bloom: Bloom) -> DataFrame:
    """Keep rows NOT definitely-unseen filtered out — i.e. return rows the
    bloom says are *possibly seen* removed. Output = rows with
    ``bloom.contains == False`` definitely new, plus nothing lost: rows
    flagged possibly-seen still go through the exact anti-join by the
    caller. This function returns df annotated with ``maybe_seen``."""
    spark = df.sparkSession
    blob_bc = spark.sparkContext.broadcast(
        (bloom.to_bytes(), bloom.n_bits, bloom.n_hashes, bloom.n_shards)
    )

    from pyspark.sql.pandas.functions import pandas_udf

    _state: dict = {}  # per-task bloom singleton: from_bytes copies the
    # bitmap, so doing it once per Arrow batch would memcpy GBs

    @pandas_udf("boolean")
    def maybe_seen(h1, h2):
        import pandas as pd

        bl = _state.get("bloom")
        if bl is None:
            b, nb, nh, ns = blob_bc.value
            bl = _state["bloom"] = Bloom.from_bytes(b, nb, nh, ns)
        res = bl.contains_hashes(
            h1.to_numpy().view(np.uint64), h2.to_numpy().view(np.uint64)
        )
        return pd.Series(res)

    return (
        df.withColumn("_h1", F.xxhash64(F.col(url_col)))
        .withColumn("_h2", F.xxhash64(F.col(url_col), F.lit(_SEED2)))
        .withColumn("maybe_seen", maybe_seen("_h1", "_h2"))
        .drop("_h1", "_h2")
    )
