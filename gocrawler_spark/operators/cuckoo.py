"""Cuckoo-filter URL-seen variant (the deletable alternative to bloom).

North-star F4/A6 names "bloom/cuckoo"; the cuckoo filter adds what the
bloom cannot do: **deletion** (frontier retractions — e.g. robots rules
changing mid-crawl, or per-host quota rollbacks). Same contract as the
bloom path: definite-negative prefilter, exact anti-join stays the
source of truth.

Distribution model: cuckoo tables do not union (eviction chains differ
per insertion order), so the distributed build is *sharded by
construction* — ``h1 % n_shards`` routes each key to exactly one shard,
one task builds each shard's table independently (groupBy +
applyInPandas), and the driver concatenates. That is the same layout the
sharded bloom uses, aligned with url_hash buckets at 10^10 scale.

Per-shard structure: standard (2,4)-cuckoo — two candidate buckets via
partial-key cuckoo hashing (bucket2 = bucket1 XOR hash(fingerprint)),
4 × 16-bit fingerprint slots per bucket, bounded eviction walk.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEED2 = 0x9E3779B9
_FP_SEED = np.uint64(0xC2B2AE3D27D4EB4F)
SLOTS = 4
MAX_KICKS = 500


class CuckooShard:
    """One shard's cuckoo table: uint16 fingerprints, 0 = empty."""

    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        assert n_buckets & (n_buckets - 1) == 0
        self.n_buckets = n_buckets
        self.table = (
            table if table is not None else np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        )

    # -- scalar helpers (build path is per-key anyway: eviction chains) ----
    def _fp(self, h: int) -> int:
        fp = (h * int(_FP_SEED)) % (1 << 64) >> 48
        return fp if fp != 0 else 1  # 0 marks empty

    def _b1(self, h: int) -> int:
        return (h >> 16) & (self.n_buckets - 1)

    def _b2(self, b1: int, fp: int) -> int:
        return (b1 ^ (fp * 0x5BD1E995)) & (self.n_buckets - 1)

    def insert(self, h: int) -> bool:
        fp = self._fp(h)
        b1 = self._b1(h)
        b2 = self._b2(b1, fp)
        for b in (b1, b2):
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # eviction walk
        rng = np.random.RandomState(h & 0x7FFFFFFF)  # deterministic per key
        b = b1 if (h & 1) else b2
        for _ in range(MAX_KICKS):
            slot = rng.randint(SLOTS)
            fp, self.table[b, slot] = int(self.table[b, slot]), fp
            b = self._b2(b, fp)
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False  # table too full

    def delete(self, h: int) -> bool:
        fp = self._fp(h)
        b1 = self._b1(h)
        for b in (b1, self._b2(b1, fp)):
            hits = np.where(self.table[b] == fp)[0]
            if len(hits):
                self.table[b, hits[0]] = 0
                return True
        return False

    def contains_many(self, hs: np.ndarray) -> np.ndarray:
        """Vectorized membership for a batch of uint64 hashes."""
        hs = hs.astype(np.uint64)
        fp = ((hs * _FP_SEED) >> np.uint64(48)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        mask = np.uint64(self.n_buckets - 1)
        b1 = ((hs >> np.uint64(16)) & mask).astype(np.int64)
        b2 = (b1 ^ (fp.astype(np.int64) * 0x5BD1E995)) & int(mask)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2


class ShardedCuckoo:
    def __init__(self, shards: list[CuckooShard], n_shards: int):
        self.shards = shards
        self.n_shards = n_shards

    def contains_hashes(self, h1: np.ndarray, _h2=None) -> np.ndarray:
        h1 = h1.astype(np.uint64)
        out = np.zeros(len(h1), dtype=bool)
        sh = (h1 % np.uint64(self.n_shards)).astype(np.int64)
        for s in range(self.n_shards):
            m = sh == s
            if m.any():
                out[m] = self.shards[s].contains_many(h1[m] // np.uint64(self.n_shards))
        return out

    def delete_hash(self, h1: int):
        s = h1 % self.n_shards
        return self.shards[s].delete((h1 % (1 << 64)) // self.n_shards)


def build_cuckoo_sharded(
    df: DataFrame, url_col: str, n_keys_hint: int, n_shards: int = 16
) -> ShardedCuckoo:
    """Distributed build: one task per shard (groupBy h1%S), driver
    concatenates. Sized for ~0.95 max load factor headroom."""
    assert n_shards & (n_shards - 1) == 0
    per_shard = max(1024, n_keys_hint // n_shards)
    n_buckets = 1 << int(np.ceil(np.log2(per_shard / (SLOTS * 0.84) + 1)))

    hashed = df.select(F.xxhash64(F.col(url_col)).alias("h1")).withColumn(
        "shard", F.pmod(F.col("h1"), F.lit(n_shards))
    )

    def build_shard(key, pdf):
        import pandas as pd

        s = int(key[0])
        shard = CuckooShard(n_buckets)
        hs = pdf["h1"].to_numpy().view(np.uint64) // np.uint64(n_shards)
        ok = all(shard.insert(int(h)) for h in hs)
        return pd.DataFrame({"shard": [s], "ok": [bool(ok)],
                             "table": [shard.table.tobytes()]})

    rows = (
        hashed.groupBy("shard")
        .applyInPandas(build_shard, "shard int, ok boolean, table binary")
        .collect()
    )
    shards = [CuckooShard(n_buckets) for _ in range(n_shards)]
    for r in rows:
        assert r["ok"], f"cuckoo shard {r['shard']} overflowed — raise n_keys_hint"
        shards[r["shard"]] = CuckooShard(
            n_buckets,
            np.frombuffer(bytes(r["table"]), dtype=np.uint16).reshape(n_buckets, SLOTS).copy(),
        )
    return ShardedCuckoo(shards, n_shards)


def cuckoo_prefilter(df: DataFrame, url_col: str, filt: ShardedCuckoo) -> DataFrame:
    """Annotate with maybe_seen (definite-negative semantics, like the
    bloom prefilter)."""
    spark = df.sparkSession
    payload = (
        [s.table.tobytes() for s in filt.shards],
        filt.shards[0].n_buckets,
        filt.n_shards,
    )
    bc = spark.sparkContext.broadcast(payload)

    from pyspark.sql.pandas.functions import pandas_udf

    _state: dict = {}

    @pandas_udf("boolean")
    def maybe_seen(h1):
        import pandas as pd

        f = _state.get("f")
        if f is None:
            tables, nb, ns = bc.value
            shards = [
                CuckooShard(nb, np.frombuffer(t, dtype=np.uint16).reshape(nb, SLOTS).copy())
                for t in tables
            ]
            f = _state["f"] = ShardedCuckoo(shards, ns)
        return pd.Series(f.contains_hashes(h1.to_numpy().view(np.uint64)))

    return df.withColumn("maybe_seen", maybe_seen(F.xxhash64(F.col(url_col))))
