"""URL-seen dedup: exact anti-join (O4) + partitioned Bloom shards (O5).

The reference's seen-set is exact — Scrapy's ``RFPDupeFilter`` SHA1
fingerprint set plus the application-level ``connector.job_exist(url)``
check (public behavior; SURVEY §2.1 O4). Exactness is therefore the
correctness authority here too: the Bloom structure mandated for the
10^10-URL design point (BASELINE.json north_star) only *accelerates*
the anti-join, it never decides "seen" (SURVEY §4.3.2):

    bloom says "definitely new"  → bypass the exact probe entirely
    bloom says "maybe seen"      → exact anti-join against `seen`

A false positive costs one extra probe row; it can never drop a URL
the reference would crawl. Net effect at scale: the anti-join's probe
side shrinks to (true dups + FP rate · new), instead of the whole wave.

Sharding: ``shard_id = pmod(xxhash64(url_canon), n_shards)``; each
shard row carries a packed bit array (``bits: binary``). Probing joins
candidates to their shard row on shard_id and tests k positions per
URL **vectorized in numpy** inside ``applyInPandas`` — the double-hash
scheme position_i = (h1 + i·h2) mod m with h1/h2 computed JVM-side by
``xxhash64`` (two different column seeds), so Python never hashes
strings. Spark's built-in ``DataFrameStatFunctions.bloomFilter`` is a
driver-side singleton — unusable at 10^10 entries — hence shards as
rows (SURVEY §4.3.2).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOOM_SCHEMA = "shard_id int, version long, bits binary, n_items long"


def anti_join_seen(candidates: DataFrame, seen: DataFrame, key: str = "url_canon") -> DataFrame:
    """Exact O4: candidates not present in seen (left_anti).

    No dedup on the build side — anti-join semantics are unaffected by
    duplicate build rows, so we skip the extra aggregation shuffle.
    """
    return candidates.join(seen.select(key), key, "left_anti")


def _with_hashes(df: DataFrame, key: str) -> DataFrame:
    # two independent 64-bit hashes, both computed JVM-side
    return df.withColumn("_h1", F.xxhash64(F.col(key))).withColumn(
        "_h2", F.xxhash64(F.col(key), F.lit(0x9E3779B9))
    )


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit positions via double hashing; unsigned arithmetic."""
    h1 = h1.astype(np.uint64)
    h2 = h2.astype(np.uint64) | np.uint64(1)  # force odd so strides cycle
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)


class BloomShards:
    """Partitioned Bloom filter stored as one row per shard."""

    def __init__(self, n_shards: int = 32, bits_per_shard: int = 1 << 20, n_hashes: int = 5):
        self.n_shards = n_shards
        self.m = bits_per_shard
        self.k = n_hashes

    # ------------------------------------------------------------- build
    def build_delta(self, new_seen: DataFrame, version: int, key: str = "url_canon") -> DataFrame:
        """Bit arrays for a batch of newly-seen keys, one row per shard."""
        m, k, n_shards = self.m, self.k, self.n_shards

        def make(pdf: pd.DataFrame) -> pd.DataFrame:
            packed = np.zeros(m // 8, dtype=np.uint8)
            pos = _positions(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), k, m).ravel()
            np.bitwise_or.at(packed, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            return pd.DataFrame(
                {
                    "shard_id": [int(pdf["shard_id"].iloc[0])],
                    "version": [version],
                    "bits": [packed.tobytes()],
                    "n_items": [len(pdf)],
                }
            )

        keyed = _with_hashes(new_seen.select(key), key).withColumn(
            "shard_id", F.pmod(F.xxhash64(F.col(key), F.lit(7)), F.lit(n_shards)).cast("int")
        )
        return keyed.groupBy("shard_id").applyInPandas(make, BLOOM_SCHEMA)

    def merge(self, old: DataFrame | None, delta: DataFrame, version: int) -> DataFrame:
        """OR old and delta shard bits → new shard table at `version`."""
        both = delta if old is None else old.unionByName(delta)

        def orify(pdf: pd.DataFrame) -> pd.DataFrame:
            acc = np.zeros(self.m // 8, dtype=np.uint8)
            for b in pdf["bits"]:
                acc |= np.frombuffer(b, dtype=np.uint8)
            return pd.DataFrame(
                {
                    "shard_id": [int(pdf["shard_id"].iloc[0])],
                    "version": [version],
                    "bits": [acc.tobytes()],
                    "n_items": [int(pdf["n_items"].sum())],
                }
            )

        return both.groupBy("shard_id").applyInPandas(orify, BLOOM_SCHEMA)

    # ------------------------------------------------------------- probe
    def split_new_vs_maybe(self, candidates: DataFrame, shards: DataFrame, key: str = "url_canon") -> DataFrame:
        """Adds ``maybe_seen`` bool: False ⇒ definitely new (bloom proof).

        Implemented as a shard-key equi-join (shards are tiny rows, the
        join broadcasts) + numpy probe per Arrow batch.
        """
        m, k = self.m, self.k
        keyed = _with_hashes(candidates, key).withColumn(
            "shard_id", F.pmod(F.xxhash64(F.col(key), F.lit(7)), F.lit(self.n_shards)).cast("int")
        )
        joined = keyed.join(F.broadcast(shards.select("shard_id", "bits")), "shard_id", "left")

        out_fields = candidates.schema.fieldNames() + ["maybe_seen"]
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
        ) + ", maybe_seen boolean"

        def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                if pdf.empty:
                    continue
                res = pdf.copy()
                res["maybe_seen"] = True
                has_bits = pdf["bits"].notna()
                if has_bits.any():
                    for bits, idx in pdf[has_bits].groupby("bits", sort=False).groups.items():
                        arr = np.frombuffer(bits, dtype=np.uint8)
                        sub = pdf.loc[idx]
                        pos = _positions(sub["_h1"].to_numpy(), sub["_h2"].to_numpy(), k, m)
                        hit = (arr[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
                        res.loc[idx, "maybe_seen"] = hit.all(axis=1)
                # no shard row at all ⇒ nothing ever inserted ⇒ definitely new
                res.loc[~has_bits, "maybe_seen"] = False
                yield res[out_fields]

        return joined.mapInPandas(probe, schema)

    def filter_unseen(self, candidates: DataFrame, shards: DataFrame | None, seen: DataFrame, key: str = "url_canon") -> DataFrame:
        """O5→O4 composition: bloom prefilter, exact guard, exact result."""
        if shards is None:
            return anti_join_seen(candidates, seen, key)
        flagged = self.split_new_vs_maybe(candidates, shards, key)
        definitely_new = flagged.where(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
        return definitely_new.unionByName(anti_join_seen(maybe, seen, key))


def empty_bloom(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], BLOOM_SCHEMA)
