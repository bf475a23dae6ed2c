"""Bloom-filter exact dedup: memory-bounded cross-run membership.

The anti-join form of cross-run dedup (`dedup.exact_dedup_cross`)
shuffles the reference corpus' (hash, id) pairs — 16 B/doc, fine up to
~10^10 docs, but at 10^12 the reference side alone is a 16 TB shuffle
re-paid on EVERY incremental crawl. The Bloom-filter form (what Dolma's
deduper does: a fixed-size bit array over document hashes) replaces the
join with a constant-size artifact:

* build once over the kept corpus: one narrow pass + a single
  tree-reduce shuffle of PARTIAL filters (``partials_per_leaf`` rows of
  ``num_bits/8`` bytes — parallelism-bounded, not data-bounded);
* probe any number of later crawls map-only: the filter is a broadcast
  variable, membership is a vectorized numpy bit-test per Arrow batch —
  zero shuffle, zero reference re-scan.

No false negatives (every inserted doc always hits), tunable false
positives (drop rate overshoot): m bits / k hashes over n docs give
fpp ≈ (1 - e^(-kn/m))^k — `expected_fpp` computes it, `build_bloom`
reports the observed fill. 10^12 docs at 1% fpp is a 1.2 TiB filter —
beyond a single broadcast, so real deployments shard the filter by
hash prefix (band on xxhash64 high bits) and probe per shard; this
module keeps the single-shard core, which is exactly Dolma's layout.

Only (h1, h2) = (xxhash64(text), xxhash64(text, 1)) ever leave the JVM:
text is hashed by codegen, Python sees two longs per doc. Bit positions
come from standard double hashing (Kirsch-Mitzenmacher: pos_i =
h1 + i*h2 mod m), shared by one helper so build and probe cannot skew.

Semantic ancestor: the reference's uniqueness dimension
(/root/reference/DataQuality_AI_CaseStudy.md:144-147) counts exact
duplicates; this is the incremental-crawl form of the same identity.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def expected_fpp(n_items: int, num_bits: int, num_hashes: int) -> float:
    """Theoretical false-positive probability of an (m, k) filter
    holding n items."""
    if n_items == 0:
        return 0.0
    return (1.0 - math.exp(-num_hashes * n_items / num_bits)) ** num_hashes


def optimal_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(num_bits, num_hashes) minimizing size for a target fpp;
    num_bits is rounded up to a whole byte."""
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _positions(h1: np.ndarray, h2: np.ndarray, num_hashes: int,
               num_bits: int) -> np.ndarray:
    """(len(h), k) bit positions via double hashing. Forcing h2 odd
    makes the stride a unit mod any power-of-two m (and harmless
    otherwise), so the k probes never collapse onto one position."""
    u1 = h1.astype(np.uint64)
    u2 = h2.astype(np.uint64) | np.uint64(1)
    i = np.arange(num_hashes, dtype=np.uint64)
    return ((u1[:, None] + i[None, :] * u2[:, None])
            % np.uint64(num_bits))


def _hash_cols(df: DataFrame, text_col: str) -> DataFrame:
    """The only columns that cross to Python: two independent xxhash64
    longs (seed-42 chain; NULL text hashes as the distinct NULL slot
    like SQL PARTITION BY — coalesce happens inside xxhash64 args)."""
    t = F.coalesce(F.col(text_col), F.lit("\x00<NULL>"))
    return df.select(F.xxhash64(t).alias("h1"),
                     F.xxhash64(t, F.lit(1)).alias("h2"))


def build_bloom(df: DataFrame, text_col: str = "text",
                num_bits: int = 1 << 23, num_hashes: int = 7,
                partials_per_leaf: int = 64) -> bytes:
    """One ``num_bits``-wide filter over ``df[text_col]``.

    Plan: codegen hash projection → per-task numpy partial filter
    (mapInPandas, one row out per task) → one shuffle of partials into
    ``partials_per_leaf`` groups OR-ed by applyInPandas → driver ORs
    the ≤``partials_per_leaf`` leaves. Driver traffic is bounded by
    ``partials_per_leaf * num_bits/8`` bytes regardless of data size.
    """
    if num_bits % 8:
        raise ValueError(f"num_bits must be a multiple of 8: {num_bits}")
    nbytes = num_bits // 8

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for b in batches:
            if not len(b):
                continue
            seen = True
            pos = _positions(b["h1"].to_numpy(), b["h2"].to_numpy(),
                             num_hashes, num_bits).ravel()
            np.bitwise_or.at(bits, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"f": [bits.tobytes()]})

    partials = _hash_cols(df, text_col).mapInPandas(
        partial, schema=T.StructType([T.StructField("f", T.BinaryType())]))

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for buf in pdf["f"]:
            acc |= np.frombuffer(buf, dtype=np.uint8)
        return pd.DataFrame({"f": [acc.tobytes()]})

    leaves = (partials
              .withColumn("g", F.spark_partition_id() % partials_per_leaf)
              .groupBy("g")
              .applyInPandas(lambda _, pdf: merge(pdf),
                             schema="f binary")
              .collect())

    out = np.zeros(nbytes, dtype=np.uint8)
    for row in leaves:
        out |= np.frombuffer(row["f"], dtype=np.uint8)
    return out.tobytes()


def bloom_stats(filt: bytes, num_hashes: int) -> dict:
    """Observed fill fraction and the implied false-positive rate."""
    bits = np.frombuffer(filt, dtype=np.uint8)
    fill = float(np.unpackbits(bits).mean())
    return {"num_bits": len(filt) * 8, "num_hashes": num_hashes,
            "fill_fraction": fill, "implied_fpp": fill ** num_hashes}


def bloom_contains(df: DataFrame, filt: bytes, text_col: str = "text",
                   num_hashes: int = 7,
                   flag_col: str = "in_bloom") -> DataFrame:
    """`df` + boolean ``flag_col``: True iff text (possibly falsely)
    hits the filter. Map-only — the filter ships once per executor as
    a broadcast variable, never per task."""
    num_bits = len(filt) * 8
    bc = df.sparkSession.sparkContext.broadcast(filt)

    t = F.coalesce(F.col(text_col), F.lit("\x00<NULL>"))

    @F.pandas_udf(T.BooleanType())
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        if not len(h1):
            return pd.Series([], dtype=bool)
        pos = _positions(h1.to_numpy(), h2.to_numpy(),
                         num_hashes, num_bits)
        hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    return df.withColumn(
        flag_col, probe(F.xxhash64(t), F.xxhash64(t, F.lit(1))))


def bloom_dedup_cross(new_df: DataFrame, filt: bytes,
                      text_col: str = "text",
                      num_hashes: int = 7) -> DataFrame:
    """Rows of `new_df` whose text does NOT hit the reference filter.
    Guaranteed to drop every exact duplicate of the corpus the filter
    was built over; may additionally drop ~fpp of genuinely-new docs
    (size the filter with `optimal_params` for the tolerated loss)."""
    return (bloom_contains(new_df, filt, text_col, num_hashes)
            .where(~F.col("in_bloom")).drop("in_bloom"))
