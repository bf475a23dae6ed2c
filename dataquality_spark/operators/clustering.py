"""Embedding clustering: distributed k-means + SemDedup semantic dedup.

`similarity.train_centroids` fits Lloyd's on a bounded driver-side
sample — the right cost/quality trade for an IVF coarse quantizer. This
module adds the full-corpus path a curation pipeline needs when cluster
QUALITY is the product (SemDedup, Abbas et al. 2023: cluster the
embedding space, then drop near-identical documents within each
cluster; also domain discovery for data mixing):

* `kmeans_fit` — distributed Lloyd's over every vector. Per iteration:
  centroids broadcast (k×d floats), each task folds its Arrow batches
  into ONE partial (k×d sums + k counts) emitted as a single row, the
  driver reduces ≤`tasks` partials. Traffic per iteration is
  parallelism-bounded (tasks × k×d×8 bytes), never data-bounded — the
  same budget argument as `bloom.build_bloom`'s tree-OR.
* `assign_clusters` — map-only nearest-centroid labels (ties → lowest
  cluster index, matching SQL argmin semantics).
* `semdedup_pairs` — within-cluster cosine ≥ threshold pairs: the
  cluster id is the ONLY join key, so candidate generation is an
  in-cluster self-join bounded by cluster size (hot clusters capped
  with the same slim-aggregate guard as the LSH buckets). Feed the
  output to `graph.resolve_duplicates` for the keep/drop decision —
  cosine similarity is not transitive either.

Semantic ancestor: the reference's uniqueness dimension
(/root/reference/DataQuality_AI_CaseStudy.md:144-147) — this is its
embedding-space form at training-data scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..caching import track_persist as _track_persist
from .dedup import _drop_hot_buckets, cosine_cols


def deterministic_init(df: DataFrame, emb_col: str, k: int) -> np.ndarray:
    """k seed centroids chosen by the smallest xxhash64 of the vector's
    string form — order-stable under any partitioning, no RNG, no
    dependence on row order. Driver receives exactly k vectors."""
    rows = (df.select(F.col(emb_col).alias("e"))
            .withColumn("_h", F.xxhash64(F.col("e").cast("string")))
            .orderBy("_h").limit(k).collect())
    if len(rows) < k:
        raise ValueError(f"need >= {k} vectors to seed {k} clusters, "
                         f"got {len(rows)}")
    return np.array([list(r["e"]) for r in rows], dtype=np.float64)


def kmeans_fit(df: DataFrame, emb_col: str, k: int,
               init: np.ndarray | None = None, max_iter: int = 10,
               tol: float = 1e-6,
               sample_fraction: float | None = None,
               sample_salt: int = 0,
               sample_key: str | None = None,
               sample_method: str = "xxhash64") -> tuple[np.ndarray, dict]:
    """Lloyd's over the corpus — or a deterministic hash sample of it.

    Returns (centroids [k×d], info with `iterations` and final max
    centroid `shift`).

    `sample_fraction`: when set (0 < f ≤ 1), every iteration scans only
    the rows whose `hash_bucket(key) < f·1e6` — the same keyed-hash
    idiom as curation.split_assign, so the sample is a pure filter (no
    shuffle, no RNG state), stable across runs, task retries,
    partitionings, and cluster sizes. `sample_key` names the hashed
    column (default: the vector's string form, so byte-identical
    vectors sample together); `sample_method` is curation.hash_bucket's
    'xxhash64' (production) or 'lcg' (ANSI-SQL-reproducible, used by
    the oracle-checked contract query; needs a non-negative int key).

    This is THE 100-TB fit recipe: Lloyd's centroid estimates converge
    on an i.i.d. sample (per-cluster means are sample means —
    O(1/√(f·n/k)) standard error, and f·n/k is still millions of points
    per cluster at f=1e-4 on a 10^12-doc corpus), so fit cost drops
    from max_iter full-corpus passes to max_iter × f·|corpus| while
    `assign_clusters` stays full-corpus and map-only. The filter sits
    directly on the columnar scan; each iteration reads only sampled
    vectors.

    Empty clusters keep their previous centroid (deterministic; they
    can re-acquire points as others move). Numerically: per-task sums
    are exact per batch order; cross-task reduction order is fixed by
    sorting partials on task id, so repeated runs on the same
    partitioning are bit-identical, and any partitioning agrees to
    float tolerance (pinned by tests)."""
    from .curation import hash_bucket

    sc = df.sparkSession.sparkContext
    slim = df
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(f"sample_fraction must be in (0, 1]: "
                             f"{sample_fraction}")
        buckets = 1_000_000
        thr = int(round(sample_fraction * buckets))
        key = (F.col(sample_key) if sample_key
               else F.col(emb_col).cast("string"))
        slim = slim.where(
            hash_bucket(key, buckets, sample_salt, sample_method)
            < F.lit(thr))
    slim = slim.select(F.col(emb_col).alias("e"))
    cents = (deterministic_init(slim, "e", k) if init is None
             else np.asarray(init, dtype=np.float64).copy())
    k, d = cents.shape

    schema = T.StructType([
        T.StructField("task", T.IntegerType()),
        T.StructField("sums", T.BinaryType()),
        T.StructField("counts", T.BinaryType())])

    info = {"iterations": 0, "shift": float("inf")}
    for it in range(max_iter):
        bc = sc.broadcast(cents)

        def partial(batches: Iterator[pd.DataFrame],
                    _k: int = k, _d: int = d) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext
            c = bc.value
            c_sq = (c ** 2).sum(axis=1)
            sums = np.zeros((_k, _d), dtype=np.float64)
            counts = np.zeros(_k, dtype=np.int64)
            seen = False
            for b in batches:
                if not len(b):
                    continue
                seen = True
                mat = np.vstack([np.asarray(v, dtype=np.float64)
                                 for v in b["e"]])
                # argmin ||x-c||² = argmin -2x·c + ||c||²; numpy argmin
                # takes the FIRST minimum → lowest cluster index on ties
                lab = (-2.0 * (mat @ c.T) + c_sq[None, :]).argmin(axis=1)
                np.add.at(sums, lab, mat)
                np.add.at(counts, lab, 1)
            if seen:
                tid = TaskContext.get().partitionId()
                yield pd.DataFrame({"task": [tid],
                                    "sums": [sums.tobytes()],
                                    "counts": [counts.tobytes()]})

        parts = sorted(slim.mapInPandas(partial, schema=schema).collect(),
                       key=lambda r: r["task"])
        # release this iteration's k×d broadcast blocks before the next
        # one is created — max_iter stale broadcasts otherwise pile up
        # on executors/driver for large k×d
        bc.unpersist(blocking=False)
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums += np.frombuffer(r["sums"], dtype=np.float64) \
                      .reshape(k, d)
            counts += np.frombuffer(r["counts"], dtype=np.int64)
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        shift = float(np.sqrt(((new - cents) ** 2).sum(axis=1)).max())
        cents = new
        info = {"iterations": it + 1, "shift": shift}
        if shift <= tol:
            break
    return cents, info


def assign_clusters(df: DataFrame, emb_col: str, centroids: np.ndarray,
                    cluster_col: str = "cluster",
                    dist_col: str | None = None) -> DataFrame:
    """Map-only nearest-centroid assignment; optional exact squared L2
    distance column. Ties break to the lowest cluster index."""
    c = np.asarray(centroids, dtype=np.float64)
    c_sq = (c ** 2).sum(axis=1)

    fields = [T.StructField("cl", T.IntegerType())]
    if dist_col is not None:
        fields.append(T.StructField("dist", T.DoubleType()))

    @F.pandas_udf(T.StructType(fields))
    def lab(emb: pd.Series) -> pd.DataFrame:
        if not len(emb):
            return pd.DataFrame({f.name: [] for f in fields})
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in emb])
        scores = -2.0 * (mat @ c.T) + c_sq[None, :]
        a = scores.argmin(axis=1)
        out = {"cl": a.astype(np.int32)}
        if dist_col is not None:
            # exact ||x-c||², not the argmin surrogate
            diff = mat - c[a]
            out["dist"] = (diff ** 2).sum(axis=1)
        return pd.DataFrame(out)

    tmp = df.withColumn("_a", lab(F.col(emb_col)))
    tmp = tmp.withColumn(cluster_col, F.col("_a.cl"))
    if dist_col is not None:
        tmp = tmp.withColumn(dist_col, F.col("_a.dist"))
    return tmp.drop("_a")


def semdedup_pairs(df: DataFrame, emb_col: str, id_col: str,
                   centroids: np.ndarray,
                   cosine_threshold: float = 0.99,
                   max_cluster: int | None = 100_000) -> DataFrame:
    """(id_a < id_b, cosine) for same-cluster pairs with cosine ≥
    threshold — SemDedup's candidate relation. The self-join key is the
    cluster id alone; embeddings travel to the join but text never
    does, and clusters above `max_cluster` are dropped with the slim
    hot-bucket guard (a cluster that large means the quantizer needs
    more cells, not a quadratic join)."""
    base = assign_clusters(
        df.select(F.col(id_col).alias("id"),
                  F.col(emb_col).cast("array<double>").alias("e")),
        "e", centroids)
    base = _track_persist(base)
    capped = _drop_hot_buckets(base, "cluster", max_cluster)
    a, b = capped.alias("a"), capped.alias("b")
    return (a.join(b, (F.col("a.cluster") == F.col("b.cluster"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    cosine_cols(F.col("a.e"), F.col("b.e"))
                    .alias("cosine"))
            .where(F.col("cosine") >= cosine_threshold))
