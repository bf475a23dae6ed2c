"""Similarity search over an embedding column (array<float>).

* brute_force_topk — exact cosine top-k: per-row cosine as a sequential
  zip_with/aggregate fold (JVM codegen, deterministic order), then a
  global top-k. The scan is embarrassingly parallel; only k rows per
  partition reach the final ordering (Spark's TakeOrderedAndProject).
* ivf_topk — the scale path: k-means-style coarse quantizer (deterministic
  seeded numpy, trained on a driver-side sample once), every vector
  assigned to its nearest centroid JVM-broadcast; queries probe only
  `n_probe` inverted lists, so the scan touches n_probe/n_cells of the
  corpus. At 10^12 vectors the cell assignment is the partition key —
  cells are co-located and the query never shuffles the corpus.
* lsh_topk — random-hyperplane bucketed search (probe the query's bucket
  ± multi-table OR), recall traded for a bounded candidate set.

No Python on the per-row scoring path: cosine is a Catalyst fold;
centroid assignment is one Arrow-batched numpy argmax UDF at WRITE time
(amortized over all queries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

from .dedup import cosine_cols, make_hyperplane_udf


def _query_lit(query_vec) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(df: DataFrame, emb_col: str, id_col: str,
                     query_vec, k: int = 10,
                     round_decimals: int | None = 6) -> DataFrame:
    """Exact top-k by cosine to `query_vec` → (id, cosine) sorted."""
    q = _query_lit(query_vec)
    scored = df.select(F.col(id_col).alias("id"),
                       cosine_cols(F.col(emb_col), q).alias("cosine"))
    if round_decimals is not None:
        scored = scored.withColumn("cosine",
                                   F.round("cosine", round_decimals))
    return scored.orderBy(F.desc("cosine"), F.asc("id")).limit(k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse quantization
# ---------------------------------------------------------------------------

def train_centroids(sample: np.ndarray, n_cells: int, seed: int = 5,
                    iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (numpy)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    cents = sample[rng.choice(n, size=min(n_cells, n), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
    return cents


def make_cell_udf(centroids: np.ndarray):
    """pandas UDF: embedding → nearest-centroid cell id (numpy argmin)."""
    cents = centroids.astype(np.float64)

    @pandas_udf(IntegerType())
    def cell(emb: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in emb])
        # argmin over squared distance; ||x||² constant per row → argmin of
        # -2x·c + ||c||².
        scores = -2.0 * (mat @ cents.T) + (cents ** 2).sum(axis=1)[None, :]
        return pd.Series(scores.argmin(axis=1).astype(np.int32))

    return cell


def ivf_assign(df: DataFrame, emb_col: str, centroids: np.ndarray,
               repartition_by_cell: bool = False) -> DataFrame:
    """Add `cell` (coarse quantizer assignment). At scale, write the
    corpus partitioned by cell so probes prune at the scan."""
    out = df.withColumn("cell", make_cell_udf(centroids)(F.col(emb_col)))
    if repartition_by_cell:
        out = out.repartition("cell")
    return out


def ivf_topk(assigned: DataFrame, emb_col: str, id_col: str,
             centroids: np.ndarray, query_vec, k: int = 10,
             n_probe: int = 2) -> DataFrame:
    """Probe the n_probe nearest cells only, then exact cosine top-k."""
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((centroids.astype(np.float64) - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in d.argsort()[:n_probe]]
    cand = assigned.filter(F.col("cell").isin(probe))
    return brute_force_topk(cand, emb_col, id_col, query_vec, k)


def dot_lit(emb_col, vec):
    """Dot product of an array column with a literal vector — the same
    sequential zip_with/aggregate fold as cosine_cols (JVM codegen)."""
    v = F.array(*[F.lit(float(x)) for x in vec])
    ed = F.transform(emb_col, lambda x: x.cast("double"))
    return F.aggregate(F.zip_with(ed, v, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def lsh_topk_fixed_planes(df: DataFrame, emb_col: str, id_col: str,
                          planes: np.ndarray, query_vec,
                          k: int = 10) -> DataFrame:
    """Hyperplane-LSH top-k with DATA-DERIVED planes.

    `planes` is (n_tables, n_planes, dim): each table is a bank of
    hyperplanes taken from the corpus itself (e.g. a fixed slice of
    embeddings), not a seeded RNG — so the whole relation (sign
    pattern match → candidate set → exact cosine top-k) is pure
    arithmetic on the input table and therefore SQL-expressible and
    oracle-checkable. A row is a candidate when its projection signs
    equal the query's on ALL planes of ANY table. Sign tests are JVM
    folds; at corpus scale the packed bucket key would be precomputed
    at write time and this filter becomes a bucket lookup."""
    q = np.asarray(query_vec, dtype=np.float64)
    table_conds = []
    for tbl in planes:
        cond = None
        for h in tbl:
            qsign = bool(float(q @ np.asarray(h, dtype=np.float64)) > 0.0)
            pc = (dot_lit(F.col(emb_col), h) > 0) == F.lit(qsign)
            cond = pc if cond is None else (cond & pc)
        table_conds.append(cond)
    mask = table_conds[0]
    for c in table_conds[1:]:
        mask = mask | c
    return brute_force_topk(df.filter(mask), emb_col, id_col, query_vec, k)


def lsh_topk(df: DataFrame, emb_col: str, id_col: str, dim: int,
             query_vec, k: int = 10, n_planes: int = 8,
             n_tables: int = 4) -> DataFrame:
    """Approximate top-k: candidates = union of the query's LSH buckets
    across `n_tables` hyperplane banks, then exact cosine rank."""
    q = np.asarray(query_vec, dtype=np.float64)
    conds = []
    for t in range(n_tables):
        udf = make_hyperplane_udf(dim, n_planes, seed=11 + t)
        rng = np.random.default_rng(11 + t)
        planes = rng.standard_normal((dim, n_planes))
        signs = (q @ planes) > 0
        qkey = np.uint64(0)
        for j in range(n_planes):
            if signs[j]:
                qkey |= np.uint64(1) << np.uint64(j)
        conds.append(udf(F.col(emb_col)) == int(qkey.view(np.int64)))
    mask = conds[0]
    for c in conds[1:]:
        mask = mask | c
    return brute_force_topk(df.filter(mask), emb_col, id_col, query_vec, k)


def quantize_embeddings(df: DataFrame, emb_col: str = "embedding",
                        bits_scale: int = 127) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4×
    memory/IO reduction that makes billion-vector ANN shards fit
    executor memory (FAISS SQ8 family): q_j = floor(x_j·B/s + 0.5)
    with ONE global scale s = max(|x|) over the corpus, so dot
    products remain comparable across vectors.

    Adds `q` (array<int> in [-B, B]) and `q_scale` (s as double).
    Determinism/exactness: s is an exact max over floats; the
    float→double promotion, the double multiply/divide, and floor are
    all IEEE-deterministic, so a SQL twin (list_transform with the
    same expression) reproduces every code bit-for-bit — no ROUND
    half-even ambiguity (floor(x+0.5) is half-UP in both engines by
    construction). NULL embeddings pass through as NULL.

    Scale shape: one map-side-combined global max (bytes: one double
    per task) broadcast back as a scalar; quantization itself is a
    pure projection — zero data shuffles, embeddings never move.

    Degenerate corpora (all-zero, all-NULL, or empty): s would be 0 or
    NULL and x·B/s would emit NaN→NULL codes that poison downstream
    dot products silently — substitute scale 1 so such corpora yield
    exact all-zero codes instead (q_scale reports the substituted 1.0).
    """
    spark = df.sparkSession
    s = (df.select(F.explode(emb_col).alias("_x"))
         .agg(F.coalesce(F.nullif(F.max(F.abs(F.col("_x"))), F.lit(0.0)),
                         F.lit(1.0)).cast("double").alias("_s")))
    return (df.crossJoin(F.broadcast(s))
            .withColumn(
                "q",
                F.transform(
                    F.col(emb_col),
                    lambda x: F.floor(x.cast("double") * bits_scale
                                      / F.col("_s") + 0.5)
                               .cast("int")))
            .withColumnRenamed("_s", "q_scale"))


def ivf_topk_int8(assigned: DataFrame, id_col: str,
                  centroids: np.ndarray, query_vec, query_q,
                  k: int = 10, n_probe: int = 2,
                  q_col: str = "q") -> DataFrame:
    """The billion-vector SERVING composition: IVF coarse probe over
    int8 codes — quantize_embeddings → ivf_assign → this. The corpus is
    stored partitioned by `cell` as int8 codes (4× less scan IO than
    float); a query reads only the `n_probe` cells nearest its FLOAT
    vector (the coarse quantizer stays float — codes replace only the
    fine distance), then ranks candidates by the EXACT BIGINT code dot
    (quantized_topk), so scores and ties are partition- and
    engine-exact.

    Probe choice uses the same -2·q·c + |c|² expansion (stable argsort,
    ties to the lowest cell id) as make_cell_udf's assignment, so a SQL
    twin reproduces the probe set bit-for-bit.

    Scale shape: cell-partitioned storage prunes the scan to
    n_probe/n_cells of the corpus; the dot is a codegen fold over int
    arrays; only k rows per partition reach the final top-k reduction.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    cents = centroids.astype(np.float64)
    scores = -2.0 * (cents @ q) + (cents ** 2).sum(axis=1)
    probe = [int(c) for c in scores.argsort(kind="stable")[:n_probe]]
    cand = assigned.filter(F.col("cell").isin(probe))
    return quantized_topk(cand, query_q, k=k, id_col=id_col, q_col=q_col)


def quantized_topk(quantized: DataFrame, query_q, k: int = 10,
                   id_col: str = "vec_id",
                   q_col: str = "q") -> DataFrame:
    """Top-k retrieval over int8 codes by EXACT integer dot product —
    the serving-side half of quantize_embeddings: for unit-normalized
    embeddings the code dot product preserves the cosine ordering up
    to quantization error, and because every score is a BIGINT sum of
    int products, ties and order are engine- and partition-exact
    (contrast float cosine, where only rounded scores compare).

    `query_q`: the query's code vector (list[int] or a 1-row Column).
    Plan shape: one zip_with/aggregate projection (codegen, ints) →
    TakeOrderedAndProject on (dot DESC, id ASC) — no shuffle beyond
    the top-k reduction, 4× less scan IO than the float path.
    """
    if not isinstance(query_q, F.Column):
        query_q = F.array(*[F.lit(int(v)).cast("int") for v in query_q])
    dot = F.aggregate(
        F.zip_with(F.col(q_col), query_q,
                   lambda x, y: (x.cast("long") * y.cast("long"))),
        F.lit(0).cast("long"), lambda a, v: a + v)
    return (quantized.select(F.col(id_col), dot.alias("dot_q"))
            .orderBy(F.col("dot_q").desc(), F.col(id_col))
            .limit(k))
