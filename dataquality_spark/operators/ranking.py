"""Exact global ranking + reciprocal-rank fusion of quality signals.

A curation stack ends up with several incomparable per-document
signals — heuristic quality score, LM perplexity, classifier logit,
host PageRank. Reciprocal-rank fusion (Cormack et al., SIGIR'09) is
the standard scale-free way to combine them: each signal contributes
1/(k + rank), so units and tails cancel and no signal dominates by
variance alone. On an integer lattice (scale div (k + rank)) the fused
score is exact, order-free, and a SQL twin reproduces it bit-for-bit.

The hard part at 10^12 rows is the EXACT GLOBAL RANK: a bare
`row_number() OVER (ORDER BY score)` plans a single-partition window —
the whole corpus through one task. `global_rank` instead uses the
two-phase range trick (same family as profile.exact_percentiles):

  1. repartitionByRange on the strict total order (score, id) — the
     sampled boundaries need NOT be balanced or reproducible; with a
     unique id in the order, every row has a unique key, so whatever
     boundaries the sampler picks induce the same global order;
  2. one bounded collect of per-partition COUNTS (≤ #partitions rows —
     driver work independent of data volume) → prefix offsets,
     shipped back as a map literal;
  3. a per-range-partition row_number window (parallel, no global
     sort) + offset = the exact global rank.

Only (id, score) ever shuffles; ranks are longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import track_persist as _track_persist


def global_rank(df: DataFrame, id_col: str, score_col: str,
                rank_col: str = "rank", descending: bool = True,
                partitions: int | None = None) -> DataFrame:
    """(id, rank) with rank = exact 1-based position in the total
    order (score DESC|ASC, NULLs last, id ASC as the tie-break).
    `id_col` must be unique — it makes the order strict, which is what
    lets range partitioning split anywhere without breaking ranks."""
    spark = df.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism * 2
    s = F.col(score_col)
    order = [s.desc_nulls_last() if descending else s.asc_nulls_last(),
             F.col(id_col).asc()]
    rp = (df.select(id_col, score_col)
          .repartitionByRange(p, *order)
          .withColumn("_pid", F.spark_partition_id()))
    # reused twice (counts, ranks) — without the persist the second
    # pass would re-sample boundaries and could place rows differently
    # than the counted layout
    rp = _track_persist(rp)
    cnts = rp.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    offs: list[object] = []
    acc = 0
    for r in sorted(cnts, key=lambda r: r["_pid"]):
        offs += [F.lit(r["_pid"]), F.lit(acc)]
        acc += r["n"]
    off_expr = F.create_map(*offs)[F.col("_pid")] if offs else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*order)
    return (rp.withColumn(
                rank_col,
                (off_expr + F.row_number().over(w)).cast("long"))
            .select(id_col, rank_col))


def rank_fusion(df: DataFrame, id_col: str, score_cols: list[str],
                k: int = 60, scale: int = 1_000_000_000,
                descending: bool = True,
                partitions: int | None = None) -> DataFrame:
    """Reciprocal-rank fusion: (id, rank_<col>..., rrf) with
    rrf = Σ_cols (scale div (k + rank_col)) — higher is better.
    All-integer, so ties and totals are engine-independent; k=60 is
    the published default. Each signal costs one slim (id, score)
    range shuffle; the final assembly joins #signals rank tables on
    the unique id (equi-joins on slim longs, AQE-broadcastable when a
    signal table has been pre-filtered)."""
    if not score_cols:
        raise ValueError("score_cols must be non-empty")
    if k <= 0 or scale <= 0:
        raise ValueError(f"k and scale must be positive: {k}, {scale}")
    out = None
    for c in score_cols:
        r = global_rank(df, id_col, c, f"rank_{c}", descending,
                        partitions)
        out = r if out is None else out.join(r, id_col)
    rrf = None
    for c in score_cols:
        term = F.expr(f"{scale} div ({k} + rank_{c})")
        rrf = term if rrf is None else rrf + term
    return out.withColumn("rrf", rrf.cast("long"))
