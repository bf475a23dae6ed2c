"""Crawl-snapshot diff: what changed between two crawls of the same
url space — the primitive behind incremental curation (CCNet/RefinedWeb
re-crawl handling: reprocess only pages that are new or whose content
moved; carry forward decisions for byte-identical pages).

Scale design: the join carries (url, md5(text), length) ONLY — the
content hash is computed in each side's scan projection, so document
text never crosses an exchange; at 10^12 urls the full-outer join is
one slim shuffle per side on the join key (or zero with both snapshots
bucketed by url). Change classes are a post-join CASE — pure codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STATUS_ADDED = "added"
STATUS_REMOVED = "removed"
STATUS_CHANGED = "changed"
STATUS_UNCHANGED = "unchanged"


def _slim(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """(key, md5, n_chars) projection — the ONLY columns that shuffle.
    NULL text is hashed as the empty string (a page that exists with
    no text is still a page; NULL vs '' is not a content change)."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(key_col).alias("_k"),
        F.md5(F.encode(txt, "UTF-8")).alias("_h"),
        F.length(txt).cast("long").alias("_n"))


def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str = "url",
                  text_col: str = "text") -> DataFrame:
    """Per-key change status between two snapshots.

    Returns (key_col, status, n_chars_old, n_chars_new, delta_chars)
    where status ∈ {added, removed, changed, unchanged}:
      added     — key only in `new`
      removed   — key only in `old`
      changed   — key in both, md5(text) differs
      unchanged — key in both, md5(text) identical
    n_chars_* are NULL on the absent side; delta_chars = new − old
    (NULL unless the key is in both). Keys are assumed unique per
    snapshot (run exact url-dedup first — the pipeline's keep-newest
    aggregate); duplicate keys would fan out through the join.
    """
    o = _slim(old, key_col, text_col)
    n = _slim(new, key_col, text_col)
    j = o.join(n.select(F.col("_k"),
                        F.col("_h").alias("_h2"),
                        F.col("_n").alias("_n2")),
               "_k", "full_outer")
    status = (F.when(F.col("_h").isNull(), F.lit(STATUS_ADDED))
              .when(F.col("_h2").isNull(), F.lit(STATUS_REMOVED))
              .when(F.col("_h") != F.col("_h2"), F.lit(STATUS_CHANGED))
              .otherwise(F.lit(STATUS_UNCHANGED)))
    return j.select(
        F.col("_k").alias(key_col),
        status.alias("status"),
        F.col("_n").alias("n_chars_old"),
        F.col("_n2").alias("n_chars_new"),
        (F.col("_n2") - F.col("_n")).alias("delta_chars"))


def needs_processing(old: DataFrame, new: DataFrame,
                     key_col: str = "url",
                     text_col: str = "text") -> DataFrame:
    """The incremental work set: rows of `new` whose key is added or
    changed vs `old` — everything else carries its previous decision
    forward. Implemented as snapshot_diff filtered to the two statuses
    then a key join back to `new` (slim keys shuffle; at a typical
    crawl-over-crawl change rate the diff side is small and AQE
    broadcasts it, so new-snapshot text never moves)."""
    d = (snapshot_diff(old, new, key_col, text_col)
         .where(F.col("status").isin(STATUS_ADDED, STATUS_CHANGED))
         .select(key_col, "status"))
    return new.join(d, key_col, "inner")


def diff_summary(old: DataFrame, new: DataFrame, key_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """One row per status with key count and exact char deltas —
    the crawl-over-crawl audit line (map-side-combined hash agg over
    the already-slim diff)."""
    return (snapshot_diff(old, new, key_col, text_col)
            .groupBy("status")
            .agg(F.count(F.lit(1)).cast("long").alias("n_keys"),
                 F.sum(F.coalesce("n_chars_old", F.lit(0)))
                  .cast("long").alias("chars_old"),
                 F.sum(F.coalesce("n_chars_new", F.lit(0)))
                  .cast("long").alias("chars_new")))
