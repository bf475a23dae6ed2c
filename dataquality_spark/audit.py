"""Per-partition audit lineage + rule-hit metrics (FIXTURES.md §3).

Reference ancestry: the AgentResult envelope + execution timing
(/root/reference/agents/base_agent.py:60-103) and usage-stats accumulator
(/root/reference/services/llm_service.py:127-136, main.py:518-539) become
one audit row per corpus partition; the reference's canonical
row-count / distinct-count assessment (/root/reference/main.py:100-103 —
including its invalid `COUNT(DISTINCT *)`, which we define properly as
distinct-url count per SURVEY.md §7 risk 5) becomes the n_docs /
n_distinct_urls columns; per-column completeness is the reference's
completeness ratio aggregate (DataQuality_AI_CaseStudy.md:111).

All aggregation is partial+final HashAggregate over partition_id — one
shuffle, map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import config as C

COMPLETENESS_COLUMNS = ["url", "warc_ts", "text", "lang"]


def audit_metrics(enriched: DataFrame,
                  approx_distinct: bool = False) -> DataFrame:
    """One audit row per partition_id from the with_decisions() frame.

    `approx_distinct=True` switches distinct-url counting to HLL
    (approx_count_distinct) — the 10^12-doc setting where exact
    count_distinct would add an extra expand/shuffle.
    """
    pid = C.PARTITION_COL
    distinct_urls = (F.approx_count_distinct("url") if approx_distinct
                     else F.count_distinct("url"))
    completeness = [
        F.round(F.count(c).cast("double") / F.count(F.lit(1)),
                C.SCORE_DECIMALS).alias(f"completeness_{c}")
        for c in COMPLETENESS_COLUMNS if c in enriched.columns
    ]
    base = enriched.groupBy(pid).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        distinct_urls.alias("n_distinct_urls"),
        F.sum("pii_email").cast("long").alias("n_pii_email"),
        F.sum("pii_phone").cast("long").alias("n_pii_phone"),
        F.sum("pii_ipv4").cast("long").alias("n_pii_ipv4"),
        F.sum("pii_toxicity").cast("long").alias("n_pii_toxicity"),
        *completeness,
    )

    # rule_hit_counts map: explode → count → deterministic sorted map.
    hits = (enriched
            .select(pid, F.explode("rule_hits").alias("rule"))
            .groupBy(pid, "rule").agg(F.count(F.lit(1)).alias("n"))
            .groupBy(pid)
            .agg(F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("rule", "n"))))
                .alias("rule_hit_counts")))

    return base.join(hits, pid, "left").withColumn(
        "rule_hit_counts",
        F.coalesce("rule_hit_counts",
                   F.map_from_arrays(F.array().cast("array<string>"),
                                     F.array().cast("array<bigint>"))))
