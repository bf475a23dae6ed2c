"""The keep/drop decision pipeline — DataFrame-first, zero driver loops.

Stage order (cheap → expensive, SURVEY.md §3 lifecycle equivalent):

  S1 heuristic stats     pure Catalyst expressions (whole-stage codegen)
  S2 url dedup           one shuffle: window over url (near-unique keys)
  S3 language ID         Arrow-batched pandas UDF (hashed char-trigram model)
  S4 timeliness          partition-prunable timestamp predicate
  S5 perplexity          Arrow-batched pandas UDF, GATED on survivors of
                         S1-S4 so the LM never scores already-dropped docs
  S6 scrub               Arrow-batched pandas UDF (compiled-regex bank)
  S7 decision            CASE-style rule_hits array + keep boolean

Reference ancestry per SURVEY.md §0/§2: heuristics = validity/completeness
(CaseStudy.md:108-142, CASE-WHEN conditional aggregates B8), dedup =
uniqueness (CaseStudy.md:144-147, COUNT(DISTINCT) B10), langid =
consistency (CaseStudy.md:134-137), perplexity = accuracy
(CaseStudy.md:129-132), scrub = safety regex layer
(unity_sql_agent.py:127-159), decision = CASE categorizer B22
(CaseStudy.md:966-970).

Scale notes: the per-doc path has exactly ONE shuffle (url dedup). All
heuristics stay JVM-side; the three Python stages are Arrow-batched and
columnar. `html` is never read unless text extraction is requested —
column pruning reaches the parquet/Iceberg scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (DoubleType, IntegerType, StringType,
                               StructField, StructType)

from . import config as C
from .functions import text_stats

# Explicit DataType return types (DDL strings would need a live session at
# import time).
_LANGID_T = StructType([StructField("lang_pred", StringType()),
                        StructField("lang_score", DoubleType())])
_SCRUB_T = StructType([StructField("text_scrubbed", StringType()),
                       StructField("pii_email", IntegerType()),
                       StructField("pii_phone", IntegerType()),
                       StructField("pii_ipv4", IntegerType()),
                       StructField("pii_toxicity", IntegerType())])

# ---------------------------------------------------------------------------
# Pandas UDFs (Arrow-batched; models rebuilt lazily per executor —
# deterministic, so no closure shipping / broadcast needed)
# ---------------------------------------------------------------------------


@pandas_udf(_LANGID_T)
def langid_udf(text: pd.Series) -> pd.DataFrame:
    from .functions import langid

    pred, score = langid.score_texts(text)
    return pd.DataFrame({"lang_pred": pred, "lang_score": score})


@pandas_udf(DoubleType())
def perplexity_udf(text: pd.Series, gate: pd.Series) -> pd.Series:
    """Gated perplexity: NaN (→ SQL NULL) for docs already dropped."""
    from .functions import lm

    out = np.full(len(text), np.nan)
    mask = gate.fillna(False).to_numpy(dtype=bool)
    if mask.any():
        out[mask] = lm.perplexity(text[mask])
    # Nullable Float64 so ungated rows surface as SQL NULL, not NaN.
    res = pd.array(out, dtype="Float64")
    res[~mask | np.isnan(out)] = pd.NA
    return pd.Series(res, index=text.index)


@pandas_udf(_SCRUB_T)
def scrub_udf(text: pd.Series) -> pd.DataFrame:
    from .functions import scrub

    scrubbed, hits = scrub.scrub_series(text)
    return pd.DataFrame({
        "text_scrubbed": scrubbed,
        "pii_email": hits.map(lambda h: h.get("email", 0)).astype("int32"),
        "pii_phone": hits.map(lambda h: h.get("phone", 0)).astype("int32"),
        "pii_ipv4": hits.map(lambda h: h.get("ipv4", 0)).astype("int32"),
        "pii_toxicity": hits.map(lambda h: h.get("toxicity", 0)).astype("int32"),
    })


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Strip the trivial `<html><body>…</body></html>` wrapper.

    Byte-identity contract (BASELINE.json input_hint): for corpus rows the
    extracted text equals the `text` column exactly. Real-world HTML
    extraction would slot in here; the wrapper strip keeps the Spark-side
    plumbing (binary column → Arrow → string) real and tested.
    """
    import re as _re

    pat = _re.compile(rb"^<html><body>(.*)</body></html>$", _re.DOTALL)

    def _one(b):
        if b is None:
            return None
        m = pat.match(bytes(b))
        return (m.group(1) if m else bytes(b)).decode("utf-8", errors="replace")

    return html.map(_one)


# ---------------------------------------------------------------------------
# Pipeline assembly
# ---------------------------------------------------------------------------

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def assert_schema(df: DataFrame) -> DataFrame:
    """Fail fast if the input shape drifts (reference A11/A12 analog:
    unity_sql_agent.py:421-450 schema gate + :452-513 column validator)."""
    missing = [c for c in PAGES_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"pages input is missing columns: {missing}")
    return df


def _rule_entry(cond: Column, rule_id: str) -> Column:
    return F.when(cond, F.lit(rule_id))


def _dup_md5() -> Column:
    return F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary"))


def dedup_flags(full_pages: DataFrame) -> DataFrame:
    """Corpus-wide url-dedup flags: (url, warc_ts, _md5, is_dup_url).

    First occurrence per url by (warc_ts, md5(text)) wins. Kept separate
    from with_decisions so a RESUMED run can rank against the FULL corpus
    (three light columns — column pruning keeps the scan cheap) while only
    processing the remaining partitions; otherwise a duplicate whose
    original sits in an already-completed partition would be missed.
    """
    w = Window.partitionBy("url").orderBy("warc_ts", "_md5")
    return (full_pages
            .select("url", "warc_ts", _dup_md5().alias("_md5"))
            .withColumn("_rn", F.row_number().over(w))
            .select("url", "warc_ts", "_md5",
                    (F.col("_rn") > 1).alias("is_dup_url")))


def with_decisions(pages: DataFrame, extract_from_html: bool = False,
                   salt_repartition: int | None = None,
                   dedup_scope: DataFrame | None = None,
                   mark_dups: bool = True) -> DataFrame:
    """Full per-document decision pipeline.

    Input: `pages` with (url, warc_ts, html, text, lang).
    Output adds: host, partition_id, the heuristic stat columns, lang_pred,
    lang_score, ppl, text_scrubbed, pii_* counts, rule_hits, keep.

    `dedup_scope`: pass the FULL pages frame when `pages` is a subset
    (resume); url-dedup ranks are then computed corpus-wide and joined in.
    """
    df = assert_schema(pages)
    if extract_from_html:
        df = df.withColumn("text", F.coalesce(
            F.col("text"), extract_text_udf(F.col("html"))))
    # Column pruning: html is not needed downstream.
    df = df.select([c for c in df.columns if c != "html"])

    df = df.select(
        "*",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.date_format("warc_ts", "yyyy-MM").alias(C.PARTITION_COL),
    )

    if salt_repartition:
        # Skewed-host mitigation: explicit salted repartition so one hot
        # host cannot pin a single task (north_star requirement).
        df = df.withColumn("_salt", F.pmod(F.xxhash64("url"),
                                           F.lit(C.SALT_BUCKETS)))
        df = df.repartition(salt_repartition, "host", "_salt").drop("_salt")

    # S1: heuristics (pure codegen)
    df = df.select("*", *text_stats.stats_columns())

    # S2: corpus-level url dedup — first occurrence by (warc_ts, md5) wins.
    if not mark_dups:
        # streaming path: unbounded window state is not allowed; dedup is
        # handled upstream by watermarked dropDuplicates (streaming/).
        df = df.withColumn("is_dup_url", F.lit(False))
    elif dedup_scope is not None:
        flags = dedup_flags(dedup_scope)
        df = (df.withColumn("_md5", _dup_md5())
                .join(flags, ["url", "warc_ts", "_md5"], "left")
                .withColumn("is_dup_url",
                            F.coalesce("is_dup_url", F.lit(False)))
                .drop("_md5"))
    else:
        w = Window.partitionBy("url").orderBy("warc_ts", _dup_md5())
        df = df.withColumn("_rn", F.row_number().over(w))
        df = df.withColumn("is_dup_url", F.col("_rn") > 1).drop("_rn")

    # S3: language ID (Arrow batch)
    df = df.withColumn("_lid", langid_udf(F.col("text")))
    df = df.select("*", F.col("_lid.lang_pred").alias("lang_pred"),
                   F.col("_lid.lang_score").alias("lang_score")).drop("_lid")

    # Rule booleans (exact oracle semantics; empty suppresses other heuristics)
    has_text = F.col("n_words") > 0
    rules_pre = [
        (C.R_EMPTY, ~has_text),
        (C.R_SHORT, has_text & (F.col("n_words") < C.MIN_WORDS)),
        (C.R_LONG, has_text & (F.col("n_words") > C.MAX_WORDS)),
        (C.R_MEAN_WORD_LEN, has_text & ~F.col("mean_word_len").between(
            C.MIN_MEAN_WORD_LEN, C.MAX_MEAN_WORD_LEN)),
        (C.R_SYMBOL_RATIO, has_text
         & (F.col("symbol_ratio") > C.MAX_SYMBOL_WORD_RATIO)),
        (C.R_STOPWORD, has_text
         & ((F.col("stopword_count") < C.MIN_STOPWORD_COUNT)
            | (F.col("stopword_frac") < C.MIN_STOPWORD_FRACTION))),
        (C.R_REPEATED_LINES, has_text
         & (F.col("repeated_line_frac") > C.MAX_REPEATED_LINE_FRACTION)),
        (C.R_DUP_URL, F.col("is_dup_url")),
        (C.R_LANG_MISMATCH, (F.col("lang_pred") != F.lit("und"))
         & (F.col("lang_pred") != F.col("lang"))
         & (F.col("lang_score") >= C.LANGID_MIN_SCORE)),
        (C.R_STALE, F.col("warc_ts") < F.lit(C.TS_MIN_ISO)),
    ]
    pre_hits = F.array_compact(F.array(
        *[_rule_entry(cond, rid) for rid, cond in rules_pre]))
    df = df.withColumn("_pre_hits", pre_hits)

    # S5: gated perplexity — the LM only scores docs with no hits so far.
    gate = F.size(F.col("_pre_hits")) == 0
    df = df.withColumn("ppl", perplexity_udf(F.col("text"), gate))

    # S6: scrub (always runs; scrubbed text is emitted for every doc)
    df = df.withColumn("_scr", scrub_udf(F.col("text")))
    df = df.select("*",
                   F.col("_scr.text_scrubbed").alias("text_scrubbed"),
                   F.col("_scr.pii_email").alias("pii_email"),
                   F.col("_scr.pii_phone").alias("pii_phone"),
                   F.col("_scr.pii_ipv4").alias("pii_ipv4"),
                   F.col("_scr.pii_toxicity").alias("pii_toxicity"),
                   ).drop("_scr")

    # S7: decision. rule_hits keeps config.ALL_RULES order. The perplexity
    # gate implies _pre_hits is empty whenever ppl is non-null, so a ppl hit
    # always yields exactly [R_PPL].
    ppl_hit = F.col("ppl").isNotNull() & (F.col("ppl") > C.MAX_PPL)
    rule_hits = F.when(ppl_hit, F.array(F.lit(C.R_PPL))) \
                 .otherwise(F.col("_pre_hits"))
    df = df.withColumn("rule_hits", rule_hits).drop("_pre_hits", "is_dup_url")
    df = df.withColumn("keep", F.size("rule_hits") == 0)
    return df


DECISION_COLUMNS = ["url", "warc_ts", "lang", "host", C.PARTITION_COL,
                    "keep", "rule_hits", "lang_pred", "lang_score", "ppl",
                    "text_scrubbed",
                    "pii_email", "pii_phone", "pii_ipv4", "pii_toxicity"]


def decisions(pages: DataFrame, **kw) -> DataFrame:
    """The `decisions` output table (FIXTURES.md §2 shape + pii counters)."""
    return with_decisions(pages, **kw).select(*DECISION_COLUMNS)
