"""The keep/drop decision pipeline — DataFrame-first, zero driver loops.

Stage order (cheap → expensive, SURVEY.md §3 lifecycle equivalent):

  S1 heuristic stats     pure Catalyst expressions (whole-stage codegen)
  S2 url dedup           slim aggregate: min (warc_ts, md5) pair per url
                         — only key columns shuffle, never the text; the
                         flag join back is AQE-broadcast at bench scale
  S3 timeliness          partition-prunable timestamp predicate
  S4-S6 models (FUSED)   ONE Arrow-batched pandas UDF: language ID
                         (hashed char-trigram model) → perplexity GATED
                         on survivors of S1-S3+langid so the LM never
                         scores already-dropped docs → compiled-regex
                         scrub. Fused on purpose: chained pandas UDFs
                         each add a concurrent python worker per task
                         and an Arrow transfer of the text column.
  S7 decision            CASE-style rule_hits array + keep boolean

Reference ancestry per SURVEY.md §0/§2: heuristics = validity/completeness
(CaseStudy.md:108-142, CASE-WHEN conditional aggregates B8), dedup =
uniqueness (CaseStudy.md:144-147, COUNT(DISTINCT) B10), langid =
consistency (CaseStudy.md:134-137), perplexity = accuracy
(CaseStudy.md:129-132), scrub = safety regex layer
(unity_sql_agent.py:127-159), decision = CASE categorizer B22
(CaseStudy.md:966-970).

Scale notes: the per-doc path has exactly ONE shuffle, and it carries
only (url, warc_ts, md5) — the document text never shuffles. All
heuristics stay JVM-side; the fused Python stage is Arrow-batched and
columnar. `html` is never read unless text extraction is requested —
column pruning reaches the parquet/Iceberg scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (DoubleType, IntegerType, LongType, StringType,
                               StructField, StructType)

from . import config as C
from .functions import text_stats

# Frozen lowercase stopword set for the fused UDF's counting pass.
_STOPSET = frozenset(C.ALL_STOPWORDS)

# Explicit DataType return types (DDL strings would need a live session at
# import time).
_LANGID_T = StructType([StructField("lang_pred", StringType()),
                        StructField("lang_score", DoubleType())])
_SCRUB_T = StructType([StructField("text_scrubbed", StringType()),
                       StructField("pii_email", IntegerType()),
                       StructField("pii_phone", IntegerType()),
                       StructField("pii_ipv4", IntegerType()),
                       StructField("pii_toxicity", IntegerType())])
_MODELS_T = StructType(
    _LANGID_T.fields + [StructField("ppl", DoubleType())] + _SCRUB_T.fields
    + [StructField("stopword_count", LongType()),
       StructField("stopword_frac", DoubleType()),
       StructField("n_lines", LongType()),
       StructField("repeated_line_frac", DoubleType())])

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


@pandas_udf(_MODELS_T)
def models_udf(text: pd.Series, lang: pd.Series,
               cheap_ok: pd.Series) -> pd.DataFrame:
    """Fused model stage: word-level stats → langid → (gated)
    perplexity → scrub in ONE Arrow round-trip.

    Running these as separate pandas UDFs puts chained ArrowEvalPython
    nodes in the stage, i.e. several concurrent Python workers PER TASK
    — measured 10-50× worker-time inflation at 32 task slots from pure
    process thrash, plus repeated Arrow transfers of the text column.
    Fused: one worker per task, one transfer, and the cheap-rules-first
    gate (perplexity only for docs that passed every cheaper rule) is a
    numpy mask instead of a plan dependency.

    The stopword/repeated-line stats live HERE rather than as JVM array
    expressions because they need the tokenized words/lines: building
    those arrays JVM-side is allocation-bound and was the single
    largest non-scaling cost; in Python the text is already paid for by
    the langid/scrub transfer and the counting is a cache-resident pass.

    `cheap_ok` = arithmetic heuristics passed & not duplicate & not
    stale (JVM-side). Gate = cheap_ok & stopword ok & repeated-lines ok
    & not lang-mismatch — the exact oracle staging (oracle.py evaluates
    the same predicate order).
    """
    from .functions import langid, lm, scrub

    stopset = _STOPSET
    vocab_get = lm.get_model()[0].get
    n = len(text)
    sw_count = np.zeros(n, dtype=np.int64)
    sw_frac = np.zeros(n, dtype=np.float64)
    n_lines = np.zeros(n, dtype=np.int64)
    rep_frac = np.zeros(n, dtype=np.float64)
    nw_pos = np.zeros(n, dtype=bool)
    ids_list: list[list[int]] = [[]] * n
    vals = text.to_numpy(dtype=object)
    for i in range(n):
        t = vals[i]
        if not isinstance(t, str) or not t:
            continue
        words = t.split()
        nw = len(words)
        if nw:
            nw_pos[i] = True
            c = 0
            ids = []
            # single pass per word: stopword membership AND LM vocab id
            for w in words:
                if w.lower() in stopset:
                    c += 1
                ids.append(vocab_get(w, -1))
            ids_list[i] = ids
            sw_count[i] = c
            sw_frac[i] = c / nw
        lines = [l for l in t.split("\n") if l != ""]
        nl = len(lines)
        n_lines[i] = nl
        if nl:
            rep_frac[i] = (nl - len(set(lines))) / nl

    sw_rule = nw_pos & ((sw_count < C.MIN_STOPWORD_COUNT)
                        | (sw_frac < C.MIN_STOPWORD_FRACTION))
    rl_rule = nw_pos & (rep_frac > C.MAX_REPEATED_LINE_FRACTION)

    pred, score = langid.score_texts(text)
    lang_arr = lang.to_numpy(dtype=object)
    known = np.array([isinstance(l, str) for l in lang_arr])
    mismatch = ((pred != "und") & known
                & (pred != lang_arr) & (score >= C.LANGID_MIN_SCORE))
    gate = (cheap_ok.fillna(False).to_numpy(dtype=bool)
            & ~sw_rule & ~rl_rule & ~mismatch)

    ppl = np.full(n, np.nan)
    if gate.any():
        gidx = np.flatnonzero(gate)
        ppl[gidx] = lm.perplexity_from_ids([ids_list[i] for i in gidx])
    ppl_out = pd.array(ppl, dtype="Float64")
    ppl_out[~gate | np.isnan(ppl)] = pd.NA

    # sparse scrub: None = unchanged; the JVM coalesces back to the input
    # text column, so unmodified docs never travel back through Arrow
    scrubbed, hits = scrub.scrub_series_sparse(text)
    return pd.DataFrame({
        "lang_pred": pred,
        "lang_score": score,
        "ppl": pd.Series(ppl_out, index=text.index),
        "text_scrubbed": scrubbed,
        "pii_email": hits.map(lambda h: h.get("email", 0)).astype("int32"),
        "pii_phone": hits.map(lambda h: h.get("phone", 0)).astype("int32"),
        "pii_ipv4": hits.map(lambda h: h.get("ipv4", 0)).astype("int32"),
        "pii_toxicity": hits.map(lambda h: h.get("toxicity", 0)).astype("int32"),
        "stopword_count": sw_count,
        "stopword_frac": sw_frac,
        "n_lines": n_lines,
        "repeated_line_frac": rep_frac,
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


def _dup_pair() -> Column:
    return F.struct(F.col("warc_ts").alias("_ts"), _dup_md5().alias("_md5"))


def dedup_flags(full_pages: DataFrame) -> DataFrame:
    """Corpus-wide url-dedup reference: (url, _min_pair).

    The earliest (warc_ts, md5(text)) pair per url wins; any row whose
    pair compares strictly greater is a duplicate. Value-based (not
    positional) on purpose: the flag frame is ONE slim row per distinct
    url, so the document text never enters the dedup shuffle — only
    (url, ts, md5) aggregates, and the flag join back to the corpus is
    AQE-broadcastable at bench scale (sort-merge at 10^12 docs, where an
    Iceberg url-bucketed layout makes it shuffle-free). Kept separate
    from with_decisions so a RESUMED run can rank against the FULL
    corpus while only processing the remaining partitions.
    """
    return (full_pages
            .select("url", _dup_pair().alias("_pair"))
            .groupBy("url").agg(F.min("_pair").alias("_min_pair")))


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

    # S1: arithmetic heuristics (pure codegen — no array allocations;
    # the word/line-array stats come back from the fused UDF)
    df = df.select("*", *text_stats.stats_columns_cheap())

    # S2: corpus-level url dedup — earliest (warc_ts, md5) pair per url
    # wins. The aggregate sees only slim key columns; text stays put.
    if not mark_dups:
        # streaming path: unbounded dedup state is not allowed; dedup is
        # handled upstream by watermarked dropDuplicates (streaming/).
        df = df.withColumn("is_dup_url", F.lit(False))
    else:
        flags = dedup_flags(dedup_scope if dedup_scope is not None else df)
        df = (df.join(flags, "url", "left")
                .withColumn("is_dup_url",
                            F.coalesce(_dup_pair() > F.col("_min_pair"),
                                       F.lit(False)))
                .drop("_min_pair"))

    # S3: heuristic/dup/staleness rule booleans (pure Catalyst; exact
    # oracle semantics — empty text suppresses the other heuristics).
    # Language-mismatch is NOT here: it needs the langid output and is
    # evaluated both inside the fused UDF (for the perplexity gate) and
    # as a JVM expression afterwards (for rule assembly) — identical
    # float comparisons, so the two agree bit-for-bit.
    has_text = F.col("n_words") > 0
    rules_cheap = [
        (C.R_EMPTY, ~has_text),
        (C.R_SHORT, has_text & (F.col("n_words") < C.MIN_WORDS)),
        (C.R_LONG, has_text & (F.col("n_words") > C.MAX_WORDS)),
        (C.R_MEAN_WORD_LEN, has_text & ~F.col("mean_word_len").between(
            C.MIN_MEAN_WORD_LEN, C.MAX_MEAN_WORD_LEN)),
        (C.R_SYMBOL_RATIO, has_text
         & (F.col("symbol_ratio") > C.MAX_SYMBOL_WORD_RATIO)),
        (C.R_DUP_URL, F.col("is_dup_url")),
        (C.R_STALE, F.col("warc_ts") < F.lit(C.TS_MIN_ISO)),
    ]
    cheap_fail = None
    for _rid, cond in rules_cheap:
        safe = F.coalesce(cond, F.lit(False))
        cheap_fail = safe if cheap_fail is None else (cheap_fail | safe)

    # S4-S6 fused: word-level stats → langid → gated perplexity → scrub
    # in ONE Arrow node (one python worker per task, one text transfer).
    df = df.withColumn("_m", models_udf(F.col("text"), F.col("lang"),
                                        ~cheap_fail))
    df = df.select("*", *[
        (F.coalesce(F.col("_m.text_scrubbed"), F.col("text"))
         .alias("text_scrubbed") if f.name == "text_scrubbed"
         else F.col(f"_m.{f.name}").alias(f.name))
        for f in _MODELS_T.fields]).drop("_m")

    # S7: decision. rule_hits keeps config.ALL_RULES order. The perplexity
    # gate implies every cheaper rule passed whenever ppl is non-null, so
    # a ppl hit always yields exactly [R_PPL]. The stopword/repeated-line
    # conditions recompute the SAME comparisons the UDF used for its gate
    # from the returned stat columns — identical floats, identical truth.
    mismatch = ((F.col("lang_pred") != F.lit("und"))
                & (F.col("lang_pred") != F.col("lang"))
                & (F.col("lang_score") >= C.LANGID_MIN_SCORE))
    stopword_cond = has_text & (
        (F.col("stopword_count") < C.MIN_STOPWORD_COUNT)
        | (F.col("stopword_frac") < C.MIN_STOPWORD_FRACTION))
    replines_cond = has_text & (
        F.col("repeated_line_frac") > C.MAX_REPEATED_LINE_FRACTION)
    by_id = dict(rules_cheap)
    ordered = [
        (C.R_EMPTY, by_id[C.R_EMPTY]),
        (C.R_SHORT, by_id[C.R_SHORT]),
        (C.R_LONG, by_id[C.R_LONG]),
        (C.R_MEAN_WORD_LEN, by_id[C.R_MEAN_WORD_LEN]),
        (C.R_SYMBOL_RATIO, by_id[C.R_SYMBOL_RATIO]),
        (C.R_STOPWORD, stopword_cond),
        (C.R_REPEATED_LINES, replines_cond),
        (C.R_DUP_URL, by_id[C.R_DUP_URL]),
        (C.R_LANG_MISMATCH, mismatch),
        (C.R_STALE, by_id[C.R_STALE]),
    ]
    pre_hits = F.array_compact(F.array(
        *[_rule_entry(cond, rid) for rid, cond in ordered]))
    ppl_hit = F.col("ppl").isNotNull() & (F.col("ppl") > C.MAX_PPL)
    rule_hits = F.when(ppl_hit, F.array(F.lit(C.R_PPL))).otherwise(pre_hits)
    df = df.withColumn("rule_hits", rule_hits).drop("is_dup_url")
    df = df.withColumn("keep", F.size("rule_hits") == 0)
    return df


DECISION_COLUMNS = ["url", "warc_ts", "lang", "host", C.PARTITION_COL,
                    "keep", "rule_hits", "lang_pred", "lang_score", "ppl",
                    "text_scrubbed",
                    "pii_email", "pii_phone", "pii_ipv4", "pii_toxicity"]


def decisions(pages: DataFrame, **kw) -> DataFrame:
    """The `decisions` output table (FIXTURES.md §2 shape + pii counters)."""
    return with_decisions(pages, **kw).select(*DECISION_COLUMNS)
