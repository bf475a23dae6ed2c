"""Language-ID + perplexity model behavior (SURVEY.md §7 S3/S4)."""

import numpy as np
import pandas as pd

from dataquality_spark import config as C, synth
from dataquality_spark.functions import langid, lm


def _docs(lang, n_docs=40, seed=5):
    rng = np.random.default_rng(seed)
    return pd.Series([" ".join(synth.gen_tokens(lang, 100, rng))
                      for _ in range(n_docs)])


def test_langid_every_language():
    for lang in C.LANGS:
        pred, score = langid.score_texts(_docs(lang))
        assert (pred == lang).all(), lang
        assert (score >= C.LANGID_MIN_SCORE).all(), lang


def test_langid_totality():
    """Every doc gets a classification (und only for word-less text)."""
    pred, _ = langid.score_texts(pd.Series(["", None, "  ", "the data"]))
    assert list(pred) == ["und", "und", "und", "en"]


def test_langid_deterministic():
    d = _docs("fr")
    p1, s1 = langid.score_texts(d)
    p2, s2 = langid.score_texts(d)
    assert (p1 == p2).all() and (s1 == s2).all()


def test_ppl_separates_gibberish():
    clean = lm.perplexity(_docs("en"))
    rng = np.random.default_rng(9)
    gib = lm.perplexity(pd.Series([
        " ".join("".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), 6))
                 for _ in range(100)) for _ in range(40)]))
    assert np.nanmax(clean) < C.MAX_PPL
    assert np.nanmin(gib) > C.MAX_PPL


def test_ppl_rounding_stability():
    d = _docs("es")
    assert (lm.perplexity(d) == lm.perplexity(d)).all()


def test_standalone_udfs_equal_fused(spark, pages_sdf, golden):
    """The standalone langid/perplexity/scrub pandas UDFs are the
    unfused regression oracle for the fused models_udf: same scores,
    byte-identical scrub, same gated perplexity wherever the fused gate
    evaluated it."""
    from pyspark.sql import functions as F

    from dataquality_spark import pipeline

    unfused = pages_sdf.select(
        "url", "warc_ts",
        pipeline.langid_udf("text").alias("li"),
        pipeline.scrub_udf("text").alias("sc"),
        pipeline.perplexity_udf("text", F.lit(True)).alias("ppl_all"),
    ).select("url", "warc_ts", "li.lang_pred", "li.lang_score",
             "sc.text_scrubbed", "ppl_all").toPandas()
    m = golden.merge(unfused, on=["url", "warc_ts"], suffixes=("_g", "_s"))
    assert len(m) == len(golden)
    assert (m.lang_pred_g == m.lang_pred_s).all()
    assert (m.lang_score_g == m.lang_score_s).all()
    assert (m.text_scrubbed_g == m.text_scrubbed_s).all()
    gated = m.ppl.notna()   # golden's ppl has no name collision → no suffix
    assert (m.loc[gated, "ppl"] == m.loc[gated, "ppl_all"]).all()
