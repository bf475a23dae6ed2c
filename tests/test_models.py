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


def test_featurize_batch_equals_per_doc():
    """batch_trigram_ids (the shared one-pass featurizer behind langid
    AND the quality classifier) must be bit-equal to the per-doc
    reference path on every edge shape: None / empty / whitespace /
    1-char / multi-codepoint unicode / truncation-boundary docs."""
    from dataquality_spark.functions import quality_model as qm

    rng = np.random.default_rng(7)
    texts = ["the data of the value", "a", "", None, "   ", 3.5,
             "x" * (langid.MAX_SCORED_CHARS + 40) + " beyond",
             "x" * langid.MAX_SCORED_CHARS,
             "naïve café — ünïcodé   nbsp \U0001F600 emoji",
             " ".join(synth.gen_tokens("de", 200, rng))]
    flat, nzlens, nz = langid.batch_trigram_ids(
        np.asarray(texts, dtype=object))
    ref = [qm._doc_ids(t) for t in texts]
    assert nz.tolist() == [len(r) > 0 for r in ref]
    assert nzlens.tolist() == [len(r) for r in ref if len(r)]
    assert np.array_equal(
        flat.astype(np.int64),
        np.concatenate([r for r in ref if len(r)] or
                       [np.empty(0, np.int64)]))
    # doc_aligned_sums == the unchunked reduceat it replaces
    wt = langid.get_model()
    starts = np.zeros(len(nzlens), dtype=np.int64)
    np.cumsum(nzlens[:-1], out=starts[1:])
    assert np.array_equal(langid.doc_aligned_sums(wt, flat, nzlens),
                          np.add.reduceat(wt[flat], starts, axis=0))


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


# ---------------------------------------------------------------------------
# quality_model (DCLM-style distilled classifier)
# ---------------------------------------------------------------------------

class TestQualityModel:
    def test_build_is_deterministic(self):
        from dataquality_spark.functions import quality_model as qm

        a_w, a_c = qm._build_model()
        b_w, b_c = qm._build_model()
        assert np.array_equal(a_w, b_w) and np.array_equal(a_c, b_c)

    def test_heldout_auc_and_edge_scores(self):
        """Distillation quality on a seed NEVER used in training: the
        min-over-calibrated-heads score must rank clean docs above
        text-defect docs (measured 0.96; floor leaves margin), and the
        gibberish head must be near-perfect."""
        from dataquality_spark import oracle, synth
        from dataquality_spark.functions import quality_model as qm

        pages = synth.gen_pages(1500, seed=5)
        inp = pages[["url", "warc_ts", "html", "text", "lang"]]
        hits = oracle.run_oracle(inp)["rule_hits"]
        clean = np.array([len(h) == 0 for h in hits])
        s = qm.score_texts(inp["text"])

        def auc(scores, y):
            pos, neg = scores[y], scores[~y]
            r = np.argsort(np.argsort(np.concatenate([pos, neg])))
            return ((r[:len(pos)].sum() - len(pos) * (len(pos) - 1) / 2)
                    / (len(pos) * len(neg)))

        anydef = np.array([bool(set(h) & set(qm.HEADS)) for h in hits])
        m = clean | anydef
        assert auc(s[m], clean[m]) >= 0.93
        ppl = np.array(["high_perplexity" in h for h in hits])
        mp = clean | ppl
        assert auc(s[mp], clean[mp]) >= 0.99
        # empty and None score hard zero
        assert qm.score_texts(pd.Series(["", None])).tolist() == [0, 0]

    def test_spark_udf_equals_numpy(self, spark):
        from dataquality_spark import synth
        from dataquality_spark.functions import quality_model as qm

        pages = synth.gen_pages(300, seed=11)
        sdf = spark.createDataFrame(pages[["url", "text"]])
        out = (qm.quality_scores(sdf, "text")
               .select("text", "quality_model_score").toPandas())
        exp = qm.score_texts(out["text"])
        assert (out["quality_model_score"].to_numpy() == exp).all()
        assert out["quality_model_score"].nunique() > 10

    def test_fixed_model_matches_pure_python(self):
        """The SQL-checkable twin weights through the REAL scoring path
        (score_texts) must equal an independent pure-Python rebuild —
        per-char hash loop, explicit per-head mean/calibrate/sigmoid —
        i.e. the reduceat/gather vectorization is semantics-free."""
        import math

        from dataquality_spark.functions import quality_model as qm

        texts = ["key agg row scan", "a", "", None, "   ",
                 "x" * 600 + " tail beyond the truncation window"]
        got = qm.score_texts(pd.Series(texts), model=qm.fixed_model())
        for t, g in zip(texts, got):
            if t is None or not str(t).strip():
                assert g == 0.0
                continue
            p = " " + t[:512] + " "
            cps = [ord(c) for c in p]
            bk = [(cps[i] * 1315423911 + cps[i + 1] * 2654435761
                   + cps[i + 2] * 97) % 4096
                  for i in range(len(cps) - 2)]
            probs = []
            for m, bias in qm.FIXED_HEAD_PARAMS:
                s = sum((b * m) % 4096 - 2048 for b in bk)
                z = ((s / 256.0 / len(bk) + bias) - qm.FIXED_MU) / qm.FIXED_SD
                probs.append(1.0 / (1.0 + math.exp(-z)))
            assert g == np.round(min(probs), 6)
