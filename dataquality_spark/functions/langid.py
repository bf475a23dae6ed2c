"""fastText-style language identification (consistency dimension).

A hashed character-trigram linear model, trained deterministically at
first use from the same seeded token streams the synthetic corpus samples
from (dataquality_spark.synth.gen_tokens). Scoring is pure numpy over
Arrow batches — codepoint arrays, vectorized polynomial trigram hashing,
one (n_langs × n_buckets) log-probability matrix — so the Spark side is a
thin pandas UDF around `score_texts`.

Reference ancestor: the declared-vs-detected language consistency check is
the graft of /root/reference/DataQuality_AI_CaseStudy.md:134-137
(consistency dimension) per SURVEY.md §0.

Determinism notes: trigram hashing uses fixed multiplicative constants on
Unicode codepoints (never Python's salted `hash`); model weights are
float64 built from fixed seeds; executors rebuild the identical model
lazily (module-level cache) instead of shipping it in task closures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import config as C

N_BUCKETS = 1 << 16
_MASK = N_BUCKETS - 1
_TRAIN_TOKENS_PER_LANG = 40_000
_TRAIN_SEED_BASE = 1009

_MODEL: np.ndarray | None = None  # (n_langs, N_BUCKETS) float64 log-probs


def _trigram_buckets(text: str) -> np.ndarray:
    """Vectorized hashed char-trigram ids for one document."""
    cps = np.frombuffer((" " + text + " ").encode("utf-32-le"),
                        dtype=np.uint32).astype(np.uint64)
    if cps.size < 3:
        return np.empty(0, dtype=np.int64)
    h = (cps[:-2] * np.uint64(1315423911)
         + cps[1:-1] * np.uint64(2654435761)
         + cps[2:] * np.uint64(97))
    return (h & np.uint64(_MASK)).astype(np.int64)


def _build_model() -> np.ndarray:
    from .. import synth

    w = np.zeros((len(C.LANGS), N_BUCKETS), dtype=np.float64)
    for li, lang in enumerate(C.LANGS):
        rng = np.random.default_rng(_TRAIN_SEED_BASE + li)
        tokens = synth.gen_tokens(lang, _TRAIN_TOKENS_PER_LANG, rng)
        ids = _trigram_buckets(" ".join(tokens))
        counts = np.bincount(ids, minlength=N_BUCKETS).astype(np.float64)
        total = counts.sum()
        w[li] = np.log((counts + 0.5) / (total + 0.5 * N_BUCKETS))
    return w


def get_model() -> np.ndarray:
    global _MODEL
    if _MODEL is None:
        _MODEL = _build_model()
    return _MODEL


def score_texts(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Return (lang_pred: object array, lang_score: float64 array).

    lang_score is the per-trigram mean log-prob margin between the best
    and second-best language, rounded to SCORE_DECIMALS. Empty/None text
    scores ('und', 0.0).
    """
    w = get_model()
    n = len(texts)
    preds = np.empty(n, dtype=object)
    scores = np.zeros(n, dtype=np.float64)
    vals = texts.to_numpy(dtype=object)
    for i in range(n):
        t = vals[i]
        if t is None or not isinstance(t, str) or t.strip() == "":
            preds[i] = "und"  # no words → no prediction
            continue
        ids = _trigram_buckets(t)
        if ids.size == 0:
            preds[i] = "und"
            continue
        lang_scores = w[:, ids].sum(axis=1) / ids.size
        order = np.argsort(lang_scores)
        best, second = order[-1], order[-2]
        preds[i] = C.LANGS[best]
        scores[i] = round(float(lang_scores[best] - lang_scores[second]),
                          C.SCORE_DECIMALS)
    return preds, scores
