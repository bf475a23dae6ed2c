"""KenLM-style word-bigram perplexity (accuracy dimension).

A stupid-backoff (Brants et al. 2007) word-bigram language model with
add-k-smoothed unigrams, trained deterministically at first use from the
same seeded per-language token streams as the langid model and the
synthetic corpus. Scores are float64 log-space; perplexity is rounded to
SCORE_DECIMALS for cross-platform stability.

Reference ancestor: accuracy dimension,
/root/reference/DataQuality_AI_CaseStudy.md:129-132, per SURVEY.md §0.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .. import config as C

_BACKOFF = 0.4
_ADD_K = 0.1
_TRAIN_TOKENS_PER_LANG = 40_000
_TRAIN_SEED_BASE = 2003

_MODEL: tuple[dict, np.ndarray, dict, float] | None = None
# (vocab word->id, unigram counts, bigram dict (id,id)->count, total)


def _build_model():
    from .. import synth

    vocab: dict[str, int] = {}
    uni: list[int] = []
    bi: dict[tuple[int, int], int] = {}
    total = 0
    for li, lang in enumerate(C.LANGS):
        rng = np.random.default_rng(_TRAIN_SEED_BASE + li)
        tokens = synth.gen_tokens(lang, _TRAIN_TOKENS_PER_LANG, rng)
        prev = -1
        for w in tokens:
            wid = vocab.get(w)
            if wid is None:
                wid = len(vocab)
                vocab[w] = wid
                uni.append(0)
            uni[wid] += 1
            total += 1
            if prev >= 0:
                key = (prev, wid)
                bi[key] = bi.get(key, 0) + 1
            prev = wid
        # language streams are independent; reset context between them
    return vocab, np.asarray(uni, dtype=np.float64), bi, float(total)


def get_model():
    global _MODEL
    if _MODEL is None:
        _MODEL = _build_model()
    return _MODEL


def perplexity(texts: pd.Series) -> np.ndarray:
    """Word-bigram stupid-backoff perplexity per document (float64).

    Tokenization follows the engine-wide contract (split on ASCII
    whitespace). Empty/None text → NaN. Values rounded to SCORE_DECIMALS.
    """
    vocab, uni, bi, total = get_model()
    v = len(vocab)
    denom = total + _ADD_K * (v + 1)
    log_uni = np.log((uni + _ADD_K) / denom)
    log_oov = math.log(_ADD_K / denom)
    log_backoff = math.log(_BACKOFF)

    out = np.full(len(texts), np.nan, dtype=np.float64)
    vals = texts.to_numpy(dtype=object)
    for i in range(len(vals)):
        t = vals[i]
        if t is None or not isinstance(t, str):
            continue
        words = t.split()
        if not words:
            continue
        ids = [vocab.get(w, -1) for w in words]
        lp = 0.0
        prev = -2  # no context for the first token
        for wid in ids:
            if wid < 0:
                lp += log_backoff + log_oov
            elif prev >= 0:
                c_bi = bi.get((prev, wid))
                if c_bi is not None:
                    lp += math.log(c_bi / uni[prev])
                else:
                    lp += log_backoff + log_uni[wid]
            else:
                lp += log_uni[wid]
            prev = wid
        out[i] = round(math.exp(-lp / len(ids)), C.SCORE_DECIMALS)
    return out
