"""Model-based quality classifier (DCLM/fastText-style, multi-head).

Modern web-corpus pipelines pair the hard Gopher/C4 heuristics with a
LEARNED quality score — a cheap linear classifier over hashed n-gram
features (DCLM's fastText filter, FineWeb-Edu's distilled classifier).
This module is that component, built deterministically in-sandbox by
DISTILLING the engine's own keep/drop oracle: one logistic head per
text-defect class (gibberish/high-perplexity, symbol salad, low
stopword density, abnormal word length), each trained clean-vs-defect
on a seeded synthetic corpus (train seed ≠ any test/bench seed). The
document's quality probability is the MINIMUM over heads — a clean doc
must look clean to every head; a defective doc is condemned by its own
head. A single hyperplane cannot oppose four defect directions at once
(measured: joint binary AUC 0.76 vs ≥0.92 per head), which is why the
model is multi-head.

Deliberately NOT covered by the classifier: structural rules the bag of
trigrams cannot see (repetition, length, staleness, URL dups) — those
stay hard heuristics in the pipeline; measured AUC for repeated-lines
with these features is chance (0.46), so claiming it would be noise.

Reference ancestor: the accuracy dimension's model-scored plausibility
check (/root/reference/DataQuality_AI_CaseStudy.md:129-132) per
SURVEY.md §0; the scaling architecture (bucket-hashed features,
cache-resident weights, doc-aligned reduceat over one Arrow batch
gather) is shared with functions/langid.py. The (4096 × 4) float64
weight matrix is 128 KB — per-core cache resident at any worker
concurrency; no external data, zero-init weights, fixed epochs — every
build is bit-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import config as C
from .langid import (MAX_SCORED_CHARS, _trigram_buckets,
                     batch_trigram_ids, doc_aligned_sums)

N_BUCKETS = 1 << 12            # shares langid's bucket-space size
HEADS = ("high_perplexity", "symbol_ratio", "stopword_density",
         "mean_word_len")
_TRAIN_N_DOCS = 8_000
_TRAIN_SEED = 977              # never used by tests/bench corpora
_EPOCHS = 200
_LR = 10.0
_L2 = 1e-5

_MODEL: tuple[np.ndarray, np.ndarray] | None = None


def _doc_ids(text) -> np.ndarray:
    """Per-doc reference featurizer — the semantic contract that
    `batch_trigram_ids` must match bit-for-bit (pinned by
    test_featurize_batch_equals_per_doc); scoring uses the batched
    path only."""
    if text is None or not isinstance(text, str) or text.strip() == "":
        return np.empty(0, dtype=np.int64)
    return _trigram_buckets(text[:MAX_SCORED_CHARS])


def _featurize(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                               np.ndarray]:
    """Concatenated trigram ids of the NON-EMPTY docs, their doc-aligned
    reduceat starts and lengths, plus the non-empty mask over the input
    order. One batched hash pass (shared with langid) — the former
    per-doc loop was the classifier's dominant CPU sink. Empty docs are
    excluded up front so reduceat start indices are always < len(flat).
    """
    flat, nzlens, nz = batch_trigram_ids(np.asarray(texts, dtype=object))
    starts = np.zeros(len(nzlens), dtype=np.int64)
    if len(nzlens) > 1:
        np.cumsum(nzlens[:-1], out=starts[1:])
    return flat, starts, nzlens.astype(np.float64), nz


def _train_head(flat, starts, lens, y) -> tuple[np.ndarray, float]:
    """Full-batch logistic GD on mean hashed-trigram features (docs with
    zero features must already be excluded)."""
    inv = 1.0 / lens
    w = np.zeros(N_BUCKETS, dtype=np.float64)
    b = 0.0
    n = float(len(y))
    counts = lens.astype(np.int64)
    for _ in range(_EPOCHS):
        z = np.add.reduceat(w[flat], starts) * inv + b
        p = 1.0 / (1.0 + np.exp(-z))
        err = (p - y) / n
        gw = np.zeros(N_BUCKETS, dtype=np.float64)
        np.add.at(gw, flat, np.repeat(err * inv, counts))
        w -= _LR * (gw + _L2 * w)
        b -= _LR * float(err.sum())
    return w, b


def _build_model() -> tuple[np.ndarray, np.ndarray]:
    """(W: (N_BUCKETS, n_heads) bucket-major float64,
        cal: (3, n_heads) = [bias, clean-logit mean, clean-logit std]).

    Head k trains on clean-vs-defect_k only (clean = zero rule hits of
    ANY kind), so each hyperplane opposes exactly one defect direction.
    """
    from .. import oracle, synth

    pages = synth.gen_pages(_TRAIN_N_DOCS, seed=_TRAIN_SEED)
    inp = pages[["url", "warc_ts", "html", "text", "lang"]]
    hits = oracle.run_oracle(inp)["rule_hits"]
    clean = np.array([len(h) == 0 for h in hits])
    texts = inp["text"].to_numpy(dtype=object)

    W = np.zeros((len(HEADS), N_BUCKETS), dtype=np.float64)
    bs = np.zeros(len(HEADS), dtype=np.float64)
    mu = np.zeros(len(HEADS), dtype=np.float64)
    sd = np.ones(len(HEADS), dtype=np.float64)
    cflat, cstarts, clens, cnz = _featurize(texts[clean])
    for k, rule in enumerate(HEADS):
        neg = np.array([rule in h for h in hits])
        mask = clean | neg
        flat, starts, lens, nz = _featurize(texts[mask])
        W[k], bs[k] = _train_head(
            flat, starts, lens,
            clean[mask][nz].astype(np.float64))
        # Per-head calibration: raw logits live on head-specific scales
        # (sigmoid saturation over mean features), so min() across
        # heads would compare incomparables — standardize each head's
        # logit by its clean-doc training distribution instead
        # (measured: uncalibrated min-AUC 0.73, calibrated below).
        zc = np.add.reduceat(W[k][cflat], cstarts) / clens + bs[k]
        mu[k] = float(zc.mean())
        sd[k] = float(max(zc.std(), 1e-9))
    return np.ascontiguousarray(W.T), np.stack([bs, mu, sd])


def _cache_path() -> str:
    import hashlib
    import os
    import tempfile

    key = repr(("v2-calibrated", N_BUCKETS, MAX_SCORED_CHARS, HEADS,
                _TRAIN_N_DOCS, _TRAIN_SEED, _EPOCHS, _LR, _L2,
                tuple(C.LANGS)))
    h = hashlib.sha256(key.encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(),
                        f"dq_model_cache_{uid}", f"qmodel_{h}.npz")


_CACHE = _cache_path()


def _try_load():
    # np.load on a corrupt .npz raises zipfile.BadZipFile (not an
    # OSError subclass) — it must fall through to a rebuild, never
    # crash every task until someone deletes the temp file
    import zipfile
    try:
        z = np.load(_CACHE)
        return (z["w"], z["b"])
    except (OSError, ValueError, KeyError, EOFError,
            zipfile.BadZipFile):
        return None


def get_model() -> tuple[np.ndarray, np.ndarray]:
    """Module-cached weights with the shared atomic on-disk cache
    (same lifecycle and integrity keying as langid.get_model).

    Unlike the langid/LM models (sub-second builds), this build costs
    ~10 s (8k-doc oracle pass + 4 × 200 GD epochs), so a cold cache is
    guarded by a per-path advisory flock: the first worker on a host
    builds while the rest block briefly and then load the published
    file — no thundering herd of N identical trainings."""
    global _MODEL
    if _MODEL is None:
        import os
        import tempfile
        _MODEL = _try_load()
        if _MODEL is None:
            os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
            lock_path = _CACHE + ".lock"
            lf = None
            try:
                lf = open(lock_path, "w")
                import fcntl
                fcntl.flock(lf, fcntl.LOCK_EX)
                _MODEL = _try_load()    # another holder may have built
            except (OSError, ImportError):
                pass    # lockless fallback (no flock / no fcntl module,
                        # e.g. Windows workers): just build
            if _MODEL is None:
                _MODEL = _build_model()
                try:
                    fd, tmp = tempfile.mkstemp(
                        dir=os.path.dirname(_CACHE), suffix=".npz")
                    with os.fdopen(fd, "wb") as f:
                        np.savez(f, w=_MODEL[0], b=_MODEL[1])
                    os.replace(tmp, _CACHE)
                except OSError:
                    pass
            if lf is not None:
                lf.close()              # releases the flock
    return _MODEL


# SQL-checkable twin weights: (multiplier, bias) per head. The trained
# model's scoring path (trigram hashing → bucket-major gather →
# doc-aligned reduceat mean → per-head calibration → sigmoid → min →
# round) is not SQL-expressible because the WEIGHTS come from training;
# the twin swaps ONLY the weights for a fixed integer lattice
# W[b,k] = ((b·m_k) mod 4096 − 2048) / 256 that DuckDB re-derives from
# the bucket id, so every arithmetic step gets a hard value oracle
# (same pattern as simhash_neardup_md5 / fingerprint_roll_md5).
# /256 keeps reduceat sums on an exact float64 lattice (≤20 bits), so
# the mean is ONE division of identical operands on both engines.
FIXED_HEAD_PARAMS = ((389, -0.5), (2311, -0.25), (1657, 0.0),
                     (3529, 0.25))
FIXED_MU = 0.1
FIXED_SD = 0.8


def fixed_model() -> tuple[np.ndarray, np.ndarray]:
    """The deterministic SQL-derivable model for the contract twin."""
    b = np.arange(N_BUCKETS, dtype=np.int64)
    W = np.stack([((b * m) % N_BUCKETS - N_BUCKETS // 2) / 256.0
                  for m, _ in FIXED_HEAD_PARAMS], axis=1)
    bs = np.array([bias for _, bias in FIXED_HEAD_PARAMS])
    k = len(FIXED_HEAD_PARAMS)
    return (np.ascontiguousarray(W),
            np.stack([bs, np.full(k, FIXED_MU), np.full(k, FIXED_SD)]))


def score_texts(texts: pd.Series,
                model: tuple[np.ndarray, np.ndarray] | None = None
                ) -> np.ndarray:
    """Quality score per document in [0,1]: min over heads of
    sigmoid of the CALIBRATED logit (standardized by the head's
    clean-doc training distribution), rounded to SCORE_DECIMALS. A
    ranking score, not a calibrated probability — threshold it on a
    labeled sample. Empty/None text scores 0.0.

    Vectorized across the Arrow batch: one (len, n_heads) gather from
    the bucket-major 128 KB matrix + doc-aligned reduceat.

    `model` overrides the trained weights (the contract twin passes
    `fixed_model()`); default is the trained/cached model."""
    W, cal = model if model is not None else get_model()
    bs, mu, sd = cal
    out = np.zeros(len(texts), dtype=np.float64)
    flat, nzlens, nz = batch_trigram_ids(texts.to_numpy(dtype=object))
    if not nz.any():
        return out
    lens = nzlens.astype(np.float64)
    # chunked preallocated gather (shared with langid) — a full W[flat]
    # materialization is ~64 MB of fresh pages per 4k-doc batch
    sums = doc_aligned_sums(W, flat, nzlens)         # (n_nz, K)
    z = (sums / lens[:, None] + bs[None, :] - mu[None, :]) / sd[None, :]
    probs = 1.0 / (1.0 + np.exp(-z))
    out[nz] = np.round(probs.min(axis=1), C.SCORE_DECIMALS)
    return out


def quality_scores(df, text_col: str = "text",
                   out_col: str = "quality_model_score",
                   use_fixed_model: bool = False):
    """DataFrame transform: adds the classifier probability as one
    Arrow-batched pandas UDF column (the thin Spark shim).
    `use_fixed_model=True` scores with the SQL-derivable twin weights
    (contract query); production uses the trained model."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _udf(texts: pd.Series) -> pd.Series:
        m = fixed_model() if use_fixed_model else None
        return pd.Series(score_texts(texts, model=m))

    return df.withColumn(out_col, _udf(F.col(text_col)))
