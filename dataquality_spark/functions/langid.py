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

# 4096 buckets keeps the bucket-major model at 160 KB — L2-resident per
# worker, so the per-trigram row gather never touches DRAM even with 32
# workers scoring concurrently (65536 buckets measured 25× slower under
# full-pipeline concurrency from memory-bandwidth saturation).
N_BUCKETS = 1 << 12
_MASK = N_BUCKETS - 1
# fastText-style prefix sampling: 512 chars ≈ 500 trigrams is plenty of
# evidence for a 5-language model and caps per-doc scoring cost.
MAX_SCORED_CHARS = 512
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
    """(N_BUCKETS, n_langs) log-prob matrix, C-contiguous.

    Bucket-major layout on purpose: scoring gathers one 40-byte
    contiguous row per trigram (a single cache line) instead of
    n_langs scattered loads across a 2.6 MB table — the difference
    between cache-resident and DRAM-bandwidth-bound when 32 workers
    score concurrently."""
    from .. import synth

    w = np.zeros((len(C.LANGS), N_BUCKETS), dtype=np.float64)
    for li, lang in enumerate(C.LANGS):
        rng = np.random.default_rng(_TRAIN_SEED_BASE + li)
        tokens = synth.gen_tokens(lang, _TRAIN_TOKENS_PER_LANG, rng)
        ids = _trigram_buckets(" ".join(tokens))
        counts = np.bincount(ids, minlength=N_BUCKETS).astype(np.float64)
        total = counts.sum()
        w[li] = np.log((counts + 0.5) / (total + 0.5 * N_BUCKETS))
    return np.ascontiguousarray(w.T)


def _cache_path() -> str:
    """Cache filename derived from a hash of every training parameter, in
    a per-user directory: a stale or tampered shared cache can never be
    silently loaded after N_BUCKETS/seeds/vocab change, and users don't
    share a world-writable path."""
    import hashlib
    import os
    import tempfile

    key = repr((N_BUCKETS, MAX_SCORED_CHARS, _TRAIN_TOKENS_PER_LANG,
                _TRAIN_SEED_BASE, tuple(C.LANGS),
                tuple(tuple(C.CONTENT_WORDS[l]) for l in C.LANGS),
                tuple(tuple(C.STOPWORDS[l]) for l in C.LANGS)))
    h = hashlib.sha256(key.encode()).hexdigest()[:16]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(tempfile.gettempdir(),
                        f"dq_model_cache_{uid}", f"langid_{h}.npy")


_CACHE = _cache_path()


def get_model() -> np.ndarray:
    """Module-cached model with a shared on-disk cache: the first worker
    on a host builds and atomically publishes the weights; every other
    worker mmap-loads in ~ms instead of re-deriving them. (On a real
    cluster the .npy ships via --files/--archives instead.)"""
    global _MODEL
    if _MODEL is None:
        import os
        import tempfile
        try:
            _MODEL = np.load(_CACHE)
        except (OSError, ValueError):
            _MODEL = _build_model()
            try:
                os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
                fd, tmp = tempfile.mkstemp(dir=os.path.dirname(_CACHE),
                                           suffix=".npy")
                with os.fdopen(fd, "wb") as f:
                    np.save(f, _MODEL)
                os.replace(tmp, _CACHE)  # atomic publish
            except OSError:
                pass  # cache is best-effort
    return _MODEL


def score_texts(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Return (lang_pred: object array, lang_score: float64 array).

    lang_score is the per-trigram mean log-prob margin between the best
    and second-best language, rounded to SCORE_DECIMALS. Empty/None text
    scores ('und', 0.0).

    Vectorized across the Arrow batch: all documents' trigram ids are
    concatenated, scored with ONE contiguous row-gather from the
    bucket-major model, and reduced per-document with np.add.reduceat —
    per-row work is just the codepoint hashing.
    """
    wt = get_model()                       # (N_BUCKETS, n_langs)
    n = len(texts)
    preds = np.full(n, "und", dtype=object)
    scores = np.zeros(n, dtype=np.float64)
    vals = texts.to_numpy(dtype=object)
    ids_list = []
    lens = np.zeros(n, dtype=np.int64)
    for i in range(n):
        t = vals[i]
        if t is None or not isinstance(t, str) or t.strip() == "":
            continue                       # no words → no prediction
        ids = _trigram_buckets(t[:MAX_SCORED_CHARS])
        if ids.size:
            lens[i] = ids.size
            ids_list.append(ids)
    nz = lens > 0
    if not nz.any():
        return preds, scores
    # Chunked gather through a PREALLOCATED buffer: one big wt[flat]
    # would allocate tens of MB of fresh pages per batch, which is
    # 100×+ slower under concurrent forked workers (page-fault storms).
    # Groups are doc-aligned so reduceat never straddles a chunk.
    L = wt.shape[1]
    nzlens = lens[nz]
    n_nz = len(nzlens)
    # chunk sized to stay L2-resident (~330 KB gather buffer): aggregate
    # DRAM bandwidth is the scaling ceiling with 32 concurrent workers,
    # so score buffers must live in per-core cache
    cap = max(8_192, int(nzlens.max()))
    flat_buf = np.empty(cap, dtype=np.int64)
    g_buf = np.empty((cap, L), dtype=np.float64)
    sums = np.empty((n_nz, L), dtype=np.float64)
    di = 0
    while di < n_nz:
        dj, m = di, 0
        while dj < n_nz and m + nzlens[dj] <= cap:
            m += int(nzlens[dj])
            dj += 1
        off = 0
        for k in range(di, dj):
            ln = int(nzlens[k])
            flat_buf[off:off + ln] = ids_list[k]
            off += ln
        np.take(wt, flat_buf[:m], axis=0, out=g_buf[:m])
        starts = np.zeros(dj - di, dtype=np.int64)
        np.cumsum(nzlens[di:dj][:-1], out=starts[1:])
        sums[di:dj] = np.add.reduceat(g_buf[:m], starts, axis=0)
        di = dj
    means = sums / nzlens[:, None]
    order = np.argsort(means, axis=1, kind="stable")
    best, second = order[:, -1], order[:, -2]
    rows = np.arange(len(means))
    margin = np.round(means[rows, best] - means[rows, second],
                      C.SCORE_DECIMALS)
    langs = np.asarray(C.LANGS, dtype=object)
    preds[nz] = langs[best]
    scores[nz] = margin
    return preds, scores
