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


def batch_trigram_ids(vals: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hashed char-trigram bucket ids for a whole Arrow batch in ONE
    pass — the shared featurizer behind langid AND the quality
    classifier (their bucket spaces are identical by construction).

    Returns ``(flat, nzlens, nz)``: the doc-aligned concatenation of
    every non-empty doc's bucket ids (uint16, < N_BUCKETS), the per-doc
    trigram counts over the non-empty docs (int64; == the padded
    prefix length), and the non-empty mask over the input order.
    Bit-equal to per-doc `_trigram_buckets(t[:MAX_SCORED_CHARS])`.

    The residual Python loop only slices/pads; the codepoint decode
    (one utf-32 encode of the doc-aligned concat) and the trigram hash
    run ONCE over the whole batch. Per-doc padding ' '+t+' '
    concatenates to ' '+'  '.join(t)+' ', so each doc's trigrams sit
    contiguously; the two hash positions straddling each doc boundary
    are masked out.
    """
    n = len(vals)
    parts: list[str] = []
    lens = np.zeros(n, dtype=np.int64)
    for i in range(n):
        t = vals[i]
        if t is None or not isinstance(t, str) or t.strip() == "":
            continue                       # no words → no features
        s = t[:MAX_SCORED_CHARS]
        parts.append(s)
        lens[i] = len(s)                   # == trigram count when padded
    nz = lens > 0
    if not nz.any():
        return np.empty(0, dtype=np.uint16), lens[nz], nz
    big = " " + "  ".join(parts) + " "
    cps = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
    # Bucket ids in uint32 wraparound arithmetic: 2^32 ≡ 0 (mod 4096),
    # so (Σ cᵢ·kᵢ mod 2^32) & _MASK equals the uint64 hash's bucket —
    # half the memory traffic, and chunking keeps every temp L2/L3
    # resident instead of streaming ~200 MB through DRAM per pass
    # (the whole-array form measured ~3× slower on the shared bus).
    # Buckets are < 4096 → uint16 flat ids (np.take accepts any int).
    tot3 = len(cps) - 2
    h_all = np.empty(tot3, dtype=np.uint16)
    a32, b32, c32 = (np.uint32(1315423911), np.uint32(2654435761),
                     np.uint32(97))
    m32 = np.uint32(_MASK)
    step = 1 << 18
    i = 0
    while i < tot3:
        j = min(i + step, tot3)
        seg = cps[i:j + 2]
        t1 = seg[:-2] * a32
        t1 += seg[1:-1] * b32
        t1 += seg[2:] * c32
        t1 &= m32
        h_all[i:j] = t1
        i = j
    plens = lens[nz] + 2                   # padded per-doc lengths
    ends = np.cumsum(plens)
    valid = np.ones(len(h_all), dtype=bool)
    if len(ends) > 1:
        valid[ends[:-1] - 2] = False       # trigrams straddling a
        valid[ends[:-1] - 1] = False       # doc boundary
    return h_all[valid], lens[nz], nz


def doc_aligned_sums(wt: np.ndarray, flat: np.ndarray,
                     nzlens: np.ndarray) -> np.ndarray:
    """Per-document row sums of `wt[flat]` (flat doc-aligned with
    per-doc counts `nzlens`), without materializing the full gather.

    Chunked gather through a PREALLOCATED buffer: one big wt[flat]
    would allocate tens of MB of fresh pages per batch, which is
    100×+ slower under concurrent forked workers (page-fault storms).
    Groups are doc-aligned so reduceat never straddles a chunk —
    bit-equal to `np.add.reduceat(wt[flat], starts, axis=0)`.
    """
    L = wt.shape[1]
    n_nz = len(nzlens)
    tri_ends = np.cumsum(nzlens)           # doc ends within `flat`
    # chunk sized to stay L2-resident (~330 KB gather buffer): aggregate
    # DRAM bandwidth is the scaling ceiling with 32 concurrent workers,
    # so score buffers must live in per-core cache
    cap = max(8_192, int(nzlens.max()) if n_nz else 0)
    g_buf = np.empty((cap, L), dtype=np.float64)
    sums = np.empty((n_nz, L), dtype=np.float64)
    di = 0
    while di < n_nz:
        dj, m = di, 0
        while dj < n_nz and m + nzlens[dj] <= cap:
            m += int(nzlens[dj])
            dj += 1
        g0 = int(tri_ends[di] - nzlens[di])   # flat is already doc-
        np.take(wt, flat[g0:g0 + m], axis=0,  # aligned: gather the view
                out=g_buf[:m])
        starts = np.zeros(dj - di, dtype=np.int64)
        np.cumsum(nzlens[di:dj][:-1], out=starts[1:])
        sums[di:dj] = np.add.reduceat(g_buf[:m], starts, axis=0)
        di = dj
    return sums


def score_texts(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Return (lang_pred: object array, lang_score: float64 array).

    lang_score is the per-trigram mean log-prob margin between the best
    and second-best language, rounded to SCORE_DECIMALS. Empty/None text
    scores ('und', 0.0).

    Vectorized across the Arrow batch: all documents' trigram ids are
    concatenated (batch_trigram_ids), scored with contiguous row-gathers
    from the bucket-major model, and reduced per-document with
    np.add.reduceat (doc_aligned_sums) — per-row work is just the
    codepoint hashing.
    """
    wt = get_model()                       # (N_BUCKETS, n_langs)
    n = len(texts)
    preds = np.full(n, "und", dtype=object)
    scores = np.zeros(n, dtype=np.float64)
    flat, nzlens, nz = batch_trigram_ids(texts.to_numpy(dtype=object))
    if not nz.any():
        return preds, scores
    sums = doc_aligned_sums(wt, flat, nzlens)
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
