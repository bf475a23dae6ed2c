"""Deterministic synthetic `pages` corpus (FIXTURES.md §1).

Generates the exact input shape from BASELINE.json `input_hint`:
``(url string, warc_ts timestamp, html binary, text string, lang string)``
with planted phenomena per category so every drop rule has positives:

* ``clean``        — per-language docs from seeded vocabularies (keep)
* ``pii``          — clean docs with injected emails/phones/IPs/blocklist
                     words (keep; scrub must rewrite byte-identically)
* ``short``        — below the Gopher word-count floor
* ``gibberish``    — random letter strings (high perplexity)
* ``symbol``       — symbol-heavy docs (symbol-to-word ratio)
* ``repeated``     — one line repeated (duplicate-line fraction)
* ``stopword_poor``— content words only (stopword density)
* ``long_words``   — mean word length above the Gopher ceiling
* ``mismatch``     — clean text of language X declared as language Y
* ``stale``        — clean text with `warc_ts` before the recency cutoff
* ``dup``          — exact duplicate of an earlier url (later warc_ts)

All randomness flows from one ``numpy.random.Generator`` seeded by the
caller (default 42); no wall clock anywhere. The same token-sampling
process (``gen_tokens``) feeds the language-ID and perplexity model
training streams, so "clean" text is in-distribution for both models.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import config as C

HOSTS = [f"host{i:02d}.example.org" for i in range(20)]
# Planted skew: host00 ~30%, host01 ~15%, rest uniform (FIXTURES.md §1).
_HOST_P = np.array([0.30, 0.15] + [0.55 / 18] * 18)

# Fixed epoch bounds (microseconds precision not needed; second granularity).
TS_LO_FRESH = np.datetime64("2024-07-01T00:00:00")
TS_HI_FRESH = np.datetime64("2025-07-01T00:00:00")
TS_LO_STALE = np.datetime64("2023-07-01T00:00:00")

CATEGORY_MIX = [
    ("clean", 0.46), ("pii", 0.08), ("short", 0.06), ("gibberish", 0.07),
    ("symbol", 0.05), ("repeated", 0.05), ("stopword_poor", 0.05),
    ("long_words", 0.04), ("mismatch", 0.06), ("stale", 0.05), ("dup", 0.03),
]

_GIBBERISH_ALPHABET = list("abcdefghijklmnopqrstuvwxyz")


def _zipf_p(n: int) -> np.ndarray:
    p = 1.0 / (np.arange(n) + 2.0)
    return p / p.sum()


def gen_tokens(lang: str, n: int, rng: np.random.Generator,
               stopword_rate: float = 0.4) -> list[str]:
    """Sample a token stream: stopwords at `stopword_rate`, Zipf content.

    Vectorized; draws random(n) → integers(n) → choice(n) in that fixed
    order so outputs are identical to the original per-token loop."""
    stop = np.asarray(C.STOPWORDS[lang], dtype=object)
    content = np.asarray(C.CONTENT_WORDS[lang], dtype=object)
    is_stop = rng.random(n) < stopword_rate
    stop_idx = rng.integers(0, len(stop), n)
    cont_idx = rng.choice(len(content), n, p=_zipf_p(len(content)))
    return np.where(is_stop, stop[stop_idx], content[cont_idx]).tolist()


def _to_lines(words: list[str], rng: np.random.Generator) -> str:
    """Chunk words into lines of 8–14 words joined by newlines."""
    lines, i = [], 0
    while i < len(words):
        k = int(rng.integers(8, 15))
        lines.append(" ".join(words[i:i + k]))
        i += k
    return "\n".join(lines)


def _clean_text(lang: str, rng: np.random.Generator,
                lo: int = 60, hi: int = 240) -> str:
    n = int(rng.integers(lo, hi + 1))
    return _to_lines(gen_tokens(lang, n, rng), rng)


def _gibberish_word(rng: np.random.Generator) -> str:
    k = int(rng.integers(4, 10))
    idx = rng.integers(0, 26, k)
    return "".join(_GIBBERISH_ALPHABET[j] for j in idx)


def _make_text(cat: str, lang: str, rng: np.random.Generator) -> str:
    if cat in ("clean", "mismatch", "stale", "dup"):
        return _clean_text(lang, rng)
    if cat == "pii":
        base = _clean_text(lang, rng)
        bits = []
        if rng.random() < 0.8:
            bits.append(f"contact user{int(rng.integers(0, 9999))}"
                        f"@mail{int(rng.integers(0, 99))}.example.com now")
        if rng.random() < 0.6:
            bits.append(f"call +1-{int(rng.integers(200, 999))}-"
                        f"{int(rng.integers(100, 999))}-"
                        f"{int(rng.integers(1000, 9999))} today")
        if rng.random() < 0.6:
            bits.append(f"server {int(rng.integers(1, 255))}."
                        f"{int(rng.integers(0, 255))}."
                        f"{int(rng.integers(0, 255))}."
                        f"{int(rng.integers(1, 255))} logged")
        if rng.random() < 0.5 or not bits:
            w = C.BLOCKLIST_WORDS[int(rng.integers(0, len(C.BLOCKLIST_WORDS)))]
            bits.append(f"they said {w} loudly")
        return base + "\n" + " ".join(bits)
    if cat == "short":
        n = int(rng.integers(3, C.MIN_WORDS - 5))
        return " ".join(gen_tokens(lang, n, rng))
    if cat == "gibberish":
        # Stopwords interleaved so ONLY the perplexity rule fires.
        n = int(rng.integers(80, 200))
        stop = C.STOPWORDS[lang]
        words = [stop[int(rng.integers(0, len(stop)))]
                 if rng.random() < 0.4 else _gibberish_word(rng)
                 for _ in range(n)]
        return _to_lines(words, rng)
    if cat == "symbol":
        words = gen_tokens(lang, int(rng.integers(60, 160)), rng)
        n_sym = max(1, int(0.25 * len(words)))
        sym = C.SYMBOL_CHARS
        for _ in range(n_sym):
            pos = int(rng.integers(0, len(words)))
            words[pos] = words[pos] + sym[int(rng.integers(0, len(sym)))] * 2
        return _to_lines(words, rng)
    if cat == "repeated":
        base = gen_tokens(lang, 30, rng)
        line = " ".join(base[:10])
        others = [" ".join(gen_tokens(lang, 10, rng)) for _ in range(4)]
        reps = int(rng.integers(6, 12))
        return "\n".join(others + [line] * reps)
    if cat == "stopword_poor":
        content = C.CONTENT_WORDS[lang]
        n = int(rng.integers(60, 160))
        idx = rng.choice(len(content), n, p=_zipf_p(len(content)))
        return _to_lines([content[i] for i in idx], rng)
    if cat == "long_words":
        n = int(rng.integers(60, 120))
        words = ["".join(_GIBBERISH_ALPHABET[j]
                         for j in rng.integers(0, 26, int(rng.integers(12, 19))))
                 for _ in range(n)]
        # keep stopword rule satisfied
        stop = C.STOPWORDS[lang]
        for _ in range(max(3, n // 10)):
            words[int(rng.integers(0, n))] = stop[int(rng.integers(0, len(stop)))]
        return _to_lines(words, rng)
    raise ValueError(cat)


def gen_pages(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Build the synthetic corpus.

    Returns columns ``url, warc_ts, html, text, lang`` plus a ``_category``
    label column (test-only; the pipeline must never read it).
    """
    rng = np.random.default_rng(seed)
    cats, probs = zip(*CATEGORY_MIX)
    cat_idx = rng.choice(len(cats), n_rows, p=np.array(probs))
    lang_idx = rng.choice(len(C.LANGS), n_rows,
                          p=np.array([0.4, 0.15, 0.15, 0.15, 0.15]))
    host_idx = rng.choice(len(HOSTS), n_rows, p=_HOST_P)

    fresh_span = (TS_HI_FRESH - TS_LO_FRESH).astype("timedelta64[s]").astype(int)
    stale_span = (TS_LO_FRESH - TS_LO_STALE).astype("timedelta64[s]").astype(int)
    offs = rng.integers(0, fresh_span, n_rows)
    stale_offs = rng.integers(0, stale_span, n_rows)

    rows = []
    for i in range(n_rows):
        cat = cats[cat_idx[i]]
        lang = C.LANGS[lang_idx[i]]
        if cat == "dup" and rows:
            src = rows[int(rng.integers(0, len(rows)))]
            # exact duplicate page fetched again later
            ts = src[1] + np.timedelta64(int(rng.integers(3600, 86400 * 30)), "s")
            rows.append((src[0], min(ts, TS_HI_FRESH - np.timedelta64(1, "s")),
                         src[2], src[3], src[4], "dup"))
            continue
        text = _make_text(cat, lang, rng)
        declared = lang
        if cat == "mismatch":
            declared = C.LANGS[(C.LANGS.index(lang) +
                                1 + int(rng.integers(0, len(C.LANGS) - 1)))
                               % len(C.LANGS)]
        ts = (TS_LO_STALE + np.timedelta64(int(stale_offs[i]), "s")
              if cat == "stale"
              else TS_LO_FRESH + np.timedelta64(int(offs[i]), "s"))
        url = f"https://{HOSTS[host_idx[i]]}/{lang}/doc-{i:07d}"
        html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"
        rows.append((url, ts, html, text, declared, cat))

    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                     "lang", "_category"])
    # Microsecond resolution: parquet has no TIMESTAMP(seconds) logical type,
    # so datetime64[s] would be written as bare INT64 and break Spark reads.
    df["warc_ts"] = pd.to_datetime(df["warc_ts"]).astype("datetime64[us]")
    return df


def write_pages(out_dir: str, n_rows: int, seed: int = 42) -> str:
    """Write `pages.parquet` (input shape only) + `pages_labels.parquet`."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    df = gen_pages(n_rows, seed)
    pages_path = os.path.join(out_dir, "pages.parquet")
    df[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
        pages_path, index=False)
    df[["url", "_category"]].rename(columns={"_category": "category"}) \
        .to_parquet(os.path.join(out_dir, "pages_labels.parquet"), index=False)
    return pages_path
