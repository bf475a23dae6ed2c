"""Compiled-regex PII/toxicity scrub (safety-layer graft).

Semantic ancestor: the reference's SQL-safety regex layer
(/root/reference/agents/unity_sql_agent.py:127-159) — a fixed, ordered
bank of forbidden-pattern regexes — re-targeted from SQL strings to
document text per SURVEY.md §0/§7-S5.

Byte-identity contract: patterns are compiled once at module import, in
the exact order of config.SCRUB_PATTERNS, and applied sequentially with
Python `re` on BOTH the oracle side and the Spark pandas-UDF side, so the
scrubbed text is byte-identical per url by construction. No Unicode
normalization is performed anywhere.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .. import config as C

COMPILED: list[tuple[str, re.Pattern, str]] = [
    (rule_id, re.compile(pat), repl) for rule_id, pat, repl in C.SCRUB_PATTERNS
]

# Conservative pre-screens: a pattern cannot match unless the doc contains
# these characters, so skipping the regex scan is byte-identical (shared
# by oracle and pipeline). Most clean docs contain none of them, which
# turns four full regex scans per doc into four C-level substring checks.
_DIGITS = re.compile("[0-9]")
_SCREENS = {
    "email": lambda t: "@" in t,
    "phone": lambda t: _DIGITS.search(t) is not None,
    "ipv4": lambda t: _DIGITS.search(t) is not None,
    "toxicity": lambda t: "badword" in t,
}


def scrub_one(text: str | None) -> tuple[str | None, dict[str, int]]:
    """Scrub a single document; returns (scrubbed, per-rule hit counts)."""
    if text is None:
        return None, {}
    hits: dict[str, int] = {}
    for rule_id, pat, repl in COMPILED:
        screen = _SCREENS.get(rule_id)
        if screen is not None and not screen(text):
            continue
        text, n = pat.subn(repl, text)
        if n:
            hits[rule_id] = n
    return text, hits


# Batch-level prescreen: ONE Arrow C++ scan per screen over the whole
# batch instead of 2-4 Python screen calls per document. A document not
# matched by any screen cannot be changed by any pattern (the same
# conservative implications _SCREENS encodes), so skipping it outright
# is byte-identical. Falls back to the per-doc path if SCRUB_PATTERNS
# ever gains a rule without a screen.
_ALL_SCREENED = all(rule_id in _SCREENS for rule_id, _, _ in COMPILED)


def _candidates(vals: np.ndarray):
    """Bool mask of docs that SOME pattern could touch, or None when the
    vectorized prescreen doesn't apply (unscreened rule / non-string)."""
    if not _ALL_SCREENED or len(vals) == 0:
        return None
    try:
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pc.fill_null(pa.array(vals, type=pa.string(),
                                    from_pandas=True), "")
    except Exception:       # exotic objects in the batch: per-doc path
        return None
    mask = pc.match_substring(arr, "@").to_numpy(zero_copy_only=False)
    mask |= pc.match_substring_regex(arr, "[0-9]").to_numpy(
        zero_copy_only=False)
    mask |= pc.match_substring(arr, "badword").to_numpy(
        zero_copy_only=False)
    return mask


def scrub_series(texts: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Vectorized scrub over an Arrow batch.

    Returns (scrubbed: Series[str], hits: Series[dict[str,int]]).
    """
    vals = texts.to_numpy(dtype=object)
    out = np.empty(len(vals), dtype=object)
    out_hits = np.empty(len(vals), dtype=object)
    cand = _candidates(vals)
    if cand is None:
        idx = range(len(vals))
    else:
        out[:] = vals                     # untouchable docs pass through
        out_hits[:] = [{} for _ in range(len(vals))]
        idx = np.flatnonzero(cand)
    for i in idx:
        s, h = scrub_one(vals[i])
        out[i] = s
        out_hits[i] = h
    return pd.Series(out, index=texts.index), pd.Series(out_hits,
                                                        index=texts.index)


def scrub_series_sparse(texts: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Like scrub_series but returns None where the text is UNCHANGED.

    The Spark side coalesces the None back to the original column, so
    only genuinely-rewritten documents (typically a few percent) travel
    back through Arrow — identical bytes, a fraction of the transfer.
    """
    vals = texts.to_numpy(dtype=object)
    out = np.empty(len(vals), dtype=object)
    out_hits = np.empty(len(vals), dtype=object)
    cand = _candidates(vals)
    if cand is None:
        idx = range(len(vals))
    else:
        out[:] = None                     # untouchable docs: unchanged
        out_hits[:] = [{} for _ in range(len(vals))]
        idx = np.flatnonzero(cand)
    for i in idx:
        s, h = scrub_one(vals[i])
        out[i] = s if h else None
        out_hits[i] = h
    return pd.Series(out, index=texts.index), pd.Series(out_hits,
                                                        index=texts.index)
