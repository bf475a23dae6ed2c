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


def scrub_series(texts: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Vectorized scrub over an Arrow batch.

    Returns (scrubbed: Series[str], hits: Series[dict[str,int]]).
    """
    vals = texts.to_numpy(dtype=object)
    out = np.empty(len(vals), dtype=object)
    out_hits = np.empty(len(vals), dtype=object)
    for i, t in enumerate(vals):
        s, h = scrub_one(t)
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
    for i, t in enumerate(vals):
        s, h = scrub_one(t)
        out[i] = s if h else None
        out_hits[i] = h
    return pd.Series(out, index=texts.index), pd.Series(out_hits,
                                                        index=texts.index)
