"""Unit tests for each heuristic rule on hand-built micro documents
(reference test pattern: the mock-schema fixture, main.py:449-462,
generalized per SURVEY.md §5.2-1)."""

import pandas as pd
import pytest

from dataquality_spark import config as C, oracle


def _hits(text, lang="en", ts="2024-09-01"):
    df = pd.DataFrame({
        "url": ["https://h/x"],
        "warc_ts": pd.to_datetime([ts]),
        "html": [b""],
        "text": [text],
        "lang": [lang],
    })
    return list(oracle.run_oracle(df)["rule_hits"].iloc[0])


def _clean_doc(n=80, lang="en"):
    import numpy as np

    from dataquality_spark import synth
    rng = np.random.default_rng(7)
    return " ".join(synth.gen_tokens(lang, n, rng))


def test_clean_doc_keeps():
    assert _hits(_clean_doc()) == []


def test_empty_and_null():
    assert _hits("") == [C.R_EMPTY]
    assert _hits(None) == [C.R_EMPTY]
    assert _hits("   \n\n ") == [C.R_EMPTY]


def test_short():
    assert C.R_SHORT in _hits("the data " * 10)  # 20 words < 50


def test_long():
    doc = _clean_doc(100)
    words = doc.split()
    big = " ".join(words * (C.MAX_WORDS // len(words) + 2))
    assert C.R_LONG in _hits(big)


def test_mean_word_len():
    long_words = " ".join(["the", "of"] + ["x" * 15] * 60)
    assert C.R_MEAN_WORD_LEN in _hits(long_words)


def test_symbol_ratio():
    doc = _clean_doc(60) + " " + "##".join(["x"] * 20)
    assert C.R_SYMBOL_RATIO in _hits(doc)


def test_stopword_density():
    no_stop = " ".join(["data", "quality", "filter"] * 30)
    assert C.R_STOPWORD in _hits(no_stop)


def test_repeated_lines():
    line = " ".join(["the data value"] * 4)
    doc = "\n".join([_clean_doc(12) for _ in range(3)] + [line] * 7)
    assert C.R_REPEATED_LINES in _hits(doc)


def test_stale():
    assert C.R_STALE in _hits(_clean_doc(), ts="2023-01-01")


def test_lang_mismatch():
    assert C.R_LANG_MISMATCH in _hits(_clean_doc(lang="fr"), lang="en")
    assert _hits(_clean_doc(lang="fr"), lang="fr") == []


def test_rule_hits_sorted_by_fixed_order():
    hits = _hits("ab " * 10, ts="2023-01-01")  # short + stopword + stale
    assert hits == sorted(hits, key=C.ALL_RULES.index)


def test_dup_url_first_wins():
    doc = _clean_doc()
    df = pd.DataFrame({
        "url": ["https://h/a", "https://h/a"],
        "warc_ts": pd.to_datetime(["2024-09-01", "2024-10-01"]),
        "html": [b"", b""],
        "text": [doc, doc],
        "lang": ["en", "en"],
    })
    out = oracle.run_oracle(df).sort_values("warc_ts")
    assert list(out["rule_hits"].iloc[0]) == []
    assert list(out["rule_hits"].iloc[1]) == [C.R_DUP_URL]
