"""Property-based spot checks (SURVEY §5.2-3) with hypothesis — pure
Python, no Spark session: they pin the deterministic cores shared by the
pipeline UDFs and the pandas oracle."""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from dataquality_spark import config as C
from dataquality_spark import functions
from dataquality_spark.functions import langid, lm, scrub

# Text strategy: printable unicode plus planted PII-ish fragments.
_pii_bits = st.sampled_from([
    "a.user+x@mail.example.com", "+1-555-123-4567", "10.1.2.3",
    "badword7", "plain words only", "", " ", "\n\n",
    "ünïcode tëxt 数据 质量", "a@b", "1.2.3", "555-1234",
])
texts = st.lists(
    st.one_of(st.text(max_size=80), _pii_bits), min_size=0, max_size=6
).map(lambda parts: " ".join(parts))


@settings(max_examples=200, deadline=None)
@given(texts)
def test_scrub_idempotent(t):
    once, hits1 = scrub.scrub_one(t)
    twice, hits2 = scrub.scrub_one(once)
    assert twice == once
    # replacement tokens themselves must never re-trigger a rule
    assert not hits2 or all(k == "ipv4" for k in hits2), (t, once, hits2)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_scrub_removes_every_pattern(t):
    out, _ = scrub.scrub_one(t)
    for rule_id, pat, _repl in C.SCRUB_PATTERNS:
        assert re.search(pat, out) is None, (rule_id, t, out)


@settings(max_examples=100, deadline=None)
@given(texts)
def test_langid_total_and_deterministic(t):
    s = pd.Series([t, t])
    p, sc = langid.score_texts(s)
    assert p[0] == p[1] and sc[0] == sc[1]
    assert p[0] in set(C.LANGS) | {"und"}
    assert sc[0] >= 0.0


@settings(max_examples=100, deadline=None)
@given(texts)
def test_perplexity_positive_and_deterministic(t):
    s = pd.Series([t, t])
    out = lm.perplexity(s)
    # "has words" per the engine-wide ASCII-whitespace tokenize
    # contract, NOT bare str.split(): a doc of only \x1c-\x1f (Unicode
    # whitespace to Python, opaque bytes to the engine) IS a word here
    if functions.tokenize(t):
        assert out[0] == out[1]
        assert out[0] > 0
    else:
        assert pd.isna(out[0])


@settings(max_examples=50, deadline=None)
@given(st.lists(st.sampled_from(
    sum(C.STOPWORDS.values(), [])), min_size=5, max_size=60))
def test_langid_on_pure_stopwords_matches_some_lang(words):
    p, _ = langid.score_texts(pd.Series([" ".join(words)]))
    assert p[0] in set(C.LANGS)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_tokenize_matches_contract_regex(t):
    """functions.tokenize ≡ the documented contract regex
    (config.WORD_SPLIT_REGEX) ≡ the oracle's replace-chain split, on
    arbitrary unicode — NBSP//\\u2028 and friends must stay INSIDE
    words; only ASCII ' \\n\\t\\r' split."""
    from dataquality_spark.functions import tokenize

    by_regex = [w for w in re.split(C.WORD_SPLIT_REGEX, t) if w]
    by_oracle = [w for w in t.replace("\t", " ").replace("\r", " ")
                 .replace("\n", " ").split(" ") if w]
    assert tokenize(t) == by_regex == by_oracle


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_char_count_identities(t):
    """The memchr count identities the fused UDF relies on: sum of word
    lengths == len(t) − #ASCII-ws chars; per-symbol counts sum to the
    translate-delete delta."""
    from dataquality_spark.functions import tokenize

    n_ws = sum(t.count(ch) for ch in " \n\t\r")
    assert sum(len(w) for w in tokenize(t)) == len(t) - n_ws
    del_sym = {ord(c): None for c in C.SYMBOL_CHARS}
    assert sum(t.count(ch) for ch in C.SYMBOL_CHARS) == \
        len(t) - len(t.translate(del_sym))
