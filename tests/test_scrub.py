"""Scrub unit + property tests (SURVEY.md §5.2-3, FIXTURES.md §6 unicode
edges). The scrub is the graft of the reference's forbidden-pattern regex
layer (agents/unity_sql_agent.py:127-159)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dataquality_spark import config as C
from dataquality_spark.functions import scrub


def s(text):
    return scrub.scrub_one(text)[0]


def test_email():
    assert s("mail me at a.b-c_d@ex-ample.co.uk thanks") == \
        "mail me at <EMAIL> thanks"


def test_phone():
    assert s("call +1-555-123-4567 now") == "call <PHONE> now"
    assert s("call 44-555-123-4567") == "call <PHONE>"


def test_ipv4():
    assert s("host 192.168.0.1 down") == "host <IP> down"
    assert s("pi is 3.14159 ok") == "pi is 3.14159 ok"


def test_toxicity_word_boundary():
    assert s("said badword3 loud") == "said <BAD> loud"
    assert s("said badword3x loud") == "said badword3x loud"  # no boundary


def test_pii_at_edges_and_adjacent():
    assert s("a@b.co") == "<EMAIL>"
    assert s("a@b.co x@y.io") == "<EMAIL> <EMAIL>"
    assert s("1.2.3.4") == "<IP>"


def test_unicode_preserved():
    t = "héllo 你好 🎉 áccent a@b.co\r\nnext"
    assert s(t) == "héllo 你好 🎉 áccent <EMAIL>\r\nnext"


def test_none():
    assert s(None) is None


def test_fixed_order_ip_domain():
    # '@1.2.3.44' has no alphabetic TLD so the email pattern passes over it;
    # the (later-ordered) ipv4 pattern then rewrites the address part.
    assert s("x@1.2.3.44") == "x@<IP>"


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_idempotent(t):
    once = s(t)
    assert s(once) == once


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2fff),
               max_size=120))
def test_no_pattern_survives(t):
    out = s(t)
    for _rid, pat, _repl in scrub.COMPILED:
        assert not pat.search(out or "")


def test_series_matches_scalar():
    texts = pd.Series(["a@b.co", None, "", "10.0.0.1 badword1"])
    out, hits = scrub.scrub_series(texts)
    assert list(out) == ["<EMAIL>", None, "", "<IP> <BAD>"]
    assert hits.iloc[3] == {"ipv4": 1, "toxicity": 1}
