"""Winnowing fingerprints vs a pure-Python reference implementation of
Schleimer et al.'s algorithm, plus the paper's sharing guarantee."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dataquality_spark.operators.text_analysis import winnow_fingerprints


def _md5_36(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:9], 16)


def _py_winnow(text: str, k: int, w: int):
    """Reference: hash k-grams, per full window of w take the minimum
    (rightmost on ties), dedupe selections."""
    words = [x for x in text.split() if x]
    grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    hs = [_md5_36(g) for g in grams]
    sel = set()
    for s in range(len(hs) - w + 1):
        win = hs[s:s + w]
        m = min(win)
        # rightmost occurrence of the min
        pos = s + max(i for i, v in enumerate(win) if v == m)
        sel.add((pos, m))
    return sel


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again and again",
    "a b c d e f g h i j k l m n o p",
    "rep rep rep rep rep rep rep rep rep rep",   # all-equal hashes: ties
    "one two three four five six seven eight nine ten eleven twelve",
]


@pytest.mark.parametrize("k,w", [(3, 4), (5, 4), (2, 2)])
def test_matches_python_reference(spark, k, w):
    df = spark.createDataFrame(list(enumerate(TEXTS)),
                               "doc_id long, text string")
    out = winnow_fingerprints(df, k=k, w=w, portable_hash=True).collect()
    got = {}
    for r in out:
        got.setdefault(r["id"], set()).add((r["pos"], r["fp_hash"]))
    for i, t in enumerate(TEXTS):
        assert got.get(i, set()) == _py_winnow(t, k, w), f"doc {i}"


def test_sharing_guarantee(spark):
    """Docs sharing a run of >= w+k-1 words share >= 1 fingerprint;
    the selection is ~2/(w+1) dense, far smaller than the gram set."""
    k, w = 4, 5
    shared = " ".join(f"s{i}" for i in range(k + w - 1))
    a = "left filler words " + shared + " tail a"
    b = "completely different prefix here " + shared + " other suffix"
    df = spark.createDataFrame([(0, a), (1, b)],
                               "doc_id long, text string")
    rows = winnow_fingerprints(df, k=k, w=w).collect()
    fps = {0: set(), 1: set()}
    for r in rows:
        fps[r["id"]].add(r["fp_hash"])
    assert fps[0] & fps[1], "shared run must share a fingerprint"

    long_doc = spark.createDataFrame(
        [(9, " ".join(f"u{i}" for i in range(500)))],
        "doc_id long, text string")
    n_sel = winnow_fingerprints(long_doc, k=k, w=w).count()
    n_windows = 500 - k + 1 - w + 1
    assert n_sel <= n_windows
    # expected density 2/(w+1) = 1/3; allow generous slack both ways
    assert n_windows * 0.15 <= n_sel <= n_windows * 0.6


def test_short_and_null_docs(spark):
    df = spark.createDataFrame(
        [(0, "too short"), (1, None), (2, ""), (3, "a b c d e f g h")],
        "doc_id long, text string")
    rows = winnow_fingerprints(df, k=5, w=3).collect()
    assert {r["id"] for r in rows} == {3}


def test_xxhash_and_portable_same_positions_density(spark):
    """The two hash families select different positions (different
    min ordering) but identical selection counts per window density
    envelope and identical behavior on all-tie docs."""
    df = spark.createDataFrame([(0, TEXTS[2])], "doc_id long, text string")
    a = winnow_fingerprints(df, k=2, w=3).collect()
    b = winnow_fingerprints(df, k=2, w=3, portable_hash=True).collect()
    # all grams equal -> every window's rightmost min -> same positions
    assert {r["pos"] for r in a} == {r["pos"] for r in b}
