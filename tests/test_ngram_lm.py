"""Corpus-trained bigram LM (operators/ngram_lm) vs a pure-Python
oracle: exact counts, lattice probabilities, log-prob weights, OOV
mass, and bit-identity under repartitioning."""

import math
from collections import Counter

import pytest

from dataquality_spark.operators import ngram_lm

SCALE = 1_000_000

DOCS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the cat ran", "en"),
    (3, "the dog sat on the cat", "en"),
    (4, "le chat noir", "fr"),
    (5, None, "en"),
    (6, "", "en"),
    (7, "single", "en"),
    (8, "  the   cat\tsat  ", "en"),      # tokenizer: runs collapse
    (9, "unseen words entirely", "en"),
]


def _tokens(text):
    return [w for w in (text or "").split() if w]


def _py_model(rows, min_count):
    pairs = Counter()
    for _, text, _ in rows:
        ws = _tokens(text)
        pairs.update(zip(ws, ws[1:]))
    pairs = {p: n for p, n in pairs.items() if n >= min_count}
    ctx = Counter()
    for (w1, _), n in pairs.items():
        ctx[w1] += n
    return pairs, ctx


def _py_scores(rows, pairs, ctx, scale=SCALE):
    vocab = {w for p in pairs for w in p}
    oov = math.floor(scale * -math.log(len(vocab) + 1))
    out = {}
    for doc_id, text, _ in rows:
        ws = _tokens(text)
        bgs = list(zip(ws, ws[1:]))
        n_oov = sum(1 for b in bgs if b not in pairs)
        score = sum(
            math.floor(scale * (math.log(pairs[b]) - math.log(ctx[b[0]])))
            if b in pairs else oov
            for b in bgs)
        out[doc_id] = (len(bgs), n_oov, score)
    return out


@pytest.fixture(scope="module")
def docs_sdf(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


@pytest.mark.parametrize("min_count", [1, 2])
def test_train_matches_python_oracle(spark, docs_sdf, min_count):
    model = ngram_lm.train_bigram_lm(docs_sdf, min_count=min_count)
    got = {(r.w1, r.w2): (r.pair_n, r.ctx_n, r.p_q)
           for r in model.collect()}
    pairs, ctx = _py_model(DOCS, min_count)
    want = {p: (n, ctx[p[0]], n * SCALE // ctx[p[0]])
            for p, n in pairs.items()}
    assert got == want


@pytest.mark.parametrize("min_count", [1, 2])
def test_scores_match_python_oracle(spark, docs_sdf, min_count):
    model = ngram_lm.train_bigram_lm(docs_sdf, min_count=min_count)
    scored = ngram_lm.score_bigram_lm(docs_sdf, model)
    got = {r.doc_id: (r.n_bigrams, r.n_oov, r.lm_score_q)
           for r in scored.collect()}
    pairs, ctx = _py_model(DOCS, min_count)
    assert got == _py_scores(DOCS, pairs, ctx)


def test_ctx_is_post_prune_consistent(spark, docs_sdf):
    """ctx_n sums the RETAINED pair_n per w1, so retained conditional
    p_q sum to scale within per-row floor error."""
    model = ngram_lm.train_bigram_lm(docs_sdf, min_count=2).collect()
    by_w1 = {}
    for r in model:
        by_w1.setdefault(r.w1, []).append(r)
    for w1, rows in by_w1.items():
        assert sum(r.pair_n for r in rows) == rows[0].ctx_n
        total_p = sum(r.p_q for r in rows)
        assert SCALE - len(rows) < total_p <= SCALE


def test_bit_identical_under_repartition(spark, docs_sdf):
    model = ngram_lm.train_bigram_lm(docs_sdf, min_count=1)
    a = sorted(ngram_lm.score_bigram_lm(docs_sdf, model).collect())
    shuffled = docs_sdf.repartition(7)
    b = sorted(ngram_lm.score_bigram_lm(
        shuffled, ngram_lm.train_bigram_lm(shuffled, min_count=1),
        broadcast_model=False).collect())
    assert a == b


def test_empty_model_scores_zero_oov_mass(spark, docs_sdf):
    """A model pruned to nothing: V=0 → OOV weight floor(-ln 1)=0 →
    every doc scores 0 with full OOV accounting, never NULL."""
    model = ngram_lm.train_bigram_lm(docs_sdf, min_count=99)
    assert model.count() == 0
    got = {r.doc_id: (r.n_bigrams, r.n_oov, r.lm_score_q)
           for r in ngram_lm.score_bigram_lm(docs_sdf, model).collect()}
    for doc_id, text, _ in DOCS:
        n = max(len(_tokens(text)) - 1, 0)
        assert got[doc_id] == (n, n, 0)


def test_min_count_rejects_zero(spark, docs_sdf):
    with pytest.raises(ValueError):
        ngram_lm.train_bigram_lm(docs_sdf, min_count=0)
