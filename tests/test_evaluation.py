"""operators/evaluation: threshold sweep + confusion matrix vs a
pure-Python reference."""

import random

from dataquality_spark.operators import evaluation


def _py_sweep(pairs, dp=6):
    pairs = [(s, int(bool(y)) if y is not None else 0) for s, y in pairs]
    total = len(pairs)                       # null scores count here…
    total_pos = sum(y for _, y in pairs)
    scored = [(s, y) for s, y in pairs if s is not None]
    out = []
    for t in sorted({s for s, _ in scored}, reverse=True):
        n_ge = sum(1 for s, _ in scored if s >= t)   # …but never here
        tp = sum(y for s, y in scored if s >= t)
        fp, fn = n_ge - tp, total_pos - tp
        tn = total - n_ge - fn
        rec = round(tp / total_pos, dp) if total_pos else None
        out.append((t, n_ge, tp, fp, fn, tn, round(tp / n_ge, dp),
                    rec, round(2 * tp / (2 * tp + fp + fn), dp)))
    return out


def test_threshold_sweep_vs_python(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 20), rng.random() < 0.4)
            for i in range(400)]
    rows += [(1000, None, True), (1001, 5, None)]   # null score / label
    df = spark.createDataFrame(rows, "id long, s long, y boolean")
    got = [tuple(r) for r in
           evaluation.threshold_sweep(df, "s", "y").collect()]
    want = _py_sweep([(s, y) for _, s, y in rows])
    assert got == want
    # keep rule at the best-F1 threshold reproduces its confusion row
    best = max(got, key=lambda r: (r[8], r[0]))
    cm = evaluation.confusion_matrix(
        df.selectExpr("s >= {} as p".format(best[0]), "y"),
        "p", "y").collect()[0]
    assert (cm["tp"], cm["fp"], cm["fn"], cm["tn"]) == best[2:6]
    assert cm["f1"] == best[8]


def test_threshold_sweep_zero_positives(spark):
    df = spark.createDataFrame([(1, 3, False), (2, 1, False)],
                               "id long, s long, y boolean")
    got = evaluation.threshold_sweep(df, "s", "y").collect()
    assert [(r["threshold"], r["tp"], r["recall"], r["f1"])
            for r in got] == [(3, 0, None, 0.0), (1, 0, None, 0.0)]


def _py_auc(pairs):
    """Brute-force O(n^2) tie-aware AUC; NULL score = below all and
    never tied, NULL label = negative."""
    lab = [(s, int(bool(y)) if y is not None else 0) for s, y in pairs]
    pos = [s for s, y in lab if y == 1]
    neg = [s for s, y in lab if y == 0]
    num2 = 0
    for p in pos:
        for q in neg:
            if p is None:
                continue
            if q is None or p > q:
                num2 += 2
            elif p == q:
                num2 += 1
    return len(pos), len(neg), num2, 2 * len(pos) * len(neg)


def test_auc_exact_vs_bruteforce(spark):
    rng = random.Random(11)
    rows = [(i, rng.randrange(0, 8), rng.random() < 0.3)
            for i in range(300)]
    rows += [(900, None, True), (901, None, False), (902, 3, None)]
    df = spark.createDataFrame(rows, "id long, s long, y boolean")
    got = evaluation.auc_exact(df, "s", "y").collect()[0]
    n_pos, n_neg, num2, den2 = _py_auc([(s, y) for _, s, y in rows])
    assert (got["n_pos"], got["n_neg"]) == (n_pos, n_neg)
    assert (int(got["num2"]), int(got["den2"])) == (num2, den2)
    assert got["auc"] == round(num2 / den2, 6)
    # degenerate: single-class corpus → auc NULL
    one = evaluation.auc_exact(
        df.filter("y"), "s", "y").collect()[0]
    assert one["auc"] is None and one["n_neg"] == 0


def test_cohens_kappa_vs_formula(spark):
    rng = random.Random(13)
    rows = [(rng.random() < 0.6, rng.random() < 0.4)
            for _ in range(250)] + [(None, True), (False, None)]
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    got = evaluation.cohens_kappa(df, "a", "b").collect()[0]
    lab = [(int(bool(a)) if a is not None else 0,
            int(bool(b)) if b is not None else 0) for a, b in rows]
    n = len(lab)
    agree = sum(1 for a, b in lab if a == b)
    a1 = sum(a for a, _ in lab)
    b1 = sum(b for _, b in lab)
    chance = a1 * b1 + (n - a1) * (n - b1)
    assert (got["n"], got["agree"], got["a1"], got["b1"]) == \
        (n, agree, a1, b1)
    assert got["kappa"] == round((n * agree - chance)
                                 / (n * n - chance), 6)
    # both raters constant-true → pe = 1 → denominator 0 → kappa NULL
    const = evaluation.cohens_kappa(
        spark.createDataFrame([(True, True)] * 3,
                              "a boolean, b boolean"), "a", "b")
    assert const.collect()[0]["kappa"] is None


def test_confusion_matrix_counts_and_edges(spark):
    df = spark.createDataFrame(
        [(True, True), (True, False), (False, True), (False, False),
         (None, True), (True, None)],
        "p boolean, y boolean")
    r = evaluation.confusion_matrix(df, "p", "y").collect()[0]
    # nulls count as negative: p=(1,1,0,0,0,1), y=(1,0,1,0,1,0)
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 2, 2, 1)
    assert r["accuracy"] == round(2 / 6, 6)
    assert r["precision"] == round(1 / 3, 6)
    assert r["recall"] == round(1 / 3, 6)
    assert r["f1"] == round(2 / 6, 6)    # 2tp/(2tp+fp+fn) = 2/(2+2+2)
    empty = evaluation.confusion_matrix(
        df.filter("false"), "p", "y").collect()[0]
    assert tuple(empty) == (0, 0, 0, 0, None, None, None, None)


class TestReliabilityBins:
    def test_handcrafted(self, spark):
        rows = [
            (0.05, 1), (0.05, 0),          # bin 0: mean .05, rate .5
            (0.95, 1), (1.0, 1),           # bin 9 (1.0 folds into top)
            (0.55, 0),                     # bin 5
            (None, 1),                     # excluded
        ]
        df = spark.createDataFrame(rows, "score double, y long")
        got = {r.bin: r for r in evaluation.reliability_bins(
            df, "score", "y", bins=10).collect()}
        assert set(got) == {0, 5, 9}
        b0 = got[0]
        assert (b0.n, b0.n_pos, b0.score_sum_i) == (2, 1, 1000)
        assert b0.mean_score == 0.05 and b0.pos_rate == 0.5
        assert b0.gap == round(0.5 - 0.05, 6)
        b9 = got[9]
        assert (b9.n, b9.n_pos) == (2, 2)
        assert b9.mean_score == round(19500 / 20000, 6)
        assert got[5].pos_rate == 0.0

    def test_bins_validation(self, spark):
        import pytest
        df = spark.createDataFrame([(0.5, 1)], "score double, y long")
        with pytest.raises(ValueError):
            evaluation.reliability_bins(df, "score", "y", bins=0)
