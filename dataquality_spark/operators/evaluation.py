"""Classifier-calibration operators: pick and grade a quality-filter
keep threshold from labeled data, as distributed queries.

The quality_filter tier is graded on keep/drop F1 (reference:
kishorem-mf/DataQuality quality gating — pass/fail decisions per
dataset; BASELINE.json metric "keep/drop F1>=0.99"), so threshold
selection and decision grading are first-class operators here rather
than a driver-side scikit-learn step over collected scores: at 10^12
documents the label join and the per-threshold confusion counts must
run where the data lives.

Cross-engine exactness: every count is an exact BIGINT aggregate and
every emitted ratio is ONE integer->double division (f1 uses the
2tp/(2tp+fp+fn) form for the same reason), so values are bit-identical
across engines with no accumulation-order hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["threshold_sweep", "confusion_matrix", "auc_exact",
           "cohens_kappa"]


def _ratio(num, den, round_dp: int):
    return F.round(num.cast("double") / den.cast("double"), round_dp)


def threshold_sweep(df: DataFrame, score_col: str, label_col: str,
                    round_dp: int = 6) -> DataFrame:
    """Per-threshold confusion matrix + precision/recall/F1 for the
    keep rule `score >= t`, one row per DISTINCT score value t
    (descending) — the full PR curve in one pass, from which the
    F1-maximizing keep threshold is a trivial argmax.

    Requires an EXACT score column (integer, or a fixed-lattice
    discretization like round(model_score * 10000)): float keys group
    unreliably across engines and a continuous score makes the output
    one row per document. A NULL score never satisfies `score >= t`,
    so null-score rows emit no threshold but still count in the
    totals (they land in fn/tn at every threshold — dropping them
    would understate the miss rate); NULL labels count as negative.

    Output: (threshold, n_ge, tp, fp, fn, tn, precision, recall, f1).
    n_ge >= 1 always (the threshold is itself an observed score), so
    precision and f1 are always defined; recall is NULL on a corpus
    with zero positives.

    Scale design: ONE groupBy(score) with map-side combine collapses
    the corpus to (score, count, positives) — shuffle rows = distinct
    scores, bounded by the score lattice (e.g. 10001 for a 4-dp score
    in [0,1]), not by the corpus. The cumulative window then runs over
    that tiny aggregate on a single post-shuffle partition by
    construction (documented trade-off: a lattice small enough to be a
    useful threshold menu is small enough for one task), and the
    one-row totals broadcast back via crossJoin.
    """
    lab = F.coalesce(F.col(label_col).cast("long"), F.lit(0))
    slim = df.select(F.col(score_col).alias("threshold"),
                     lab.alias("pos"))
    per = (slim.filter(F.col("threshold").isNotNull())
           .groupBy("threshold")
           .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
                F.sum("pos").cast("long").alias("npos")))
    tot = slim.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("total_pos"))
    w = (Window.orderBy(F.desc("threshold"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = per.select(
        "threshold",
        F.sum("cnt").over(w).cast("long").alias("n_ge"),
        F.sum("npos").over(w).cast("long").alias("tp"))
    out = (cum.crossJoin(F.broadcast(tot))
           .withColumn("fp", F.col("n_ge") - F.col("tp"))
           .withColumn("fn", F.col("total_pos") - F.col("tp"))
           .withColumn("tn", F.col("n_total") - F.col("n_ge")
                       - (F.col("total_pos") - F.col("tp"))))
    return (out.select(
        "threshold", "n_ge", "tp", "fp", "fn", "tn",
        _ratio(F.col("tp"), F.col("n_ge"), round_dp).alias("precision"),
        F.when(F.col("total_pos") > 0,
               _ratio(F.col("tp"), F.col("total_pos"), round_dp))
        .alias("recall"),
        _ratio(2 * F.col("tp"),
               2 * F.col("tp") + F.col("fp") + F.col("fn"),
               round_dp).alias("f1"))
        .orderBy(F.desc("threshold")))


def auc_exact(df: DataFrame, score_col: str, label_col: str,
              round_dp: int = 6) -> DataFrame:
    """Exact tie-aware ROC AUC (Mann-Whitney) of a score against a
    binary label, with no sampling and no trapezoid approximation:
    AUC = (#(pos,neg) pairs with pos-score > neg-score
           + #tied pairs / 2) / (n_pos * n_neg).

    Requires an exact/discretized score like threshold_sweep (and for
    the same reason). NULL scores rank below every real score (they
    never beat a negative, never tie); NULL labels are negative.

    Output: ONE row (n_pos, n_neg, num2, den2, auc) where num2/den2
    are the exact doubled pair counts as DECIMAL(38,0) — BIGINT pair
    counts overflow near 10^10 balanced docs, and the target corpus is
    10^12 — and auc = round(num2/den2, dp), one deterministic
    double division.

    Scale design: same skeleton as threshold_sweep — ONE map-side-
    combined groupBy(score) to the score lattice, a cumulative window
    over that tiny aggregate (cum negatives strictly below each
    score), then one-row final aggregate. Nothing per-document ever
    shuffles.
    """
    lab = F.coalesce(F.col(label_col).cast("long"), F.lit(0))
    per = (df.select(F.col(score_col).alias("s"), lab.alias("pos"))
           .groupBy("s")
           .agg(F.count(F.lit(1)).cast("long").alias("cnt"),
                F.sum("pos").cast("long").alias("npos")))
    per = per.withColumn("nneg", F.col("cnt") - F.col("npos"))
    # NULL scores sit strictly below every real score: a null-score
    # POSITIVE beats/ties nothing (no pair term of its own), but a
    # null-score NEGATIVE is beaten by every real-score positive — so
    # the cumulative-negatives window is SEEDED with the null-neg
    # count, and both null labels still join the n_pos/n_neg totals.
    null_tot = per.filter(F.col("s").isNull()).agg(
        F.coalesce(F.sum("npos"), F.lit(0)).cast("long").alias("np0"),
        F.coalesce(F.sum("nneg"), F.lit(0)).cast("long").alias("nn0"))
    w = (Window.orderBy(F.asc("s"))
         .rowsBetween(Window.unboundedPreceding, -1))
    dec = "decimal(38,0)"
    terms = (per.filter(F.col("s").isNotNull())
             .crossJoin(F.broadcast(null_tot))
             .select(
                 F.col("npos"), F.col("nneg"), F.col("np0"), F.col("nn0"),
                 (F.col("npos").cast(dec)
                  * (2 * (F.coalesce(F.sum("nneg").over(w), F.lit(0))
                          + F.col("nn0"))
                     + F.col("nneg")).cast(dec)).alias("num2_term")))
    agg = terms.agg(
        F.coalesce(F.sum("npos"), F.lit(0)).cast("long").alias("n_pos_s"),
        F.coalesce(F.sum("nneg"), F.lit(0)).cast("long").alias("n_neg_s"),
        F.coalesce(F.max("np0"), F.lit(0)).cast("long").alias("np0"),
        F.coalesce(F.max("nn0"), F.lit(0)).cast("long").alias("nn0"),
        F.coalesce(F.sum("num2_term"), F.lit(0).cast(dec)).cast(dec)
        .alias("num2"))
    # all-null-score corpus: terms is empty, so re-join the null totals
    out = (agg.crossJoin(F.broadcast(null_tot.select(
        F.col("np0").alias("np0_d"), F.col("nn0").alias("nn0_d"))))
        .select((F.col("n_pos_s") + F.col("np0_d")).alias("n_pos"),
                (F.col("n_neg_s") + F.col("nn0_d")).alias("n_neg"),
                F.col("num2")))
    den2 = (2 * F.col("n_pos").cast(dec) * F.col("n_neg").cast(dec))
    return out.select(
        "n_pos", "n_neg",
        F.col("num2").cast(dec).alias("num2"),
        den2.cast(dec).alias("den2"),
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
               F.round(F.col("num2").cast("double")
                       / den2.cast("double"), round_dp))
        .alias("auc"))


def cohens_kappa(df: DataFrame, a_col: str, b_col: str,
                 round_dp: int = 6) -> DataFrame:
    """Cohen's kappa between two boolean keep rules (rule-vs-rule or
    rule-vs-annotator agreement beyond chance), in the single-division
    exact form kappa = (N*agree - chance) / (N^2 - chance) with
    chance = a1*b1 + a0*b0 — every term an exact integer, ONE
    double division at the end, so the value is bit-identical
    cross-engine. N^2 and the products overflow BIGINT at 10^10+
    docs, so the quotient terms are DECIMAL(38,0). NULLs count as
    negative (same convention as confusion_matrix).

    Output: ONE row (n, agree, a1, b1, kappa); kappa NULL when the
    denominator is 0 (both raters constant — kappa undefined).
    Single map-side-combined aggregate; nothing per-doc shuffles.
    """
    a = F.coalesce(F.col(a_col).cast("long"), F.lit(0))
    b = F.coalesce(F.col(b_col).cast("long"), F.lit(0))
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum(a * b + (1 - a) * (1 - b)), F.lit(0))
        .cast("long").alias("agree"),
        F.coalesce(F.sum(a), F.lit(0)).cast("long").alias("a1"),
        F.coalesce(F.sum(b), F.lit(0)).cast("long").alias("b1"))
    dec = "decimal(38,0)"
    n, a1, b1 = F.col("n").cast(dec), F.col("a1").cast(dec), \
        F.col("b1").cast(dec)
    chance = a1 * b1 + (n - a1) * (n - b1)
    den = n * n - chance
    num = n * F.col("agree").cast(dec) - chance
    return agg.select(
        "n", "agree", "a1", "b1",
        F.when(den != F.lit(0).cast(dec),
               F.round(num.cast("double") / den.cast("double"),
                       round_dp)).alias("kappa"))


def confusion_matrix(df: DataFrame, pred_col: str, label_col: str,
                     round_dp: int = 6) -> DataFrame:
    """Grade a boolean keep decision against gold labels: ONE row
    (tp, fp, fn, tn, accuracy, precision, recall, f1) — the exact
    north-star check (keep/drop F1 vs reference labels) as a single
    map-side-combined aggregate, no shuffle beyond the one-row merge.

    NULL pred or label counts as negative/0. Ratios that would divide
    by zero are NULL (empty input, no predicted positives, no actual
    positives, tp+fp+fn = 0).
    """
    p = F.coalesce(F.col(pred_col).cast("long"), F.lit(0))
    y = F.coalesce(F.col(label_col).cast("long"), F.lit(0))
    agg = df.agg(
        F.coalesce(F.sum(p * y), F.lit(0)).cast("long").alias("tp"),
        F.coalesce(F.sum(p * (1 - y)), F.lit(0)).cast("long").alias("fp"),
        F.coalesce(F.sum((1 - p) * y), F.lit(0)).cast("long").alias("fn"),
        F.coalesce(F.sum((1 - p) * (1 - y)), F.lit(0)).cast("long")
        .alias("tn"))
    n = F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
    return agg.select(
        "tp", "fp", "fn", "tn",
        F.when(n > 0, _ratio(F.col("tp") + F.col("tn"), n, round_dp))
        .alias("accuracy"),
        F.when(F.col("tp") + F.col("fp") > 0,
               _ratio(F.col("tp"), F.col("tp") + F.col("fp"), round_dp))
        .alias("precision"),
        F.when(F.col("tp") + F.col("fn") > 0,
               _ratio(F.col("tp"), F.col("tp") + F.col("fn"), round_dp))
        .alias("recall"),
        F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
               _ratio(2 * F.col("tp"),
                      2 * F.col("tp") + F.col("fp") + F.col("fn"),
                      round_dp))
        .alias("f1"))


def reliability_bins(df: DataFrame, score_col: str, label_col: str,
                     bins: int = 10, scale: int = 10_000,
                     round_dp: int = 6) -> DataFrame:
    """Reliability diagram (classifier calibration check): bucket the
    score's integer lattice (round(score·scale)) into `bins`
    equal-width bins over [0, 1] and report, per non-empty bin —
    n (exact BIGINT), mean_score (lattice sum ÷ n, one division),
    pos_rate (label mean, one division), and gap = the signed
    calibration error pos_rate − mean_score. A well-calibrated score
    has gap ≈ 0 in every bin; a threshold picker reads this table
    next to the PR sweep.

    Binning is pure integer math — bin = min(bins−1,
    score_i·bins div scale) — so the bucket edges are bit-identical
    in any ANSI engine (score exactly 1.0 folds into the top bin,
    the standard convention). NULL scores are excluded (they carry
    no calibration information; the sweep and AUC count them
    separately). Scale design: ONE map-side-combined hash aggregate
    keyed on the bin — shuffle rows = bins, not documents.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    si = F.round(F.col(score_col) * scale).cast("long")
    b = F.least(F.lit(bins - 1),
                F.floor(si * bins / F.lit(scale)).cast("long"))
    y = F.coalesce(F.col(label_col).cast("long"), F.lit(0))
    agg = (df.filter(F.col(score_col).isNotNull())
           .select(b.alias("bin"), si.alias("_si"), y.alias("_y"))
           .groupBy("bin")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("_si").cast("long").alias("score_sum_i"),
                F.sum("_y").cast("long").alias("n_pos")))
    mean_score = F.round(F.col("score_sum_i").cast("double")
                         / (F.col("n").cast("double") * scale), round_dp)
    pos_rate = F.round(F.col("n_pos").cast("double")
                       / F.col("n").cast("double"), round_dp)
    return (agg.select(
        "bin", "n", "score_sum_i", "n_pos",
        mean_score.alias("mean_score"),
        pos_rate.alias("pos_rate"),
        F.round(F.col("n_pos").cast("double") / F.col("n").cast("double")
                - F.col("score_sum_i").cast("double")
                / (F.col("n").cast("double") * scale), round_dp)
        .alias("gap"))
        .orderBy("bin"))
