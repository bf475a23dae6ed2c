"""Distributed k-means + SemDedup: agreement with a numpy reference,
parallelism invariance, assignment semantics, planted-cluster recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataquality_spark.operators import clustering, graph


def _blobs(n_per=40, k=3, d=8, seed=7):
    """k well-separated deterministic blobs."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 10.0
    pts = np.concatenate([c + rng.normal(size=(n_per, d)) * 0.3
                          for c in centers])
    return pts, centers


def _numpy_lloyd(pts, init, max_iter=10, tol=1e-6):
    c = init.copy()
    for _ in range(max_iter):
        lab = ((pts[:, None, :] - c[None, :, :]) ** 2).sum(2).argmin(1)
        new = c.copy()
        for j in range(len(c)):
            m = lab == j
            if m.any():
                new[j] = pts[m].mean(0)
        shift = np.sqrt(((new - c) ** 2).sum(1)).max()
        c = new
        if shift <= tol:
            break
    return c


@pytest.fixture(scope="module")
def blob_df(spark):
    pts, centers = _blobs()
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    return (spark.createDataFrame(rows, "id long, e array<double>"),
            pts, centers)


def test_fit_matches_numpy_reference(spark, blob_df):
    df, pts, _ = blob_df
    init = clustering.deterministic_init(df, "e", 3)
    cents, info = clustering.kmeans_fit(df, "e", 3, init=init,
                                        max_iter=10)
    ref = _numpy_lloyd(pts, init, max_iter=info["iterations"])
    assert np.allclose(cents, ref, atol=1e-9)
    assert info["iterations"] <= 10


def test_fit_parallelism_invariant(spark, blob_df):
    df, _, _ = blob_df
    init = clustering.deterministic_init(df, "e", 3)
    a, _ = clustering.kmeans_fit(df.repartition(1), "e", 3, init=init,
                                 max_iter=5)
    b, _ = clustering.kmeans_fit(df.repartition(13), "e", 3, init=init,
                                 max_iter=5)
    assert np.allclose(a, b, atol=1e-8)


def test_assign_ties_lowest_index(spark):
    """A point equidistant from two centroids lands in the lower one."""
    df = spark.createDataFrame([(0, [0.0, 0.0])],
                               "id long, e array<double>")
    cents = np.array([[1.0, 0.0], [-1.0, 0.0]])
    out = clustering.assign_clusters(df, "e", cents,
                                     dist_col="d2").collect()[0]
    assert out["cluster"] == 0 and out["d2"] == pytest.approx(1.0)


def test_assign_separates_blobs(spark, blob_df):
    df, pts, centers = blob_df
    # seed from the true centers: hash-seeding can put two seeds in one
    # blob, which is a k-means init property, not an operator bug
    cents, _ = clustering.kmeans_fit(df, "e", 3, init=centers,
                                     max_iter=10)
    lab = clustering.assign_clusters(df, "e", cents).orderBy("id") \
        .select("cluster").toPandas()["cluster"].to_numpy()
    # each planted blob maps to exactly one fitted cluster
    for b in range(3):
        assert len(set(lab[b * 40:(b + 1) * 40])) == 1
    assert len(set(lab[::40])) == 3


def test_semdedup_finds_planted_within_cluster_dups(spark, blob_df):
    df, pts, centers = blob_df
    # plant near-identical copies (1.0001 scale => cosine ~ 1) of ids
    # 0, 40, 80 — one per blob
    dup = df.where(F.col("id").isin([0, 40, 80])).select(
        (F.col("id") + 1000).alias("id"),
        F.transform("e", lambda x: x * 1.0001).alias("e"))
    corpus = df.unionByName(dup)
    cents, _ = clustering.kmeans_fit(df, "e", 3, init=centers,
                                     max_iter=10)
    pairs = clustering.semdedup_pairs(corpus, "e", "id", cents,
                                      cosine_threshold=0.999999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(0, 1000), (40, 1040), (80, 1080)} <= got
    # resolve to clusters: each planted copy is a dup of its original
    res = graph.resolve_duplicates(corpus, pairs, "id")
    dups = {r["id"]: r["dup_of"] for r in
            res.where("is_dup").collect()}
    for orig in (0, 40, 80):
        assert dups[orig + 1000] == orig


def test_semdedup_hot_cluster_cap(spark, blob_df):
    df, _, centers = blob_df
    cents, _ = clustering.kmeans_fit(df, "e", 3, init=centers,
                                     max_iter=10)
    # cap below blob size -> every cluster dropped -> zero candidates
    assert clustering.semdedup_pairs(df, "e", "id", cents,
                                     cosine_threshold=0.0,
                                     max_cluster=10).count() == 0


def test_fit_empty_cluster_keeps_centroid(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(4)],
        "id long, e array<double>")
    far = np.array([[0.0, 0.0], [1000.0, 1000.0]])
    cents, _ = clustering.kmeans_fit(df, "e", 2, init=far, max_iter=3)
    assert np.allclose(cents[1], [1000.0, 1000.0])
    assert np.allclose(cents[0], [1.5, 0.0])


def test_fit_on_sample_near_full_fit(spark, blob_df):
    """The 100-TB fit recipe: centroids fitted on a deterministic hash
    sample land within the blob radius of the full-corpus fit, and the
    sample filter actually shrinks the scanned row set."""
    df, pts, centers = blob_df
    # init at the true blob centers: both fits then converge to per-blob
    # means (no local-optimum drift), isolating the sampling error
    full, _ = clustering.kmeans_fit(df, "e", 3, init=centers, max_iter=10)
    samp, _ = clustering.kmeans_fit(df, "e", 3, init=centers, max_iter=10,
                                    sample_fraction=0.5)
    # blobs have sigma 0.3; sample means deviate O(sigma/sqrt(n/2k))
    assert np.abs(samp - full).max() < 0.3
    # cluster-to-cluster assignment must agree between the two fits
    lab_full = ((pts[:, None, :] - full[None]) ** 2).sum(2).argmin(1)
    lab_samp = ((pts[:, None, :] - samp[None]) ** 2).sum(2).argmin(1)
    assert (lab_full == lab_samp).mean() > 0.99


def test_fit_on_sample_deterministic_and_partition_invariant(spark, blob_df):
    df, _, _ = blob_df
    init = clustering.deterministic_init(df, "e", 3)
    a, _ = clustering.kmeans_fit(df.repartition(1), "e", 3, init=init,
                                 max_iter=4, sample_fraction=0.4,
                                 sample_salt=9)
    b, _ = clustering.kmeans_fit(df.repartition(11), "e", 3, init=init,
                                 max_iter=4, sample_fraction=0.4,
                                 sample_salt=9)
    assert np.allclose(a, b, atol=1e-9)


def test_fit_on_sample_lcg_matches_manual_filter(spark, blob_df):
    """sample_key + method='lcg' selects exactly the rows the LCG keeps
    — fit on the pre-filtered frame must be bit-identical."""
    df, _, _ = blob_df
    a_mod, c_mod, m_mod = 1103515245, 12345, 2147483648
    thr = int(round(0.5 * 1_000_000))
    keep = df.where(
        ((F.col("id") % m_mod) * a_mod + c_mod) % m_mod % 1_000_000 < thr)
    init = clustering.deterministic_init(keep, "e", 3)
    via_param, _ = clustering.kmeans_fit(
        df, "e", 3, init=init, max_iter=3,
        sample_fraction=0.5, sample_key="id", sample_method="lcg")
    via_filter, _ = clustering.kmeans_fit(keep, "e", 3, init=init,
                                          max_iter=3)
    assert np.array_equal(via_param, via_filter)


def test_fit_sample_fraction_validation(spark, blob_df):
    df, _, _ = blob_df
    with pytest.raises(ValueError):
        clustering.kmeans_fit(df, "e", 3, max_iter=1, sample_fraction=0.0)
    with pytest.raises(ValueError):
        clustering.kmeans_fit(df, "e", 3, max_iter=1, sample_fraction=1.5)
