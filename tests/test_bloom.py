"""Bloom-filter cross-run dedup: no false negatives, bounded false
positives, equivalence with the anti-join form, merge-tree correctness."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataquality_spark.operators import bloom, dedup


@pytest.fixture(scope="module")
def corpus(spark):
    ref = spark.createDataFrame(
        [(i, f"ref doc {i} " + " ".join(f"w{i}_{j}" for j in range(20)))
         for i in range(200)] + [(900, None)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        # 50 exact copies of ref, 150 fresh, one NULL (matches ref NULL)
        [(1000 + i, f"ref doc {i} " + " ".join(f"w{i}_{j}"
                                               for j in range(20)))
         for i in range(50)]
        + [(2000 + i, f"fresh doc {i} " + " ".join(f"n{i}_{j}"
                                                   for j in range(20)))
           for i in range(150)] + [(1900, None)],
        "doc_id long, text string")
    return ref, new


def test_no_false_negatives_and_bounded_fp(spark, corpus):
    ref, new = corpus
    filt = bloom.build_bloom(ref, num_bits=1 << 20, num_hashes=7)
    flagged = bloom.bloom_contains(new, filt, num_hashes=7)
    hits = {r["doc_id"] for r in
            flagged.where("in_bloom").select("doc_id").collect()}
    # every exact copy (and the NULL-text row) MUST hit
    assert set(range(1000, 1050)) | {1900} <= hits
    # at n=201, m=2^20, k=7 the fp rate is ~1e-20 — no fresh doc hits
    assert hits == set(range(1000, 1050)) | {1900}


def test_matches_anti_join_form(spark, corpus):
    """bloom_dedup_cross == exact_dedup_cross when fpp ~ 0: the two
    cross-run dedup forms are interchangeable below filter capacity."""
    ref, new = corpus
    filt = bloom.build_bloom(ref, num_bits=1 << 20, num_hashes=7)
    kept_bloom = {r["doc_id"] for r in
                  bloom.bloom_dedup_cross(new, filt).collect()}
    kept_join = {r["doc_id"] for r in
                 dedup.exact_dedup_cross(new, ref, "text",
                                         "doc_id").collect()}
    assert kept_bloom == kept_join == set(range(2000, 2150))


def test_null_distinct_from_empty(spark):
    """NULL text matches NULL, never '' — same contract as the
    anti-join (SQL IS NOT DISTINCT FROM) form."""
    ref = spark.createDataFrame([(1, None)], "doc_id long, text string")
    new = spark.createDataFrame([(2, None), (3, "")],
                                "doc_id long, text string")
    filt = bloom.build_bloom(ref, num_bits=1 << 16, num_hashes=5)
    kept = {r["doc_id"] for r in
            bloom.bloom_dedup_cross(new, filt, num_hashes=5).collect()}
    assert kept == {3}


def test_merge_tree_independent_of_parallelism(spark, corpus):
    """The filter is a pure OR-fold: partition count and leaf fan-in
    must not change a single bit."""
    ref, _ = corpus
    a = bloom.build_bloom(ref.repartition(1), num_bits=1 << 16,
                          num_hashes=5, partials_per_leaf=64)
    b = bloom.build_bloom(ref.repartition(13), num_bits=1 << 16,
                          num_hashes=5, partials_per_leaf=2)
    assert a == b


def test_stats_and_params(spark, corpus):
    ref, _ = corpus
    m, k = 1 << 16, 5
    filt = bloom.build_bloom(ref, num_bits=m, num_hashes=k)
    st = bloom.bloom_stats(filt, k)
    expect_fill = 1.0 - math.exp(-k * 201 / m)
    assert abs(st["fill_fraction"] - expect_fill) < 0.005
    assert st["implied_fpp"] < 1e-9

    mm, kk = bloom.optimal_params(10_000, 0.01)
    assert bloom.expected_fpp(10_000, mm, kk) <= 0.012
    assert mm % 8 == 0 and kk >= 1


def test_empty_build_probe(spark, corpus):
    _, new = corpus
    empty = new.where("doc_id < 0")
    filt = bloom.build_bloom(empty, num_bits=1 << 16, num_hashes=5)
    assert not np.frombuffer(filt, dtype=np.uint8).any()
    assert bloom.bloom_contains(new, filt, num_hashes=5) \
        .where("in_bloom").count() == 0
