"""Exact global rank + RRF fusion (operators/ranking.py): rank
bit-identity vs sorted(), partition invariance, NULL placement,
fusion lattice math vs a pure-Python reference."""

import pytest
from pyspark.sql import functions as F

from dataquality_spark.operators import ranking


def _df(spark, rows, parts=1):
    d = spark.createDataFrame(rows, "doc_id long, s1 double, s2 double")
    return d.repartition(parts) if parts > 1 else d


ROWS = [(i, float((i * 37) % 101), float((i * 53 + 7) % 97))
        for i in range(500)]
ROWS[13] = (13, None, 5.0)
ROWS[77] = (77, None, None)


def _ref_rank(rows, idx, descending=True):
    keyed = [(r[idx] is None,
              (-r[idx] if descending else r[idx]) if r[idx] is not None
              else 0.0,
              r[0]) for r in rows]
    return {doc: i + 1
            for i, (_, _, doc) in enumerate(sorted(keyed))}


class TestGlobalRank:
    def test_matches_sorted_reference_and_partitioning(self, spark):
        ref = _ref_rank(ROWS, 1)
        for parts in (1, 13):
            got = {r.doc_id: r["rank"] for r in ranking.global_rank(
                _df(spark, ROWS, parts), "doc_id", "s1").collect()}
            assert got == ref
        asc = {r.doc_id: r["rank"] for r in ranking.global_rank(
            _df(spark, ROWS), "doc_id", "s1",
            descending=False).collect()}
        assert asc == _ref_rank(ROWS, 1, descending=False)

    def test_nulls_rank_last_in_id_order(self, spark):
        got = {r.doc_id: r["rank"] for r in ranking.global_rank(
            _df(spark, ROWS), "doc_id", "s1").collect()}
        assert sorted((got[13], got[77])) == [499, 500]
        assert got[13] < got[77]  # id tie-break among NULLs

    def test_explicit_partition_count(self, spark):
        ref = _ref_rank(ROWS, 1)
        got = {r.doc_id: r["rank"] for r in ranking.global_rank(
            _df(spark, ROWS), "doc_id", "s1", partitions=7).collect()}
        assert got == ref


class TestRankFusion:
    def test_rrf_lattice_reference(self, spark):
        r1, r2 = _ref_rank(ROWS, 1), _ref_rank(ROWS, 2)
        k, scale = 60, 1_000_000_000
        ref = {d: scale // (k + r1[d]) + scale // (k + r2[d])
               for d, *_ in ROWS}
        out = ranking.rank_fusion(_df(spark, ROWS, 5), "doc_id",
                                  ["s1", "s2"]).collect()
        got = {r.doc_id: r.rrf for r in out}
        assert got == ref
        cols = out[0].asDict()
        assert {"doc_id", "rank_s1", "rank_s2", "rrf"} <= set(cols)

    def test_single_signal_is_monotone_in_rank(self, spark):
        out = ranking.rank_fusion(_df(spark, ROWS), "doc_id",
                                  ["s1"]).collect()
        by_rank = sorted(out, key=lambda r: r.rank_s1)
        rrfs = [r.rrf for r in by_rank]
        assert rrfs == sorted(rrfs, reverse=True)

    def test_validation(self, spark):
        df = _df(spark, ROWS)
        with pytest.raises(ValueError):
            ranking.rank_fusion(df, "doc_id", [])
        with pytest.raises(ValueError):
            ranking.rank_fusion(df, "doc_id", ["s1"], k=0)
