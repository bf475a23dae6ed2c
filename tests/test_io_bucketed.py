"""Bucketed-table layout (sources/io.write_bucketed): the co-located
join — proven from the EXECUTED PLAN (zero Exchange between two
same-bucketed tables), with the plain-parquet join as the positive
control (it must shuffle)."""

import uuid

from pyspark.sql import functions as F

from dataquality_spark.sources import io


def _plan(df) -> str:
    df.collect()  # force AQE to finalize
    return df._jdf.queryExecution().executedPlan().toString()


def _mk(spark, tmp_path, n_buckets):
    sfx = uuid.uuid4().hex[:8]
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("score"))
    labels = spark.range(0, 2000, 3).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2 == 0).alias("keep"))
    names = (f"docs_b_{sfx}", f"labels_b_{sfx}")
    io.write_bucketed(docs, names[0], "doc_id", n_buckets,
                      path=str(tmp_path / names[0]))
    io.write_bucketed(labels, names[1], "doc_id", n_buckets,
                      path=str(tmp_path / names[1]))
    return names


class TestWriteBucketed:
    def test_bucketed_join_elides_exchange(self, spark, tmp_path):
        # disable broadcast so the planner must consider the shuffle
        # join — the bucketed layout then removes BOTH side's Exchange
        # (with broadcast on, small tables just broadcast and bucketing
        # is "disabled by query planner": also fine, but proves nothing)
        a, b = _mk(spark, tmp_path, 8)
        j = spark.table(a).join(spark.table(b), "doc_id")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(j)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert j.count() == 667  # range(0,2000,3)

    def test_unbucketed_control_shuffles(self, spark, tmp_path):
        # the same join over plain parquet MUST contain an Exchange —
        # otherwise the elision assertion above proves nothing
        docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
        labels = spark.range(0, 2000, 3).select(
            F.col("id").alias("doc_id"))
        p1, p2 = str(tmp_path / "p1"), str(tmp_path / "p2")
        docs.write.parquet(p1)
        labels.write.parquet(p2)
        j = spark.read.parquet(p1).join(spark.read.parquet(p2), "doc_id")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(j)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "Exchange" in plan

    def test_bucketed_groupby_elides_exchange(self, spark, tmp_path):
        a, _ = _mk(spark, tmp_path, 8)
        g = spark.table(a).groupBy("doc_id").agg(F.sum("score"))
        plan = _plan(g)
        assert "Exchange" not in plan, plan

    def test_mismatched_bucket_counts_still_correct(self, spark,
                                                    tmp_path):
        # different bucket counts: correctness holds (Spark may
        # re-shuffle one side); this pins the semantics, not the plan
        sfx = uuid.uuid4().hex[:8]
        d1 = spark.range(0, 100).select(F.col("id").alias("doc_id"))
        d2 = spark.range(0, 100, 2).select(F.col("id").alias("doc_id"))
        io.write_bucketed(d1, f"m1_{sfx}", "doc_id", 4,
                          path=str(tmp_path / "m1"))
        io.write_bucketed(d2, f"m2_{sfx}", "doc_id", 8,
                          path=str(tmp_path / "m2"))
        j = spark.table(f"m1_{sfx}").join(spark.table(f"m2_{sfx}"),
                                          "doc_id")
        assert j.count() == 50

    def test_validation(self, spark):
        import pytest
        df = spark.range(1).select(F.col("id").alias("doc_id"))
        with pytest.raises(ValueError):
            io.write_bucketed(df, "bad", "doc_id", 0)
