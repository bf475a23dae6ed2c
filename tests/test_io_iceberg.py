"""Iceberg DDL spec + parquet-fallback equivalence.

The Iceberg execution test is gated on the runtime being present (no
jars in the sandbox ⇒ skipped, green on a real cluster); the fallback
tests always run and pin the equivalence the module docstring claims:
same partition-pruning semantics via the partition_id directory layout,
idempotent dynamic-partition overwrite.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataquality_spark import config as C
from dataquality_spark.sources import iceberg_spec, io


def test_ddl_spec_is_wellformed():
    """The committed DDL pins the scale layout: days(warc_ts) pruning +
    url bucketing on both big tables, format v2, zstd."""
    for name, ddl in iceberg_spec.ALL_DDL.items():
        assert "USING iceberg" in ddl
        assert "{fq}." + name in ddl
    for big in ("pages", "decisions"):
        ddl = iceberg_spec.ALL_DDL[big]
        assert "days(warc_ts)" in ddl and "bucket(64, url)" in ddl
        assert "'format-version' = '2'" in ddl
    assert "PARTITIONED BY (partition_id)" in iceberg_spec.ALL_DDL["audit"]


def test_create_tables_raises_without_runtime(spark):
    if io.iceberg_available(spark):
        pytest.skip("Iceberg runtime present — covered by the gated test")
    with pytest.raises(RuntimeError, match="parquet"):
        iceberg_spec.create_tables(spark, "ice", "dq")


def test_iceberg_tables_roundtrip(spark, pages_sdf):
    """Runs ONLY where iceberg-spark-runtime is on the classpath: create
    the three tables from the committed DDL, write a pages batch, read
    back with a days() pruning predicate."""
    if not io.iceberg_available(spark):
        pytest.skip("no Iceberg runtime on classpath (sandbox)")
    spark.conf.set("spark.sql.catalog.ice",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", "/tmp/dq_ice_wh")
    ids = iceberg_spec.create_tables(spark, "ice", "dq")
    assert set(t.split(".")[-1] for t in ids) == {"pages", "decisions",
                                                 "audit"}
    pages_sdf.writeTo("ice.dq.pages").append()
    got = (spark.read.table("ice.dq.pages")
           .filter(F.col("warc_ts") >= "2024-08-01").count())
    assert got > 0


def test_parquet_fallback_prunes_and_overwrites(spark, pages_sdf,
                                                tmp_path):
    """Fallback equivalence: partition_id directory layout prunes reads;
    dynamic-partition overwrite converges on rewrite (idempotent
    resume) instead of duplicating."""
    out = str(tmp_path / "decisions")
    df = pages_sdf.withColumn(
        C.PARTITION_COL, F.date_format("warc_ts", "yyyy-MM"))
    io.write_decisions(df, out)
    pids = [r[0] for r in
            df.select(C.PARTITION_COL).distinct().collect()]
    one = sorted(pids)[0]
    pruned = spark.read.parquet(out).filter(F.col(C.PARTITION_COL) == one)
    # partition filter reaches the source as a partition-directory prune
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(partition_id" in plan
    n_before = pruned.count()
    # rewrite the SAME partition: dynamic overwrite must not duplicate
    io.write_decisions(df.filter(F.col(C.PARTITION_COL) == one), out)
    assert spark.read.parquet(out).filter(
        F.col(C.PARTITION_COL) == one).count() == n_before
    assert spark.read.parquet(out).count() == df.count()
