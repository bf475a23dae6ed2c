"""Keyword table discovery + capped context (reference A7/A8 graft)."""

import pandas as pd

from dataquality_spark import catalog


def _mk_views(spark):
    pdf = pd.DataFrame({"a": [1], "b": ["x"]})
    for name in ("pages_raw", "pages_clean", "audit_log",
                 "pages_backup", "unrelated"):
        spark.createDataFrame(pdf).createOrReplaceTempView(name)


def test_discovery_matches_name_tokens(spark):
    _mk_views(spark)
    found = catalog.discover_tables(spark, "show me the raw pages", cap=3)
    names = [r["table"] for r in found]
    assert "pages_raw" in names and "unrelated" not in names
    # token match, not substring: 'audit' only matches on its own word
    assert "audit_log" not in names
    rec = next(r for r in found if r["table"] == "pages_raw")
    assert {c["name"] for c in rec["columns"]} == {"a", "b"}


def test_discovery_cap_degrades_to_name_only(spark):
    _mk_views(spark)
    found = catalog.discover_tables(spark, "pages", cap=2)
    with_schema = [r for r in found if "columns" in r]
    name_only = [r for r in found if set(r) == {"table"}]
    assert len(with_schema) == 2 and len(name_only) >= 1


def test_build_context_string_shape(spark):
    _mk_views(spark)
    ctx = catalog.build_context(spark, "audit of the log", cap=3)
    assert "Table: audit_log" in ctx and "Columns: a (" in ctx
    assert catalog.build_context(spark, "zzz nothing", cap=3).startswith(
        "No matching tables")


def test_classify_demo_golden():
    """The reference's 12-column DESCRIBE-demo classification
    (/root/reference/main.py:449-462 mock schema, :464-479 classifier,
    :498-503 summary counts) — pinned exactly."""
    mock = [
        ("order_id", "bigint"), ("customer_id", "bigint"),
        ("product_id", "string"), ("order_date", "date"),
        ("quantity", "int"), ("unit_price", "decimal(10,2)"),
        ("total_amount", "decimal(12,2)"), ("discount_rate", "double"),
        ("sales_rep", "string"), ("region", "string"),
        ("status", "string"), ("created_timestamp", "timestamp")]
    got = catalog.classify_columns(mock)
    assert got["numeric"] == ["order_id", "customer_id", "quantity",
                              "unit_price", "total_amount",
                              "discount_rate"]
    assert got["temporal"] == ["order_date", "created_timestamp"]
    assert got["text"] == ["product_id", "sales_rep", "region", "status"]
    assert got["categorical"] == []
    # summary counts the reference reports (main.py:498-503)
    assert (len(got["numeric"]), len(got["temporal"]),
            len(got["text"])) == (6, 2, 4)


def test_classify_spark_simple_strings(spark):
    """Spark simpleString vocabulary routes through the same buckets —
    incl. the substring cases (bigint/smallint → 'int',
    decimal(p,s) → 'decimal'); unmatched types stay unclassified."""
    df = spark.range(1).selectExpr(
        "CAST(1 AS BIGINT) a", "CAST(1 AS SMALLINT) b",
        "CAST(1.0 AS DECIMAL(5,2)) c", "CAST('x' AS STRING) d",
        "current_timestamp() e", "CAST(NULL AS BINARY) f",
        "CAST(1 AS BOOLEAN) g")
    got = catalog.classify_columns(
        [(f.name, f.dataType.simpleString()) for f in df.schema.fields])
    assert got["numeric"] == ["a", "b", "c"]
    assert got["temporal"] == ["e"]
    assert got["text"] == ["d"]
    # binary/boolean: no bucket, like the reference
    for v in got.values():
        assert "f" not in v and "g" not in v
