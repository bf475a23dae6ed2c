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
