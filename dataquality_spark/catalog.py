"""Keyword-based table discovery with a capped schema context.

Graft of the reference's A7/A8 control-plane ops
(/root/reference/agents/unity_sql_agent.py:356-419
`_build_catalog_context`): match the words of a free-text request
against underscore-split table-name tokens, then emit per-table column
context for at most ``cap`` tables (the reference caps at 3 to bound
its prompt; here the cap bounds report size), degrading gracefully to
"schema unavailable" per table. No LLM anywhere — the discovery output
feeds CLI reports and error suggestions instead of a prompt.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import SparkSession


def _words(text: str) -> set[str]:
    return set(re.findall(r"[a-z0-9]+", (text or "").lower()))


def discover_tables(spark: SparkSession, query: str,
                    cap: int = 3) -> list[dict[str, Any]]:
    """Tables whose underscore-split name tokens intersect the query
    words, with column schema for the first ``cap`` matches.

    Returns [{"table", "columns": [{"name", "type"}], ...} |
             {"table", "error"}] — matches beyond the cap are listed
    name-only ({"table"} records), mirroring the reference's
    "table exists but schema omitted" degradation.
    """
    qwords = _words(query)
    matches: list[str] = []
    for db in spark.catalog.listDatabases():
        for t in spark.catalog.listTables(db.name):
            tokens = set((t.name or "").lower().split("_"))
            if tokens & qwords:
                fq = t.name if t.isTemporary else f"{db.name}.{t.name}"
                if fq not in matches:
                    matches.append(fq)
    out: list[dict[str, Any]] = []
    for fq in matches[:cap]:
        try:
            cols = spark.catalog.listColumns(fq)
            out.append({"table": fq,
                        "columns": [{"name": c.name, "type": c.dataType}
                                    for c in cols]})
        except Exception as e:  # keep the name visible, like the reference
            out.append({"table": fq, "error": str(e)[:200]})
    for fq in matches[cap:]:
        out.append({"table": fq})
    return out


def build_context(spark: SparkSession, query: str, cap: int = 3) -> str:
    """The reference's human-readable context string: one block per
    discovered table ("Table: t\\nColumns: a (int), b (string)"), or the
    no-match guidance line."""
    found = discover_tables(spark, query, cap)
    if not found:
        return ("No matching tables. Use only the available tables; "
                "do not assume column names.")
    parts = []
    for rec in found:
        if "columns" in rec:
            cols = ", ".join(f"{c['name']} ({c['type']})"
                             for c in rec["columns"])
            parts.append(f"Table: {rec['table']}\nColumns: {cols}")
        elif "error" in rec:
            parts.append(f"Table: {rec['table']} (schema unavailable)")
        else:
            parts.append(f"Table: {rec['table']} (schema omitted — over "
                         "context cap)")
    return "\n\n".join(parts)


# ---------------------------------------------------------------------------
# Column-type classification (reference A6)
# ---------------------------------------------------------------------------

NUMERIC_TYPE_TOKENS = ("int", "bigint", "float", "double", "decimal")
TEMPORAL_TYPE_TOKENS = ("date", "timestamp")


def classify_columns(columns: list[tuple[str, str]]) -> dict[str, list[str]]:
    """Classify (name, ddl_type) pairs into the reference's buckets.

    Exact semantics of /root/reference/main.py:464-479 (also
    :518-535's live variant): substring match on the lowercased DDL
    type string, numeric checked first (so 'bigint'/'smallint' land
    numeric via the 'int' token and 'decimal(10,2)' via 'decimal'),
    then temporal, then text for 'string'; anything else is left
    unclassified and the 'categorical' bucket stays empty, as the
    reference emits. Spark callers should pass
    ``field.dataType.simpleString()`` — Spark's simpleString vocabulary
    ('bigint', 'int', 'double', 'decimal(p,s)', 'string', 'date',
    'timestamp') is the reference's DDL vocabulary.

    The 12-column demo golden (main.py:449-462 → counts at :498-503)
    is pinned in tests/test_catalog.py::test_classify_demo_golden.
    """
    out: dict[str, list[str]] = {"numeric": [], "temporal": [],
                                 "text": [], "categorical": []}
    for name, ddl_type in columns:
        t = (ddl_type or "").lower()
        if any(tok in t for tok in NUMERIC_TYPE_TOKENS):
            out["numeric"].append(name)
        elif any(tok in t for tok in TEMPORAL_TYPE_TOKENS):
            out["temporal"].append(name)
        elif "string" in t:
            out["text"].append(name)
    return out
