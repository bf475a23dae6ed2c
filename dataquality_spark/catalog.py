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
