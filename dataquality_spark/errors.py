"""Structured error classification with actionable suggestions.

Graft of the reference's error formatter
(/root/reference/agents/unity_sql_agent.py:628-659
`_format_error_response`: substring-classify the failure, attach
spelling/access/qualification suggestions plus example tables) onto the
Spark engine's failure modes. CLI jobs print this as their one JSON
error line, so an operator reading the log gets a category and the next
thing to try — not a raw JVM stack.

Deterministic: no wall clock, no environment reads.
"""

from __future__ import annotations

from typing import Any

# (category, [substrings to match in the lowered message], [suggestions])
_RULES: list[tuple[str, list[str], list[str]]] = [
    ("input_not_found",
     ["path does not exist", "no such file", "filenotfound",
      "unable to infer schema"],
     ["Check the --input path spelling",
      "Verify the parquet/Iceberg table exists and is readable",
      "For Iceberg ids use catalog.db.table; for files pass a directory "
      "of parquet"]),
    ("table_not_found",
     ["table or view not found", "table_or_view_not_found",
      "cannot be found"],
     ["Check table name spelling",
      "Verify the catalog is configured (see sources/io.py DDL spec)",
      "Use fully qualified names: catalog.schema.table"]),
    ("schema_mismatch",
     ["missing columns", "unresolved column", "cannot resolve",
      "unable to resolve"],
     ["The pages input must have columns (url, warc_ts, html, text, "
      "lang)",
      "Run jobs/healthcheck.py --input <path> to see the columns found",
      "Rename/alias source columns before invoking the pipeline"]),
    ("type_mismatch",
     ["cannot cast", "datatype mismatch", "cannot be cast"],
     ["Check column types against the input contract "
      "(warc_ts timestamp, html binary, text string)",
      "Cast explicitly in a select() before the pipeline"]),
    ("out_of_memory",
     ["outofmemory", "java heap space", "spill", "buffer overflow"],
     ["Lower spark.sql.files.maxPartitionBytes so scan partitions "
      "shrink",
      "Raise spark.sql.shuffle.partitions",
      "Check for a skewed host key — enable salt_repartition"]),
    ("python_worker",
     ["pythonexception", "pandas_udf", "arrow", "worker crashed"],
     ["Check executor python has numpy/pandas at matching versions",
      "Lower spark.sql.execution.arrow.maxRecordsPerBatch",
      "Run jobs/healthcheck.py to probe the model cores in isolation"]),
]

_DEFAULT_SUGGESTIONS = [
    "Re-run jobs/healthcheck.py for component-level status",
    "Check the driver log for the first FAILED stage",
    "Try the same input at a smaller scale factor",
]


def classify_error(error: str) -> tuple[str, list[str]]:
    """(category, suggestions) for an error message."""
    low = (error or "").lower()
    for category, needles, suggestions in _RULES:
        if any(n in low for n in needles):
            return category, list(suggestions)
    return "unknown", list(_DEFAULT_SUGGESTIONS)


def format_error_response(error: Exception | str,
                          job: str,
                          context: dict[str, Any] | None = None
                          ) -> dict[str, Any]:
    """One structured error record (the reference's shape minus the
    wall-clock timestamp: success flag, original error, category,
    suggestions, plus job context)."""
    msg = str(error)
    category, suggestions = classify_error(msg)
    return {
        "success": False,
        "job": job,
        "error": msg[:500],
        "category": category,
        "suggestions": suggestions,
        **(context or {}),
    }
