"""Error classification (reference A22 analog, unity_sql_agent.py:628-659)."""

from dataquality_spark.errors import classify_error, format_error_response


def test_known_categories():
    cases = {
        "Path does not exist: file:/x": "input_not_found",
        "[TABLE_OR_VIEW_NOT_FOUND] The table x cannot be found":
            "table_not_found",
        "cannot resolve 'warc_ts' given input columns": "schema_mismatch",
        "Cannot cast STRING to TIMESTAMP": "type_mismatch",
        "java.lang.OutOfMemoryError: Java heap space": "out_of_memory",
        "PythonException: worker crashed": "python_worker",
    }
    for msg, want in cases.items():
        got, suggestions = classify_error(msg)
        assert got == want, (msg, got)
        assert suggestions


def test_unknown_gets_default_suggestions():
    cat, sugg = classify_error("some novel failure")
    assert cat == "unknown" and len(sugg) >= 2


def test_format_error_response_shape():
    r = format_error_response(ValueError("pages input is missing columns"),
                              job="run_pipeline", context={"input": "/x"})
    assert r["success"] is False and r["job"] == "run_pipeline"
    assert r["category"] == "schema_mismatch" and r["input"] == "/x"
