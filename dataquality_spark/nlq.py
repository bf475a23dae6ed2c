"""Natural-language → Spark-SQL planning, deterministically (A20).

Graft of the reference's NL→SQL generation flow
(/root/reference/agents/unity_sql_agent.py:284-354 `_generate_sql`):
catalog context → schema-availability validation → {sql, explanation,
confidence} → generated-SQL validation → execution → formatting. The
reference delegates the middle step to an LLM prompt whose 8 safety
rules (:319-329) demand: only listed tables, only listed columns, never
invent identifiers, LIMIT unless aggregating, no destructive ops. Here
the generation step is a DETERMINISTIC intent grammar over the engine's
implemented quality operators — the 8 prompt rules become code
invariants instead of prompt text, so the answer is reproducible, needs
no network, and can be value-checked against a SQL oracle (something an
LLM step never could). No LLM anywhere, matching SURVEY §2.A's design
note that rules are compiled, not generated.

Flow parity map:

* catalog context        → catalog.discover_tables (A7/A8)
* schema validation      → resolve_columns (never invents a name)
* generate {sql, explanation, confidence} → INTENTS grammar + templates
* validate generated SQL → _FORBIDDEN guard + identifier re-check
  (unity_sql_agent.py:127-159 analog)
* execute + format       → answer() (A14/A21), errors via
  errors.format_error_response (A22)

Scale note: templates emit single-scan aggregates (stack() unpivot, not
per-column UNION fan-out) and inject LIMIT on every non-aggregating
SELECT, so an NL question can't accidentally materialize a 10^12-row
result.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import SparkSession

from . import catalog as cat
from . import errors as err

MAX_ROWS = 1000

# Reference forbidden-operations guard (unity_sql_agent.py:127-159):
# by construction the templates below can never produce these, but the
# final validation re-checks anyway, exactly like the reference
# re-validates its LLM output.
_FORBIDDEN = re.compile(
    r"\b(drop|delete|alter|insert|update|truncate|create|grant|revoke|"
    r"merge)\b", re.IGNORECASE)

_IDENT_OK = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _q(ident: str) -> str:
    """Backtick-quote a VALIDATED identifier. Identifiers reach here
    only from the table's own schema or the session catalog, and are
    shape-checked besides — user text can never inject SQL."""
    if not _IDENT_OK.match(ident.replace(".", "")):
        raise ValueError(f"unsafe identifier: {ident!r}")
    return ".".join(f"`{p}`" for p in ident.split("."))


# ---------------------------------------------------------------------------
# Intent grammar
# ---------------------------------------------------------------------------

# (intent, trigger words, needs) — first match wins, so more specific
# intents sit above the generic profile fallback.
INTENTS: list[tuple[str, set[str], str]] = [
    ("orphans", {"orphan", "orphans", "referential", "unmatched"}, "two"),
    # Curation-family intents (reference CaseStudy.md:896-974 worked
    # examples): duplicate-rate stats (the NL twin of exact_dedup) and
    # the per-source quality report (group_quality_report's shape).
    # dup_rate also fires on the compound "duplicate(s) + rate/fraction"
    # phrasing — see _match_intent.
    ("dup_rate", {"dedup", "redundancy"}, "text"),
    ("source_report", {"report"}, "text"),
    ("completeness", {"complete", "completeness", "null", "nulls",
                      "missing", "empty"}, "none"),
    ("uniqueness", {"unique", "uniqueness", "duplicate", "duplicates",
                    "distinct"}, "none"),
    ("validity", {"valid", "validity", "range", "negative", "invalid",
                  "outlier", "outliers"}, "numeric"),
    ("timeliness", {"timeliness", "stale", "fresh", "recent", "latest",
                    "oldest"}, "temporal"),
    ("drift", {"drift", "trend", "monthly", "month"}, "temporal"),
    ("topk", {"top", "largest", "highest", "biggest"}, "numeric"),
    ("sample", {"sample", "show", "preview", "peek"}, "none"),
    ("rowcount", {"count", "rows", "many", "size"}, "none"),
    ("profile", {"profile", "quality", "assess", "health",
                 "overview"}, "none"),
]

_SUPPORTED = ", ".join(i for i, _, _ in INTENTS)

# Compound phrasing: "duplicate rate", "fraction of dupes", … — the
# single-word triggers alone would route these to uniqueness.
_DUP_WORDS = {"duplicate", "duplicates", "dup", "dupes", "dedup"}
_RATE_WORDS = {"rate", "fraction", "percent", "percentage", "share",
               "ratio"}

# When the question names no column, fall back to a conventionally-
# named one before pool order (confidence still degrades to 0.8): the
# duplicate rate wants the CONTENT column, the per-group report wants
# the GROUPING column.
_FALLBACK_PREF: dict[str, tuple[str, ...]] = {
    "dup_rate": ("text", "body", "content", "html"),
    "source_report": ("source", "host", "domain", "site", "category",
                      "lang"),
}


def _match_intent(question: str) -> str | None:
    words = cat._words(question)
    if (_DUP_WORDS & words) and (_RATE_WORDS & words):
        return "dup_rate"
    for intent, triggers, _ in INTENTS:
        if triggers & words:
            return intent
    return None


def resolve_columns(question: str,
                    columns: list[dict[str, str]]) -> list[str]:
    """Columns of the TABLE SCHEMA that the question mentions — exact
    name or any underscore token (so 'orderkey' finds l_orderkey).
    Never returns a name absent from the schema (reference prompt rules
    5-6: do not guess, assume, or invent column names)."""
    words = cat._words(question)
    hits = []
    for c in columns:
        toks = _col_tokens(c["name"])
        if toks & words:
            hits.append(c["name"])
    return hits


def _col_tokens(name: str) -> set[str]:
    """Matchable tokens of a column name: the full name plus its
    underscore parts of length ≥ 2 — single-letter TPC-H-style prefixes
    (o_, l_, c_) would otherwise make every column of the table match
    any question that mentions one of them."""
    return ({t for t in name.lower().split("_") if len(t) >= 2}
            | {name.lower()})


def _k_from(question: str, default: int = 10) -> int:
    m = re.search(r"\b(\d+)\b", question)
    return min(int(m.group(1)), MAX_ROWS) if m else default


def _error(msg: str, suggestion: str) -> dict[str, Any]:
    return {"error": msg, "suggestion": suggestion}


def plan(spark: SparkSession, question: str) -> dict[str, Any]:
    """NL question → {sql, explanation, confidence, table, intent} or
    {error, suggestion} — the deterministic analog of the reference's
    `_generate_sql` return shape (unity_sql_agent.py:335-340, :300-306).
    """
    found = [t for t in cat.discover_tables(spark, question, cap=3)
             if "columns" in t]
    # Question order, not catalog order: "orphans in orders vs customer"
    # makes orders the anti-join left side.
    low = question.lower()

    def _pos(rec: dict[str, Any]) -> int:
        name = rec["table"].split(".")[-1].lower()
        i = low.find(name)
        return i if i >= 0 else len(low)

    found.sort(key=_pos)
    if not found:
        names = sorted({t.name for db in spark.catalog.listDatabases()
                        for t in spark.catalog.listTables(db.name)})
        return _error(
            "No table in the question matches the catalog.",
            f"Name one of the available tables: {', '.join(names)}"
            if names else "Register the corpus tables first.")
    intent = _match_intent(question)
    if intent is None:
        return _error(
            "Could not map the question to a supported quality check.",
            f"Ask about one of: {_SUPPORTED}.")

    table = found[0]["table"]
    # Only well-formed identifiers ever reach a template (they appear
    # both backtick-quoted and as string literals): a hostile or exotic
    # column name is excluded here rather than trusted downstream, and
    # plan() degrades to {error, suggestion} instead of raising.
    cols = [c for c in found[0]["columns"] if _IDENT_OK.match(c["name"])]
    if not cols:
        return _error(f"{table} has no addressable columns.",
                      "Column names must be plain identifiers.")
    classified = cat.classify_columns(
        [(c["name"], c["type"]) for c in cols])
    mentioned = resolve_columns(question, cols)
    needs = next(n for i, _, n in INTENTS if i == intent)

    confidence = 0.95
    if needs in ("numeric", "temporal", "text"):
        pool = classified[needs]
        picked = [c for c in mentioned if c in pool]
        if picked:
            col = picked[0]
        elif pool:
            pref = _FALLBACK_PREF.get(intent, ())
            col = next((p for p in pref if p in pool), pool[0])
            confidence = 0.8  # defaulted, like rule 7's
            # "get schema first" degradation — flagged via confidence
        else:
            return _error(
                f"{table} has no {needs} column for a {intent} check.",
                f"Columns: " + ", ".join(c["name"] for c in cols))

    t = _q(table)
    if intent in ("completeness", "profile"):
        n = len(cols)
        entries = ", ".join(
            f"'{c['name']}', CASE WHEN _n = 0 THEN 1.0 "
            f"ELSE _c_{i} / _n END" for i, c in enumerate(cols))
        counts = ", ".join(
            f"CAST(count({_q(c['name'])}) AS DOUBLE) AS _c_{i}"
            for i, c in enumerate(cols))
        sql = (f"SELECT stack({n}, {entries}) AS (column, completeness) "
               f"FROM (SELECT CAST(count(*) AS DOUBLE) AS _n, {counts} "
               f"FROM {t})")
        explanation = (f"Non-null ratio per column of {table} in one "
                       f"scan (single aggregate + stack unpivot).")
    elif intent == "dup_rate":
        qc = _q(col)
        h = f"md5(coalesce({qc}, ''))"
        sql = (f"SELECT count(*) AS n_rows, "
               f"count(DISTINCT {h}) AS n_unique_texts, "
               f"CASE WHEN count(*) = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
               f"CAST(count(*) - count(DISTINCT {h}) AS DOUBLE) "
               f"/ count(*) END AS dup_rate FROM {t}")
        explanation = (f"Exact duplicate rate of {table}.{col}: share of "
                       f"rows whose content hash repeats an earlier "
                       f"row's (one hash aggregate — the NL twin of the "
                       f"exact_dedup operator).")
    elif intent == "source_report":
        qg = _q(col)
        content_pool = [c for c in classified["text"] if c != col]
        content = next((p for p in ("text", "body", "content", "html")
                        if p in content_pool),
                       content_pool[0] if content_pool else None)
        if content is None:
            sql = (f"SELECT {qg}, count(*) AS n_docs FROM {t} "
                   f"GROUP BY {qg} ORDER BY {qg}")
            explanation = (f"Per-{col} document counts of {table} (no "
                           f"second text column for content stats).")
        else:
            qc = _q(content)
            h = f"md5(coalesce({qc}, ''))"
            sql = (f"SELECT {qg}, count(*) AS n_docs, "
                   f"count(DISTINCT {h}) AS n_unique_texts, "
                   f"CAST(count(*) - count(DISTINCT {h}) AS DOUBLE) "
                   f"/ count(*) AS dup_rate, "
                   f"CAST(sum(length(coalesce({qc}, ''))) AS DOUBLE) "
                   f"/ count(*) AS avg_chars "
                   f"FROM {t} GROUP BY {qg} ORDER BY {qg}")
            explanation = (f"Per-{col} quality report of {table}: doc "
                           f"count, distinct-{content} count, duplicate "
                           f"rate, mean length (the NL twin of "
                           f"group_quality_report).")
    elif intent == "uniqueness":
        targets = mentioned or [c["name"] for c in cols[:1]]
        if not mentioned:
            confidence = 0.8
        sel = ", ".join(
            f"count(DISTINCT {_q(c)}) AS distinct_{c}" for c in targets)
        sql = f"SELECT count(*) AS n_rows, {sel} FROM {t}"
        explanation = (f"Distinct counts vs total rows for "
                       f"{', '.join(targets)} of {table}.")
    elif intent == "validity":
        qc = _q(col)
        sql = (f"SELECT min({qc}) AS min_{col}, max({qc}) AS max_{col}, "
               f"sum(CASE WHEN {qc} < 0 THEN 1 ELSE 0 END) "
               f"AS negative_count FROM {t}")
        explanation = f"Range and negative-value check on {table}.{col}."
    elif intent == "timeliness":
        qc = _q(col)
        sql = (f"SELECT min({qc}) AS earliest, max({qc}) AS latest, "
               f"count(*) AS n_rows FROM {t}")
        explanation = f"Recency window of {table}.{col}."
    elif intent == "drift":
        qc = _q(col)
        # Parameterized measure: a question-mentioned numeric column
        # adds its monthly mean — on a cents lattice (BIGINT sum ÷ 100
        # ÷ count) so the mean is order-free under any partitioning,
        # the same trick the drift_monthly operator uses.
        nums = [c for c in mentioned
                if c in classified["numeric"] and c != col]
        extra = ""
        if nums:
            qn = _q(nums[0])
            extra = (f", CASE WHEN count({qn}) = 0 THEN NULL ELSE "
                     f"sum(CAST(round({qn} * 100, 0) AS BIGINT)) "
                     f"/ CAST(100 AS DOUBLE) / count({qn}) END "
                     f"AS avg_{nums[0]}")  # DOUBLE division — a bare
            # 100.0 literal would make Spark divide on DECIMAL(38,17),
            # which rounds the quotient to scale 6 before the second
            # divide and types differently from every SQL oracle
        sql = (f"SELECT date_format({qc}, 'yyyy-MM') AS month, "
               f"count(*) AS n_rows{extra} FROM {t} "
               f"GROUP BY 1 ORDER BY 1")
        explanation = (f"Monthly volume trend of {table} over {col}"
                       + (f" with mean {nums[0]}." if nums else "."))
    elif intent == "topk":
        k = _k_from(question)
        sql = (f"SELECT * FROM {t} ORDER BY {_q(col)} DESC "
               f"LIMIT {k}")
        explanation = f"Top {k} rows of {table} by {col}."
    elif intent == "rowcount":
        sql = f"SELECT count(*) AS n_rows FROM {t}"
        explanation = f"Row count of {table}."
    elif intent == "sample":
        k = _k_from(question)
        sql = f"SELECT * FROM {t} LIMIT {k}"
        explanation = f"First {k} rows of {table} (LIMIT guard)."
    else:  # orphans — needs two tables sharing a column name
        with_schema = [f for f in found if "columns" in f]
        if len(with_schema) < 2:
            return _error(
                "An orphan check needs two tables named in the question.",
                "Name both sides, e.g. 'orphans in orders vs customer'.")
        t2rec = with_schema[1]
        # Key detection by shared name token (length ≥ 2), so TPC-H
        # style o_custkey ↔ c_custkey pairs join as naturally as
        # identical names. Question-mentioned tokens win.
        words = cat._words(question)

        def _stem(name: str) -> str:  # widgets → widget
            n = name.split(".")[-1].lower()
            return n[:-1] if n.endswith("s") else n

        l_stem, r_stem = _stem(table), _stem(t2rec["table"])
        t2cols = [c for c in t2rec["columns"]
                  if _IDENT_OK.match(c["name"])]
        pairs = []  # (score, left_col, right_col)
        for c1 in cols:
            for c2 in t2cols:
                common = _col_tokens(c1["name"]) & _col_tokens(c2["name"])
                if not common:
                    continue
                # FK-naming signal: a column carrying the OTHER table's
                # stem (sales.widget_id → widgets) outranks a generic
                # shared 'id'; a question-mentioned token outranks both.
                score = max(len(t) for t in common)
                if r_stem in _col_tokens(c1["name"]) \
                        or l_stem in _col_tokens(c2["name"]):
                    score += 100
                if common & words:
                    score += 1000
                pairs.append((score, c1["name"], c2["name"]))
        if not pairs:
            return _error(
                f"{table} and {t2rec['table']} share no column-name "
                f"token to join on.",
                "Orphan checks need a common key, e.g. custkey.")
        _, lcol, rcol = max(pairs)
        t2 = _q(t2rec["table"])
        sql = (f"SELECT count(*) AS orphan_rows FROM {t} a "
               f"LEFT ANTI JOIN {t2} b ON a.{_q(lcol)} = b.{_q(rcol)}")
        explanation = (f"Rows of {table} whose {lcol} has no match in "
                       f"{t2rec['table']}.{rcol} (anti-join).")

    # Final validation of the generated SQL, mirroring the reference's
    # re-validation of LLM output (unity_sql_agent.py:344-351).
    if _FORBIDDEN.search(sql):
        return _error("Generated SQL failed the safety re-check.",
                      "This is a bug — the grammar emitted a forbidden "
                      "operation.")
    return {"sql": sql, "explanation": explanation,
            "confidence": confidence, "table": table, "intent": intent}


def answer(spark: SparkSession, question: str,
           max_rows: int = MAX_ROWS) -> dict[str, Any]:
    """Plan, execute, format — the reference's full ask→result loop
    (`_generate_sql` → `execute_query` → result formatting,
    unity_sql_agent.py:209-282) with the A21 result shape."""
    p = plan(spark, question)
    if "error" in p:
        return {"status": "error", **p}
    try:
        df = spark.sql(p["sql"])
        rows = df.limit(max_rows).collect()
    except Exception as e:
        return {"status": "error",
                **err.format_error_response(e, job="nlq",
                                            context={"sql": p["sql"]})}
    return {"status": "success", "sql": p["sql"],
            "explanation": p["explanation"],
            "confidence": p["confidence"], "intent": p["intent"],
            "table": p["table"], "columns": list(df.columns),
            "rows": [list(r) for r in rows], "row_count": len(rows)}
