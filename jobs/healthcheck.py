"""spark-submit entry point: pipeline health check.

    python jobs/healthcheck.py [--input pages.parquet] [--master local[4]]

The graft of the reference's health aggregator
(/root/reference/main.py:154-207 — compose component healths, degrade on
any failure) and connection probe (unity_sql_agent.py:217-223 —
`SELECT 1 as test`): probes the session, the model cores, the input
schema, and a 100-doc smoke run of the decision pipeline, then prints
one JSON status line with per-component health and exits non-zero if
any component is degraded.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataquality_spark import pipeline, synth  # noqa: E402
from dataquality_spark.session import get_spark  # noqa: E402
from dataquality_spark.sources import io  # noqa: E402


def run(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None,
                    help="pages parquet/table to schema-check (optional)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    components: dict[str, dict] = {}

    def check(name):
        def deco(fn):
            t0 = time.monotonic()
            try:
                detail = fn()
                components[name] = {
                    "status": "healthy",
                    "latency_ms": round(1000 * (time.monotonic() - t0), 1),
                    **(detail or {})}
            except Exception as e:  # degrade, keep probing the rest
                components[name] = {"status": "unhealthy",
                                    "error": str(e)[:200]}
        return deco

    spark = get_spark("dq-healthcheck", master=args.master)

    @check("session")
    def _probe():
        row = spark.sql("SELECT 1 as test").collect()[0]
        assert row["test"] == 1

    @check("models")
    def _models():
        import pandas as pd

        from dataquality_spark.functions import langid, lm, scrub
        p, s = langid.score_texts(pd.Series(["the data of the value"]))
        ppl = lm.perplexity(pd.Series(["the data of the value"]))
        out, hits = scrub.scrub_one("mail a@b.co now")
        assert p[0] and ppl[0] > 0 and "<EMAIL>" in out
        return {"langid_pred": str(p[0])}

    @check("catalog")
    def _catalog():
        # A2/A3 analog (reference unity_sql_agent.py:72-86 lists
        # schemas/tables; get_health_status reports catalog counts):
        # enumerate databases and tables visible to this session.
        dbs = [d.name for d in spark.catalog.listDatabases()]
        tables = [t.name for db in dbs
                  for t in spark.catalog.listTables(db)]
        return {"databases": dbs, "tables_count": len(tables),
                "tables": tables[:5]}

    @check("input_schema")
    def _schema():
        if args.input is None:
            return {"skipped": True}
        df = io.read_pages(spark, args.input)
        pipeline.assert_schema(df)
        return {"columns": df.columns}

    @check("pipeline_smoke")
    def _smoke():
        pages = synth.gen_pages(100, seed=3)[
            ["url", "warc_ts", "html", "text", "lang"]]
        out = pipeline.decisions(spark.createDataFrame(pages))
        n = out.count()
        assert n == 100
        return {"n_docs": n}

    healthy = all(c["status"] == "healthy" for c in components.values())
    report = {"status": "healthy" if healthy else "degraded",
              "components": components}
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    sys.exit(0 if run()["status"] == "healthy" else 1)
