"""spark-submit entry point: six-pillar quality profile of any table.

    spark-submit jobs/profile.py --input /data/t.parquet \
        [--columns a,b,c] [--ts-col warc_ts] [--approx] [--output DIR]

The grafted equivalent of the reference's canonical assessment flow
(`python main.py assess <table>` → row count + duplicate check,
/root/reference/main.py:86-124, and the completeness UNION-ALL query,
README.md:162-176) — one scan per pillar instead of one scan per column.
Prints a JSON report; optionally writes the per-pillar frames.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataquality_spark.operators import profile  # noqa: E402
from dataquality_spark.session import get_spark  # noqa: E402


def run(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path or catalog table")
    ap.add_argument("--columns", default=None,
                    help="comma-separated subset for uniqueness profiling")
    ap.add_argument("--ts-col", default=None,
                    help="timestamp column for drift/timeliness pillars")
    ap.add_argument("--value-col", default=None,
                    help="numeric column for the drift metric")
    ap.add_argument("--text-col", default=None,
                    help="text column for the repetition pillar "
                         "(default: first string column)")
    ap.add_argument("--approx", action="store_true",
                    help="HLL distinct counts (the 10^12-row setting)")
    ap.add_argument("--output", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("dq-profile", master=args.master)
    if args.input.endswith(".parquet") or "/" in args.input:
        df = spark.read.parquet(args.input)
    else:
        df = spark.read.table(args.input)

    cols = (args.columns.split(",") if args.columns else df.columns)
    report: dict = {"input": args.input, "n_columns": len(df.columns)}

    comp = profile.completeness_profile(df)
    report["completeness"] = {
        r["column_name"]: r["completeness_pct"] for r in comp.collect()}

    uniq = profile.uniqueness_profile(df, cols, approx=args.approx)
    report["uniqueness"] = uniq.collect()[0].asDict()

    if args.ts_col and args.value_col:
        drift = profile.drift_monthly(df, args.ts_col, args.value_col)
        report["drift"] = [r.asDict() for r in drift.collect()]

    # numeric distribution pillar: quartiles per numeric column —
    # exact via the distributed-histogram operator, or the
    # approx_percentile sketch under --approx (the 10^12-row setting).
    # Column buckets come from the reference-semantics A6 classifier
    # (catalog.classify_columns, golden-pinned in test_catalog).
    from dataquality_spark import catalog

    classified = catalog.classify_columns(
        [(f.name, f.dataType.simpleString()) for f in df.schema.fields
         if f.name in cols])
    report["column_classification"] = classified
    numeric = classified["numeric"]
    if numeric:
        spec = {c: [(0.25, f"{c}_p25"), (0.5, f"{c}_p50"),
                    (0.75, f"{c}_p75")] for c in numeric[:8]}
        pct = profile.exact_percentiles(df, spec, approx=args.approx)
        report["percentiles"] = pct.collect()[0].asDict()

    # text-repetition pillar (uniqueness dimension at sub-document
    # granularity): Gopher top-2-gram fraction + duplicate-line stats
    # for the first string column — both zero-shuffle projections
    text_cols = classified["text"]
    if args.text_col or text_cols:
        tc = args.text_col or text_cols[0]
        from pyspark.sql import functions as F

        from dataquality_spark.operators import curation, text_analysis
        rep = (text_analysis.top_ngram_frac(
                   curation.dedupe_lines(df, tc), tc)
               .agg(F.round(F.avg("top_ngram_frac"), 6)
                    .alias("avg_top_2gram_frac"),
                    F.round(F.max("top_ngram_frac"), 6)
                    .alias("max_top_2gram_frac"),
                    F.round(F.avg("dup_line_frac"), 6)
                    .alias("avg_dup_line_frac"),
                    F.sum((F.col("dup_line_frac") > 0.3).cast("long"))
                    .alias("n_docs_dup_lines_gt_30pct")))
        report["repetition"] = {"column": tc,
                                **rep.collect()[0].asDict()}

    if args.output:
        comp.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(args.output, "completeness"))

    print(json.dumps(report, default=str))
    return report


if __name__ == "__main__":
    run()
