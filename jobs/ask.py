"""spark-submit entry point: ask a data-quality question in English.

    python jobs/ask.py --tables /root/testdata/sf0.001 \
        "how complete is the documents table"
    python jobs/ask.py --tables /data "orphans in orders vs customer" \
        "top 10 orders by o_totalprice"
    python jobs/ask.py --tables /data --interactive   # REPL on stdin

The grafted equivalent of the reference's interactive query loop
(/root/reference/main.py:60-84 `interactive_query` → agent.ask →
formatted result): every parquet table under --tables (or any
already-registered catalog table) becomes addressable by name, each
question is planned by the deterministic intent grammar
(dataquality_spark/nlq.py — the A20 analog, no LLM), and the answer
prints as one JSON object per question with the generated SQL,
explanation, confidence, and bounded rows. Errors come back in the
reference's {error, suggestion} shape instead of a traceback.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataquality_spark import nlq  # noqa: E402
from dataquality_spark.session import get_spark  # noqa: E402


def register_tables(spark, tables_dir: str) -> list[str]:
    """Every *.parquet under the dir becomes a temp view named after
    its basename — the sandbox stand-in for a populated catalog."""
    names = []
    for p in sorted(glob.glob(os.path.join(tables_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(p))[0]
        spark.read.parquet(p).createOrReplaceTempView(name)
        names.append(name)
    return names


def run(argv: list[str] | None = None,
        stdin=None) -> list[dict]:
    ap = argparse.ArgumentParser()
    ap.add_argument("questions", nargs="*",
                    help="one or more English questions")
    ap.add_argument("--tables", default=None,
                    help="directory of *.parquet tables to register "
                         "(omit to use already-registered catalog "
                         "tables)")
    ap.add_argument("--interactive", action="store_true",
                    help="REPL: read one question per stdin line until "
                         "EOF or 'exit' — the reference's interactive "
                         "loop (main.py:60-84) shape")
    ap.add_argument("--max-rows", type=int, default=nlq.MAX_ROWS)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if not args.questions and not args.interactive:
        ap.error("give questions as arguments or pass --interactive")

    spark = get_spark("dq-ask", master=args.master)
    if args.tables:
        register_tables(spark, args.tables)

    def _answer(q: str) -> dict:
        r = nlq.answer(spark, q, max_rows=args.max_rows)
        r["question"] = q
        print(json.dumps(r, default=str))
        return r

    out = [_answer(q) for q in args.questions]
    if args.interactive:
        stream = stdin if stdin is not None else sys.stdin
        for line in stream:
            q = line.strip()
            if not q:
                continue
            if q.lower() in ("exit", "quit"):
                break
            out.append(_answer(q))
    return out


if __name__ == "__main__":
    run()
