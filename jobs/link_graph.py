"""spark-submit entry point: host link graph -> PageRank reputation.

    spark-submit --py-files dq.zip jobs/link_graph.py \
        --input /data/pages.parquet --output /data/host_ranks \
        [--iterations 4] [--top 10]

Pipeline: read pages -> extract anchor hrefs from html
(operators/html.extract_links, pure codegen) -> (source host from the
page url, target host from each absolute href) edge list ->
integer-lattice PageRank (operators/graph.pagerank) -> parquet
(host, rank) table + one JSON line with the top hosts. The rank table
is the link-centrality quality prior that curate/rank_fusion consume.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataquality_spark.errors import format_error_response  # noqa: E402
from dataquality_spark.operators import graph  # noqa: E402
from dataquality_spark.operators import html as html_ops  # noqa: E402
from dataquality_spark.session import get_spark  # noqa: E402


def run(argv: list[str] | None = None) -> dict:
    try:
        return _run(argv)
    except SystemExit:
        raise
    except Exception as e:
        report = format_error_response(e, job="link_graph")
        print(json.dumps(report))
        raise SystemExit(2)


def _run(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--iterations", type=int, default=4)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("dq-link-graph", master=args.master)
    pages = spark.read.parquet(args.input)

    linked = html_ops.extract_links(pages, "html", "_links")
    edges = (linked.select(
        F.expr("parse_url(url, 'HOST')").alias("src"),
        F.explode("_links").alias("_l"))
        .select("src", F.expr("parse_url(_l, 'HOST')").alias("dst"))
        .where(F.col("dst").isNotNull()))

    ranks = graph.pagerank(edges, "src", "dst",
                           iterations=args.iterations)
    ranks.write.mode("overwrite").parquet(args.output)

    top = (ranks.orderBy(F.col("rank").desc(), "node")
           .limit(args.top).collect())
    stats = {"n_hosts": ranks.count(),
             "iterations": args.iterations,
             "top_hosts": [{"host": r.node, "rank": r.rank}
                           for r in top]}
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    run()
