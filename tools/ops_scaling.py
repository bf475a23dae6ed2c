"""Two-cluster-size probe for individual contract operators (the
round-4 additions by default) — the per-operator companion to
tools/scaling_bench.py's whole-pipeline sweep.

    python tools/ops_scaling.py [--ops dsir_scores,dup_span_removal,...]
        [--replicate 8] [--sizes 8,32] [--trials 2]
        [--out BENCH/ops_scaling_r04.json]

Builds a scaled corpus by replicating /root/testdata/sf0.1's
`documents` table R times with disjoint doc_ids (content duplication is
intentional — the dedup probes then exercise their heavy paths), then
times each operator's contract query at each core count in a fresh
subprocess (cold JVM, min over trials). Every probed query reads ONLY
the documents table, so the scaled sf dir contains just that file.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_OPS = ["temperature_mix", "ccnet_buckets", "dsir_scores",
               "dup_span_removal"]

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
import __spark_entry__ as entry
from dataquality_spark.session import get_spark

cores = {cores}
spark = get_spark("ops-scaling", master=f"local[{{cores}}]",
                  shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()

def force(df):
    # consume every column's values (bit_xor(xxhash64) defeats pruning)
    return df.agg(F.count(F.lit(1)),
                  *[F.expr(f"bit_xor(xxhash64(`{{c}}`))")
                    for c in df.columns]).collect()[0]

res = {{"cores": cores, "ops": {{}}}}
for name in {ops!r}:
    fn = qs[name]
    force(fn(spark, {sf_dir!r}))            # warm: codegen + workers
    trials = []
    for _ in range({n_trials}):
        from dataquality_spark.caching import unpersist_all
        unpersist_all()                      # cold per trial: the span/
                                             # gram persists must rebuild
        t0 = time.monotonic()
        row = force(fn(spark, {sf_dir!r}))
        trials.append(round(time.monotonic() - t0, 3))
    res["ops"][name] = {{"sec": min(trials), "trials": trials,
                         "n_rows": row[0]}}
print(json.dumps(res))
"""


def build_corpus(replicate: int, out_dir: str) -> int:
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from dataquality_spark.session import get_spark
spark = get_spark("ops-synth", master="local[16]")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
out = docs.withColumn("_r", F.explode(F.sequence(
    F.lit(0), F.lit({replicate - 1})))).withColumn(
    "doc_id",
    # BIGINT arithmetic: INT _r * INT 10M overflows at replicate >= 215
    F.col("doc_id") + F.col("_r").cast("long") * F.lit(10_000_000)
    ).drop("_r")
out.repartition(64).write.mode("overwrite").parquet(
    {out_dir!r} + "/documents.parquet")
print(out.count())
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800, check=True)
    return int([l for l in r.stdout.splitlines() if l.strip().isdigit()][-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default=",".join(DEFAULT_OPS))
    ap.add_argument("--replicate", type=int, default=8)
    ap.add_argument("--sizes", default="8,32")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    ops = args.ops.split(",")
    sizes = [int(x) for x in args.sizes.split(",")]
    work = tempfile.mkdtemp(prefix="dq_ops_scaling_")
    n_docs = build_corpus(args.replicate, work)
    print(f"scaled corpus: {n_docs} docs → {work}", file=sys.stderr)

    per_size: dict[int, dict] = {}
    for c in sizes:
        code = RUNNER.format(repo=REPO, cores=c, ops=ops, sf_dir=work,
                             n_trials=args.trials)
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=3600,
                           check=False)
        lines = [l for l in r.stdout.strip().splitlines()
                 if l.startswith("{")]
        if not lines:
            raise RuntimeError(f"size {c} failed:\n{r.stderr[-3000:]}")
        per_size[c] = json.loads(lines[-1])
        print(json.dumps(per_size[c]), file=sys.stderr)

    lo, hi = min(sizes), max(sizes)
    summary: dict = {"n_docs": n_docs, "replicate": args.replicate,
                     "sizes": sizes,
                     "per_size": {str(c): per_size[c] for c in sizes},
                     "efficiency": {}}
    for op in ops:
        t_lo = per_size[lo]["ops"][op]["sec"]
        t_hi = per_size[hi]["ops"][op]["sec"]
        summary["efficiency"][op] = round((t_lo / t_hi) / (hi / lo), 3)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
