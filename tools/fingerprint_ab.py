"""A/B probe for the ingest-materialized dedup fingerprint
(pipeline.with_dup_fingerprint → config.FINGERPRINT_COL).

    python tools/fingerprint_ab.py [--n-docs 60000] [--cores 16]
        [--trials 5] [--out BENCH/fingerprint_ab_r04.json]

Writes the SAME synthetic corpus twice — once plain, once with the
write-time text_crc32 column — then, in a fresh subprocess per
(corpus, cores) cell (cold JVM, no cache leaks), times:

* ``flags``  the dedup_flags branch alone (url-grouped min-pair over
             urls seen >1×) — the stage the fingerprint changes: with
             the column its scan reads ~20 B/row (url, warc_ts,
             text_crc32); without it, it re-reads the full text column.
* ``full``   the complete decision pipeline — the end-to-end effect.

Also checksums the flags output (count + sum of min-pairs) on both
corpora: the values MUST be identical (the fingerprint is a scan-shape
change, never a semantics change).

On this sandbox the corpus is hot in page cache, so the wall-clock gap
understates the 100-TB effect — there the second pass is cold object-
store I/O and the ~40× byte reduction is the headline. The honest
sandbox-measurable win is CPU: skipping the crc32-over-every-text-byte
recompute plus the text column's parquet decode in the flags branch.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from dataquality_spark import pipeline
from dataquality_spark.session import get_spark

cores = {cores}
spark = get_spark("fp-ab", master=f"local[{{cores}}]",
                  shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet({input_dir!r})

def run_flags(df):
    # count + bit_xor(min-pair): materializes the whole flags aggregate
    # and doubles as the cross-corpus identity checksum (bit_xor, not
    # sum: pairs sit near 2**62, a sum overflows BIGINT under ANSI)
    return pipeline.dedup_flags(df).agg(
        F.count(F.lit(1)), F.bit_xor("_min_pair")).collect()[0]

def run_full(df):
    out = pipeline.decisions(df)
    return out.agg(F.count(F.lit(1)),
                   F.sum(F.length("text_scrubbed")),
                   F.sum(F.size("rule_hits")),
                   F.sum(F.col("keep").cast("long"))).collect()[0]

res = {{"cores": cores}}
for name, fn in (("flags", run_flags), ("full", run_full)):
    fn(pages.limit(2000))     # warm: codegen, python workers, pools
    row = fn(pages)
    trials = []
    for _ in range({n_trials}):
        t0 = time.monotonic()
        row = fn(pages)
        trials.append(round(time.monotonic() - t0, 4))
    res[name] = {{"sec": min(trials), "trials": trials,
                  "checksum": [int(x) for x in row]}}
print(json.dumps(res))
"""


def synthesize(n_docs: int, out_dir: str, precompute: bool) -> None:
    wrap = "pipeline.with_dup_fingerprint(df)" if precompute else "df"
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from dataquality_spark import pipeline, synth
from dataquality_spark.session import get_spark
pages = synth.gen_pages({n_docs}, seed=42)[
    ["url", "warc_ts", "html", "text", "lang"]]
spark = get_spark("synth", master="local[16]")
spark.sparkContext.setLogLevel("ERROR")
df = spark.createDataFrame(pages)
{wrap}.repartition(64).write.mode("overwrite").parquet({out_dir!r})
"""
    subprocess.run([sys.executable, "-c", code], check=True, timeout=1800)


def flags_scan_bytes(input_dir: str) -> dict:
    """EXACT byte accounting for the dedup-flags pass from the parquet
    footers (total_compressed_size per column chunk) — the deterministic,
    noise-free measurement of what the fingerprint changes. The flags
    scan reads (url, warc_ts, text) without the fingerprint and
    (url, warc_ts, text_crc32) with it; at sandbox text sizes (~740 B
    avg) the delta hides under task fixed costs in wall clock, but the
    byte ratio is exactly what scales to a 100-TB cold read."""
    import glob

    import pyarrow.parquet as pq

    tot: dict[str, int] = {}
    for f in glob.glob(os.path.join(input_dir, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                tot[c.path_in_schema] = (tot.get(c.path_in_schema, 0)
                                         + c.total_compressed_size)
    slim = ["url", "warc_ts", "text_crc32"]
    wide = ["url", "warc_ts", "text"]
    out = {"per_column_compressed_bytes": tot,
           "flags_scan_bytes_without_fp": sum(tot.get(c, 0) for c in wide)}
    if "text_crc32" in tot:
        b = sum(tot.get(c, 0) for c in slim)
        out["flags_scan_bytes_with_fp"] = b
        out["scan_bytes_ratio"] = round(
            out["flags_scan_bytes_without_fp"] / max(b, 1), 2)
    return out


def run_cell(cores: int, input_dir: str, trials: int) -> dict:
    code = RUNNER.format(repo=REPO, cores=cores, input_dir=input_dir,
                         n_trials=trials)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600, check=False)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"cell failed:\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=60_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--alternate", type=int, default=2,
                    help="interleaved A/B rounds (min-merged) so both "
                         "variants sample the same host-noise windows")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="dq_fp_ab_")
    plain_dir = os.path.join(work, "plain")
    crc_dir = os.path.join(work, "crc")
    print(f"synthesizing {args.n_docs} pages → {work}", file=sys.stderr)
    synthesize(args.n_docs, plain_dir, precompute=False)
    synthesize(args.n_docs, crc_dir, precompute=True)

    cells: dict[str, list[dict]] = {"plain": [], "crc": []}
    for _ in range(max(1, args.alternate)):
        for name, d in (("plain", plain_dir), ("crc", crc_dir)):
            r = run_cell(args.cores, d, args.trials)
            cells[name].append(r)
            print(json.dumps({name: r}), file=sys.stderr)

    summary: dict = {"n_docs": args.n_docs, "cores": args.cores}
    for name, rounds in cells.items():
        merged = {}
        for stage in ("flags", "full"):
            trials = [t for r in rounds for t in r[stage]["trials"]]
            merged[stage] = {
                "sec": min(trials), "trials": trials,
                "docs_per_sec": round(args.n_docs / min(trials), 1),
                "checksum": rounds[-1][stage]["checksum"]}
        summary[name] = merged

    for stage in ("flags", "full"):
        a, b = summary["plain"][stage], summary["crc"][stage]
        assert a["checksum"] == b["checksum"], (
            f"{stage} checksum mismatch — fingerprint changed semantics!")
        summary[f"{stage}_speedup_crc_over_plain"] = round(
            a["sec"] / b["sec"], 3)
    summary["checksums_identical"] = True
    summary["scan_bytes"] = flags_scan_bytes(crc_dir)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
