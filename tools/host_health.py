"""Quantify the current shared-VM window so bench numbers carry a
host-state control.

    python tools/host_health.py [--secs 5] [--out BENCH/host_health.json]

Three signals, all engine-independent:

* steal_pct — CPU-steal share from two /proc/stat samples over the
  probe window (Firecracker guest: time the hypervisor ran a noisy
  neighbor instead of this VM). The direct measurement of "someone
  else is using the machine".
* st_gflops — single-thread fixed numpy matmul (compute capability of
  one core in this window).
* bw_gbps — large-array numpy copy bandwidth (the DRAM-bus signal the
  scaling analysis in BENCH/BASELINE.md leans on).

Interpretation rule used by the bench narrative: a window whose
steal_pct is high or whose st_gflops/bw_gbps sit well under the best
recorded window explains a uniform one-sided slowdown in that window's
query timings (the r04 verdict's item-2 signature); per-query ratios
are only judged engine-regressions when the controls match.
"""

from __future__ import annotations

import argparse
import json
import time


def cpu_sample() -> tuple[float, float]:
    """(total_jiffies, steal_jiffies) summed over all cpus."""
    with open("/proc/stat") as f:
        line = f.readline().split()
    vals = [float(x) for x in line[1:]]
    total = sum(vals)
    steal = vals[7] if len(vals) > 7 else 0.0
    return total, steal


def probe(secs: float = 5.0) -> dict:
    import numpy as np

    t0_total, t0_steal = cpu_sample()
    wall0 = time.monotonic()

    # single-thread compute: fixed 512x512 matmul repeated
    a = np.random.default_rng(7).standard_normal((512, 512))
    flops_per = 2 * 512**3
    reps = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < secs / 2:
        a @ a
        reps += 1
    st_gflops = reps * flops_per / (time.monotonic() - t0) / 1e9

    # memory bandwidth: copy between two distinct 256 MB arrays
    # (read+write = 512 MB/pass; far over LLC so it streams DRAM).
    # One untimed warm-up pass first: first-touch page faults on the
    # fresh 512 MB can cost 1-2 s under Firecracker and would otherwise
    # dominate the 2.5 s window (observed: 0.19 GB/s reported while the
    # steady-state copy ran at 34 GB/s).
    src = np.zeros(256 * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    np.copyto(dst, src)
    passes = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < secs / 2:
        np.copyto(dst, src)
        passes += 1
    bw_gbps = passes * src.nbytes * 2 / (time.monotonic() - t0) / 1e9

    t1_total, t1_steal = cpu_sample()
    dt_total = t1_total - t0_total
    steal_pct = 100.0 * (t1_steal - t0_steal) / dt_total if dt_total else 0.0

    return {"ts": time.time(), "wall_sec": round(time.monotonic() - wall0, 1),
            "steal_pct": round(steal_pct, 2),
            "st_gflops": round(st_gflops, 2),
            "bw_gbps": round(bw_gbps, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=5.0)
    ap.add_argument("--out", default=None,
                    help="append one JSON line to this file")
    args = ap.parse_args()
    rec = probe(args.secs)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
