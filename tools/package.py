"""Build the spark-submit --py-files archive for the engine.

    python tools/package.py [--out dist/dq.zip]

Zips the pure-Python `dataquality_spark` package (sources only, no
tests, no caches) so a cluster run is:

    spark-submit --py-files dist/dq.zip jobs/run_pipeline.py ...

The zip is import-stable: every module is added under its package path
with a fixed timestamp, so rebuilding from the same tree is
byte-identical (reproducible artifact — the same property the
deterministic split/sample operators give the data layer).

Verification lives in tests/test_package.py: the zip is built, the repo
root is STRIPPED from sys.path in a subprocess, and a real local Spark
job ships the zip to its python workers via SparkContext.addPyFile —
the decision pipeline must produce rows with executors importing only
from the archive.
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "dataquality_spark"
# fixed zip entry timestamp → rebuilds are byte-identical
_EPOCH = (2020, 1, 1, 0, 0, 0)


def build(out_path: str) -> str:
    src_root = os.path.join(REPO, PKG)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".",
                exist_ok=True)
    entries: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            rel = os.path.relpath(full, REPO)
            entries.append((full, rel))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(rel, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "dq.zip"))
    args = ap.parse_args()
    path = build(args.out)
    n = len(zipfile.ZipFile(path).namelist())
    print({"zip": path, "modules": n,
           "bytes": os.path.getsize(path)})


if __name__ == "__main__":
    main()
