"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir, runs the
matching oracle_sql() through DuckDB on the same parquet views, and
compares row count, column-name set, and exact values (columns sorted
by name, rows sorted by all columns — the driver's order-insensitive
value hash). Exits non-zero on any mismatch.

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import glob
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dataquality_spark.operators import dedup as _dedup  # noqa: E402
from dataquality_spark.session import get_spark  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].map(
                lambda v: None if v is None else
                (v.hex() if isinstance(v, (bytes, bytearray)) else str(v)))
        elif str(out[c].dtype).startswith("datetime"):
            out[c] = out[c].astype("datetime64[us]").astype(str)
    return out.sort_values(list(out.columns),
                           kind="mergesort").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if np.isnan(af) and np.isnan(bf):
            return True
        return af == bf
    return a == b


def strict_repr(v) -> str:
    """Type-sensitive canonical form approximating the driver's value
    hash: int64 600 and float64 600.0 must NOT collide (DuckDB HUGEINT
    sums come back as float64 and fail the driver hash even when the
    values compare equal)."""
    if v is None:
        return "null"
    if isinstance(v, float):
        if np.isnan(v):
            return "null"
        return f"f:{v!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    return f"{type(v).__name__}:{v!r}"


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"schema mismatch: spark={sorted(sdf.columns)} "
                        f"oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"rowcount mismatch: spark={len(sdf)} "
                        f"oracle={len(odf)}")
        return problems
    s, o = canon(sdf), canon(odf)
    ndiff = nstrict = 0
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            if not values_equal(x, y):
                ndiff += 1
                if ndiff <= 3:
                    problems.append(
                        f"value diff col={c} row={i}: "
                        f"spark={x!r} oracle={y!r}")
            elif strict_repr(x) != strict_repr(y):
                nstrict += 1
                if nstrict <= 3:
                    problems.append(
                        f"HASH-RISK col={c} row={i}: values equal but "
                        f"types differ: spark={strict_repr(x)} "
                        f"oracle={strict_repr(y)}")
    if ndiff > 3:
        problems.append(f"... {ndiff} total value diffs")
    if nstrict > 3:
        problems.append(f"... {nstrict} total hash-risk diffs")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark("contract-check", master="local[8]",
                      shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            _dedup.unpersist_all()
        dt = time.monotonic() - t0
        if name not in oracles:
            status = "rows-only"
            print(f"ok    {name:24s} {len(sdf):6d} rows  {dt:6.1f}s "
                  f"[{status}]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL  {name:24s} {len(sdf):6d} rows  {dt:6.1f}s")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name:24s} {len(sdf):6d} rows  {dt:6.1f}s "
                  f"[oracle match]")
    # smoke the entry() contract too
    try:
        edf = entrymod.entry(spark).toPandas()
        print(f"ok    entry()                {len(edf):6d} rows")
    except Exception as e:
        print(f"FAIL  entry(): {e}")
        failures += 1
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
