"""Tracked persist lifecycle for operator-internal caches.

A lazy-returning operator cannot unpersist an intermediate before its
caller materializes the result, so callers own the lifecycle:
materialize, then call `unpersist_all()` (bench.py, the contract
checker, and the CLI jobs do). Centralized here so every module's
intermediates release through one call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    return df


def unpersist_all() -> int:
    """Release every tracked cache since the last call; returns count."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
