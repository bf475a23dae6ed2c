"""Tests for temporal join operators (as-of join, sessionization) and
the HLL approx-distinct tolerance, verified against brute-force pandas."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataquality_spark.operators import joins

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_asof_join_matches_pandas_merge_asof(spark, events):
    clicks = (events.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         "user_id", "ts", "value"))
    got = (joins.asof_join(clicks, purchases, on="user_id",
                           left_ts="ts", right_ts="ts",
                           value_cols=["purchase_id", "value"])
           .select("event_id", "purchase_id_asof").toPandas()
           .sort_values("event_id").reset_index(drop=True))

    cp = clicks.toPandas().sort_values("ts")
    pp = purchases.toPandas().sort_values("ts")
    exp = pd.merge_asof(cp, pp, on="ts", by="user_id",
                        direction="backward")
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert (got["purchase_id_asof"].fillna(-1).to_numpy()
            == exp["purchase_id"].fillna(-1).to_numpy()).all()


def test_asof_join_no_prior_is_null(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "lts": pd.to_datetime(["2024-01-01"]),
                      "id": [10]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "rts": pd.to_datetime(["2024-06-01"]),
                      "v": [5.0]}))
    out = joins.asof_join(left, right, "k", "lts", "rts",
                          ["v"]).collect()[0]
    assert out["v_asof"] is None


def test_sessionize_gap_boundaries(spark):
    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:10:00",  # session 0
        "2024-01-01 01:00:00",                          # gap 50m → s1
        "2024-01-01 01:29:59",                          # 29:59 → still s1
        "2024-01-01 02:00:00",                          # gap 30:01 → s2
    ])
    df = spark.createDataFrame(pd.DataFrame({"u": [7] * 5, "ts": ts}))
    out = (joins.sessionize(df, "u", "ts", gap_minutes=30.0)
           .orderBy("ts").select("session_idx").toPandas())
    assert out["session_idx"].tolist() == [0, 0, 1, 1, 2]


def test_sessionize_multiuser_independent(spark, events):
    s = joins.sessionize(events, "user_id", "ts", 30.0).toPandas()
    # sessions are contiguous 0..k per user
    for _, g in s.groupby("user_id"):
        idx = g.sort_values("ts")["session_idx"].tolist()
        assert idx[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(idx, idx[1:]))


def test_approx_distinct_tolerance(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("a"),
        F.count_distinct("l_orderkey").alias("e")).collect()[0]
    assert abs(row["a"] - row["e"]) / row["e"] < 0.03


def test_asof_join_tie_break_deterministic(spark):
    """Two right rows at the same (key, ts): the explicit pre-reduction
    keeps the largest tie_break tuple, independent of engine-internal
    window ordering."""
    left = spark.createDataFrame(pd.DataFrame({
        "k": [1], "lts": pd.to_datetime(["2024-01-02"]), "id": [10]}))
    right = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1], "rts": pd.to_datetime(["2024-01-01", "2024-01-01"]),
        "rid": [7, 9], "v": [5.0, 3.0]}))
    out = joins.asof_join(left, right, "k", "lts", "rts",
                          ["rid", "v"]).collect()[0]
    assert out["rid_asof"] == 9 and out["v_asof"] == 3.0
