"""Structured Streaming incremental filtering: availableNow drain,
checkpoint-as-manifest resume, cross-batch dedup state."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from dataquality_spark import synth
from dataquality_spark.streaming import incremental


@pytest.fixture()
def stream_dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"])
    return d


def _write_batch(in_dir: str, pages: pd.DataFrame, name: str) -> None:
    pages.to_parquet(os.path.join(in_dir, f"{name}.parquet"), index=False)


def test_available_now_drains_and_resumes(spark, stream_dirs):
    pages = synth.gen_pages(300, seed=7)[
        ["url", "warc_ts", "html", "text", "lang"]]
    _write_batch(stream_dirs["in"], pages.iloc[:150], "b0")

    incremental.run_available_now(spark, stream_dirs["in"],
                                  stream_dirs["out"], stream_dirs["ckpt"])
    first = spark.read.parquet(stream_dirs["out"])
    n_first = first.count()
    assert n_first > 0
    # first batch: every distinct (url, md5) appears exactly once
    assert first.select("url").distinct().count() == n_first

    # second run with NO new files: checkpoint prevents reprocessing
    incremental.run_available_now(spark, stream_dirs["in"],
                                  stream_dirs["out"], stream_dirs["ckpt"])
    assert spark.read.parquet(stream_dirs["out"]).count() == n_first

    # new file arrives → only the increment is processed
    _write_batch(stream_dirs["in"], pages.iloc[150:], "b1")
    incremental.run_available_now(spark, stream_dirs["in"],
                                  stream_dirs["out"], stream_dirs["ckpt"])
    final = spark.read.parquet(stream_dirs["out"])
    assert final.count() > n_first
    assert final.count() <= 300


def test_streaming_schema_matches_batch(spark, stream_dirs):
    pages = synth.gen_pages(80, seed=9)[
        ["url", "warc_ts", "html", "text", "lang"]]
    _write_batch(stream_dirs["in"], pages, "b0")
    incremental.run_available_now(spark, stream_dirs["in"],
                                  stream_dirs["out"], stream_dirs["ckpt"])
    out = spark.read.parquet(stream_dirs["out"])
    from dataquality_spark.pipeline import DECISION_COLUMNS
    assert set(DECISION_COLUMNS) <= set(out.columns)


def test_streaming_windowed_metrics(spark, stream_dirs):
    pages = synth.gen_pages(200, seed=11)[
        ["url", "warc_ts", "html", "text", "lang"]]
    _write_batch(stream_dirs["in"], pages, "b0")
    stream = incremental.read_pages_stream(spark, stream_dirs["in"])
    metrics = incremental.streaming_quality_metrics(stream)
    q = (metrics.writeStream.format("parquet")
         .option("path", stream_dirs["out"])
         .option("checkpointLocation", stream_dirs["ckpt"])
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination()
    out = spark.read.parquet(stream_dirs["out"]).toPandas()
    # append mode emits only windows fully behind the watermark; with a
    # 7-day watermark over a year of synthetic warc_ts, most close
    assert len(out) > 0
    assert (out["n_kept"] <= out["n_docs"]).all()
    assert out["n_docs"].sum() <= 200


def test_streaming_sessionize_matches_batch(spark, stream_dirs):
    """session_window gap-merge == batch sessionize session structure on
    off-boundary gaps: same number of sessions per user, same event
    totals (append mode emits every session once the watermark passes)."""
    import numpy as np

    from dataquality_spark.operators import joins

    rng = np.random.default_rng(13)
    rows = []
    base = pd.Timestamp("2024-08-01 00:00:00")
    for u in range(12):
        t = base
        for _ in range(rng.integers(3, 20)):
            # gaps: mostly in-session (<30m), some >30m — never exactly 30m
            gap_s = int(rng.choice([60, 300, 900, 2100, 3700]))
            t = t + pd.Timedelta(seconds=gap_s + 1)
            rows.append((u, t))
    # watermark pusher: a far-future dummy event advances the global
    # watermark past every real session so append mode emits them all
    rows.append((999, base + pd.Timedelta(days=30)))
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    # pandas writes nanos; coerce to micros so the declared schema matches
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev.to_parquet(os.path.join(stream_dirs["in"], "ev.parquet"), index=False)

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .parquet(stream_dirs["in"]))
    sess = incremental.streaming_sessionize(stream, key="user_id", ts="ts",
                                            gap="30 minutes",
                                            watermark="10 minutes")
    q = (sess.writeStream.format("parquet")
         .option("path", stream_dirs["out"])
         .option("checkpointLocation", stream_dirs["ckpt"])
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination()
    got = spark.read.parquet(stream_dirs["out"]).toPandas()
    got = got[got.user_id != 999]

    batch = (joins.sessionize(
        spark.createDataFrame(ev[ev.user_id != 999]), "user_id", "ts",
        gap_minutes=30.0)
             .groupBy("user_id", "session_idx").count().toPandas())
    gb = got.groupby("user_id").agg(n_sessions=("session_start", "count"),
                                    n_events=("n_events", "sum"))
    bb = batch.groupby("user_id").agg(n_sessions=("session_idx", "count"),
                                      n_events=("count", "sum"))
    m = gb.join(bb, lsuffix="_s", rsuffix="_b")
    assert (m.n_sessions_s == m.n_sessions_b).all()
    assert (m.n_events_s == m.n_events_b).all()


def test_host_quality_state_accumulates_across_batches(spark, stream_dirs):
    """applyInPandasWithState: per-host counters persist across
    micro-batches (maxFilesPerTrigger=1 forces multiple batches in one
    availableNow drain); the final update per host equals the batch
    ground truth."""
    pages = synth.gen_pages(240, seed=17)[
        ["url", "warc_ts", "html", "text", "lang"]]
    _write_batch(stream_dirs["in"], pages.iloc[:120], "b0")
    _write_batch(stream_dirs["in"], pages.iloc[120:], "b1")

    stream = incremental.read_pages_stream(spark, stream_dirs["in"],
                                           max_files_per_trigger=1)
    decided = incremental.streaming_decisions(stream)
    state = incremental.host_quality_state(decided)
    q = (state.writeStream.format("memory").queryName("hostq")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    ups = spark.sql("SELECT * FROM hostq").toPandas()
    # last update per host carries the cumulative totals
    final = (ups.groupby("host").last())

    from dataquality_spark import pipeline as P

    # ground truth: run the same dedup+decision semantics in batch
    from pyspark.sql import functions as F
    sdf = spark.createDataFrame(pages)
    dedup_batch = (sdf.withColumn("_md5", F.md5(
        F.coalesce(F.col("text"), F.lit("")).cast("binary")))
        .dropDuplicates(["url", "_md5"]).drop("_md5"))
    gt = (P.decisions(dedup_batch, mark_dups=False)
          .groupBy("host")
          .agg(F.count(F.lit(1)).alias("n_docs"),
               F.sum(F.col("keep").cast("long")).alias("n_kept"))
          .toPandas().set_index("host"))
    m = final.join(gt, lsuffix="_s", rsuffix="_b")
    assert (m.n_docs_s == m.n_docs_b).all()
    assert (m.n_kept_s == m.n_kept_b).all()


def test_streaming_source_report_matches_batch(spark, stream_dirs):
    """Incremental per-domain quality report: streaming complete-mode
    aggregation over two availableNow batches equals the batch
    group_quality_report over the union — the round-4 domain report
    is streaming-safe because every statistic is an algebraic
    aggregate (counts, lattice sums, distinct-hash counts)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dataquality_spark.operators import profile

    docs = pd.DataFrame({
        "doc_id": range(200),
        "source": [f"s{i % 4}" for i in range(200)],
        "text": [f"doc body {i % 37}" for i in range(200)],  # dups
        "quality_score": [round((i % 11) / 10, 4) for i in range(200)],
    })
    _write_batch(stream_dirs["in"], docs.iloc[:90], "b0")
    _write_batch(stream_dirs["in"], docs.iloc[90:], "b1")

    schema = ("doc_id long, source string, text string, "
              "quality_score double")
    stream = spark.readStream.schema(schema).parquet(stream_dirs["in"])
    # the same slim projection the batch operator builds; streaming
    # forbids exact count_distinct, so the distinct-text side runs as
    # its own query through dropDuplicates state (the production
    # shape: dedup state + algebraic aggregate)
    base = stream.select(
        "source",
        F.round(F.col("quality_score") * 10000).cast("long")
        .alias("si"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("th"))
    agg = (base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("si").cast("long").alias("score_sum_i"),
        F.sum((F.col("si") >= 5000).cast("long")).alias("kept")))
    q1 = (agg.writeStream.format("memory").queryName("src_report")
          .outputMode("complete").trigger(availableNow=True).start())
    uniq = (base.select("source", "th").dropDuplicates()
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_unique")))
    q2 = (uniq.writeStream.format("memory").queryName("src_uniq")
          .outputMode("complete").trigger(availableNow=True).start())
    q1.awaitTermination(120)
    q2.awaitTermination(120)

    uq = {r["source"]: r["n_unique"]
          for r in spark.sql("select * from src_uniq").collect()}
    got = {r["source"]: (r["n_docs"], uq[r["source"]],
                         r["score_sum_i"], r["kept"])
           for r in spark.sql("select * from src_report").collect()}
    want = {r["source"]: (r["n_docs"], r["n_unique_texts"],
                          r["score_sum_i"],
                          int(round(r["keep_rate"] * r["n_docs"])))
            for r in profile.group_quality_report(
                spark.createDataFrame(docs), "source").collect()}
    assert got == want


def test_streaming_needs_processing_matches_batch(spark, stream_dirs):
    """Stream-static incremental diff == the batch operator: the new
    crawl lands as two files; the drained stream emits exactly the
    added+changed set that snapshot.needs_processing computes."""
    from pyspark.sql import functions as F

    from dataquality_spark.operators import snapshot
    from dataquality_spark.sources.io import PAGES_SCHEMA

    old = synth.gen_pages(200, seed=31)[
        ["url", "warc_ts", "html", "text", "lang"]]
    old = old.drop_duplicates(subset=["url"])  # unique keys per snapshot
    new = old.copy()
    # mutate 1 in 4, drop 1 in 10, add 15 fresh urls
    changed_mask = new.index % 4 == 0
    new.loc[changed_mask, "text"] = new.loc[changed_mask, "text"] + " v2"
    new = new[new.index % 10 != 0]
    fresh = old.iloc[:15].copy()
    fresh["url"] = "https://fresh.example/" + fresh.index.astype(str)
    new = pd.concat([new, fresh])

    _write_batch(stream_dirs["in"], new.iloc[:100], "n0")
    _write_batch(stream_dirs["in"], new.iloc[100:], "n1")

    prev_df = spark.createDataFrame(old)
    stream = incremental.read_pages_stream(spark, stream_dirs["in"])
    out = incremental.streaming_needs_processing(stream, prev_df)
    q = (out.writeStream.format("parquet")
         .option("path", stream_dirs["out"])
         .option("checkpointLocation", stream_dirs["ckpt"])
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(stream_dirs["out"])
    batch = snapshot.needs_processing(
        prev_df, spark.createDataFrame(new), "url", "text")
    g = {(r.url, r.status) for r in got.select("url", "status").collect()}
    b = {(r.url, r.status) for r in
         batch.select("url", "status").collect()}
    assert g == b
    assert any(s == "added" for _, s in g)
    assert any(s == "changed" for _, s in g)
