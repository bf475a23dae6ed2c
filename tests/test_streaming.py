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
