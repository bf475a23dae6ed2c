"""CLI job surfaces (reference A14/A21/A23 analogs): healthcheck,
profile_table, run_pipeline happy path + resume + structured error."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from dataquality_spark import synth


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli") / "pages")
    pages = synth.gen_pages(400, seed=19)[
        ["url", "warc_ts", "html", "text", "lang"]]
    spark.createDataFrame(pages).repartition(4).write.mode(
        "overwrite").parquet(d)
    return d


def test_healthcheck_all_components(spark, pages_dir, capsys):
    from jobs import healthcheck

    report = healthcheck.run(["--input", pages_dir])
    assert report["status"] == "healthy"
    assert set(report["components"]) >= {"session", "models", "catalog",
                                         "input_schema", "pipeline_smoke"}
    assert report["components"]["catalog"]["status"] == "healthy"
    # the printed line is valid one-line JSON
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["status"] == "healthy"


def test_profile_table_report(spark, capsys):
    from jobs import profile_table

    report = profile_table.run(
        ["--input", "/root/testdata/sf0.001/lineitem.parquet",
         "--columns", "l_orderkey,l_quantity"])
    assert report["uniqueness"]["n_rows"] > 0
    assert "l_quantity_p50" in report["percentiles"]
    assert 0 < report["completeness"]["l_orderkey"] <= 100.0


def test_run_pipeline_and_resume(spark, pages_dir, tmp_path):
    from jobs import run_pipeline

    out = str(tmp_path / "out")
    first = run_pipeline.run(["--input", pages_dir, "--output", out])
    assert first["n_docs"] == 400 and first["skipped_partitions"] == 0
    decisions = spark.read.parquet(os.path.join(out, "decisions"))
    assert decisions.count() == 400
    # second run: manifest resume skips everything
    second = run_pipeline.run(["--input", pages_dir, "--output", out])
    assert second["n_docs"] == 0
    assert second["skipped_partitions"] == first["n_partitions"]
    assert spark.read.parquet(os.path.join(out, "decisions")).count() == 400


def test_run_pipeline_error_is_structured(capsys):
    from jobs import run_pipeline

    with pytest.raises(SystemExit):
        run_pipeline.run(["--input", "/definitely/not/there",
                          "--output", "/tmp/dq_nope"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    err = json.loads(line)
    assert err["success"] is False and err["category"] == "input_not_found"
    assert err["suggestions"]
