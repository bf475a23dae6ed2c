"""Schema-fallback read chain (reference A13 analog)."""

import pandas as pd
import pytest

from dataquality_spark.sources import io


def _write(tmp_path, df, name="pages"):
    p = str(tmp_path / name)
    df.to_parquet(p + ".parquet", index=False)
    return p + ".parquet"


def test_lenient_maps_case_insensitive(spark, pages_input, tmp_path):
    drifted = pages_input.rename(columns={
        "url": "URL", "warc_ts": "Warc_TS", "html": "HTML"})
    drifted["warc_ts"] = None  # decoy absent; renamed col must be used
    drifted = drifted.drop(columns=["warc_ts"])
    p = _write(tmp_path, drifted)
    got = io.read_pages_lenient(spark, p)
    assert got.columns == [f.name for f in io.PAGES_SCHEMA.fields]
    assert got.count() == len(pages_input)
    assert dict(got.dtypes)["warc_ts"].startswith("timestamp")


def test_lenient_passthrough_on_exact_schema(spark, pages_input, tmp_path):
    p = _write(tmp_path, pages_input)
    got = io.read_pages_lenient(spark, p)
    assert got.count() == len(pages_input)


def test_lenient_fails_loud_on_missing(spark, pages_input, tmp_path):
    broken = pages_input.drop(columns=["text", "lang"])
    p = _write(tmp_path, broken)
    with pytest.raises(ValueError, match="missing columns.*text.*lang"):
        io.read_pages_lenient(spark, p)
