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


def test_read_pages_detects_ingest_fingerprint(spark, pages_input, tmp_path):
    """read_pages must pick up the OPTIONAL write-time text_crc32 column
    when physically present (footer probe) and must NOT declare it when
    absent — declaring an absent column would null-fill every
    fingerprint and silently corrupt the dedup ranking."""
    import zlib

    from dataquality_spark import config as C, pipeline

    plain = _write(tmp_path, pages_input, "plain")
    got_plain = io.read_pages(spark, plain)
    assert got_plain.columns == [f.name for f in io.PAGES_SCHEMA.fields]

    fp_dir = str(tmp_path / "fp.parquet")
    pipeline.with_dup_fingerprint(
        spark.createDataFrame(pages_input)).write.parquet(fp_dir)
    got_fp = io.read_pages(spark, fp_dir)
    assert C.FINGERPRINT_COL in got_fp.columns
    assert got_fp.filter(f"{C.FINGERPRINT_COL} IS NULL").count() == 0
    for r in got_fp.select("text", C.FINGERPRINT_COL).limit(20).collect():
        assert r[C.FINGERPRINT_COL] == zlib.crc32(
            (r.text or "").encode("utf-8"))


def test_lenient_carries_fingerprint_through_case_drift(
        spark, pages_input, tmp_path):
    from dataquality_spark import config as C
    import zlib

    drifted = pages_input.rename(columns={"url": "URL", "html": "HTML"})
    drifted["Text_CRC32"] = [
        zlib.crc32((t or "").encode("utf-8")) for t in drifted["text"]]
    p = _write(tmp_path, drifted, "drift_fp")
    got = io.read_pages_lenient(spark, p)
    assert got.columns == ([f.name for f in io.PAGES_SCHEMA.fields]
                           + [C.FINGERPRINT_COL])
    assert dict(got.dtypes)[C.FINGERPRINT_COL] == "bigint"
    assert got.count() == len(pages_input)


def test_jsonl_roundtrip_matches_parquet(spark, pages_input, tmp_path):
    """JSONL ingest (html base64 on the wire) must yield byte-identical
    rows to the parquet path — same contract schema, decoded BINARY."""
    import base64
    import json as _json

    rows = pages_input.head(50).copy()
    jl = tmp_path / "pages.jsonl"
    with open(jl, "w") as f:
        for r in rows.itertuples(index=False):
            rec = {
                "url": r.url,
                "warc_ts": (None if pd.isna(r.warc_ts)
                            else r.warc_ts.isoformat()),
                "html": (None if r.html is None
                         else base64.b64encode(r.html).decode()),
                "text": r.text,
                "lang": r.lang,
            }
            f.write(_json.dumps(rec) + "\n")
    got = io.read_pages(spark, str(jl)).toPandas()
    want = io.read_pages(spark, _write(tmp_path, rows)).toPandas()
    assert [str(d) for d in got.dtypes] == [str(d) for d in want.dtypes]
    g = got.sort_values("url").reset_index(drop=True)
    w = want.sort_values("url").reset_index(drop=True)
    assert (g.url == w.url).all()
    assert (g.warc_ts == w.warc_ts).all()
    assert all((a is None and b is None) or bytes(a) == bytes(b)
               for a, b in zip(g.html, w.html))
    assert (g.text.fillna("") == w.text.fillna("")).all()
    assert (g.lang.fillna("") == w.lang.fillna("")).all()
