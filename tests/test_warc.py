"""WARC/WET source roundtrip — byte identity through the Common Crawl
interchange format (sources/warc.py)."""

import datetime as dt
import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataquality_spark.sources import warc


def _roundtrip_wet(spark, sdf, tmp_path, parts=3):
    out = str(tmp_path / "wet")
    summary = warc.write_wet(sdf.repartition(parts), out).toPandas()
    assert summary["n_records"].sum() == sdf.count()
    assert len(glob.glob(os.path.join(out, "*.warc.gz"))) == len(summary)
    return warc.read_wet(spark, out).toPandas()


def test_wet_roundtrip_synth_corpus(spark, pages_sdf, pages_input, tmp_path):
    """Full synth corpus (planted dups, null/whitespace text, unicode)
    survives write→read byte-identically, keyed on (url, warc_ts)."""
    back = _roundtrip_wet(spark, pages_sdf, tmp_path)
    assert len(back) == len(pages_input)
    gold = pages_input[["url", "warc_ts", "text"]].copy()
    m = gold.merge(back, on=["url", "warc_ts"], suffixes=("_g", "_s"))
    assert len(m) >= len(gold)  # planted dup urls join many-to-many
    assert (m["text_g"].fillna("") == m["text_s"].fillna("")).all()


def test_wet_roundtrip_adversarial_payloads(spark, tmp_path):
    """Content-Length framing: payloads containing CRLFCRLF, header-like
    lines, and a fake record preamble must not break parsing."""
    ts = dt.datetime(2020, 5, 17, 3, 4, 5)
    rows = pd.DataFrame({
        "url": [f"http://evil.test/{i}" for i in range(4)],
        "warc_ts": [ts] * 4,
        "text": ["a\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nb",
                 "", "Content-Length: 999\r\n\r\n tail", "日本語 🙂 ẞ"],
    })
    back = _roundtrip_wet(spark, spark.createDataFrame(rows), tmp_path,
                          parts=1)
    m = rows.merge(back, on="url", suffixes=("_g", "_s"))
    assert len(m) == 4
    assert (m["text_g"] == m["text_s"]).all()
    assert (m["warc_ts_s"] == ts).all()


def test_warc_response_records_binary_payload(spark, tmp_path):
    """Generic writer carries raw html bytes as `response` records."""
    ts = dt.datetime(2021, 1, 2, 10, 0, 0)
    rows = pd.DataFrame({
        "uri": ["http://a.test/1", "http://a.test/2"],
        "warc_ts": [ts, ts],
        "payload": [b"<html><body>\x00\xff raw</body></html>", b""],
    })
    out = str(tmp_path / "warc")
    warc.write_warc(spark.createDataFrame(rows), out, rec_type="response",
                    content_type="text/html").toPandas()
    back = warc.read_warc(spark, out).toPandas()
    assert set(back["rec_type"]) == {"response"}
    assert set(back["content_type"]) == {"text/html"}
    m = rows.merge(back, on="uri", suffixes=("_g", "_s"))
    assert len(m) == 2
    assert all(bytes(a) == bytes(b)
               for a, b in zip(m["payload_g"], m["payload_s"]))


def test_write_warc_overwrite_clears_stale_parts(spark, tmp_path):
    """A rerun that produces FEWER partitions must not leave stale part
    files behind (mode='overwrite' default), and mode='error' must
    refuse to clobber; orphaned .inprogress temp files are also swept
    and never match the reader glob."""
    ts = dt.datetime(2022, 3, 4, 5, 6, 7)
    rows = pd.DataFrame({
        "url": [f"http://s.test/{i}" for i in range(8)],
        "warc_ts": [ts] * 8,
        "text": [f"doc {i}" for i in range(8)],
    })
    sdf = spark.createDataFrame(rows)
    out = str(tmp_path / "wet_rerun")
    warc.write_wet(sdf.repartition(4), out).collect()
    assert len(glob.glob(os.path.join(out, "*.warc.gz"))) == 4
    # plant an orphaned temp file from a hypothetical crashed attempt
    with open(os.path.join(out, "part-00099.warc.gz.inprogress-7"),
              "wb") as f:
        f.write(b"garbage")

    # rerun with fewer partitions: stale parts + temp swept, not merged
    warc.write_wet(sdf.repartition(1), out).collect()
    files = glob.glob(os.path.join(out, "part-*"))
    assert len(files) == 1 and files[0].endswith(".warc.gz")
    back = warc.read_wet(spark, out).toPandas()
    assert len(back) == 8  # exactly one copy of each record

    with pytest.raises(FileExistsError):
        warc.write_warc(
            sdf.withColumn("payload", F.encode("text", "UTF-8")),
            out, uri_col="url", payload_col="payload", mode="error")


def test_warc_requires_utc_session(spark, tmp_path):
    """WARC-Date stamps a literal 'Z': a non-UTC session must be
    rejected loudly rather than writing mislabeled timestamps."""
    ts = dt.datetime(2022, 1, 1)
    sdf = spark.createDataFrame(
        pd.DataFrame({"url": ["http://a/1"], "warc_ts": [ts],
                      "text": ["x"]}))
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="timeZone"):
            warc.write_wet(sdf, str(tmp_path / "tz"))
        with pytest.raises(ValueError, match="timeZone"):
            warc.read_wet(spark, str(tmp_path / "tz"))
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_wet_files_are_deterministic(spark, pages_sdf, tmp_path):
    """Retried tasks must overwrite with identical bytes: same input +
    same partitioning → byte-identical part files (mtime pinned to 0,
    record ids derived from content)."""
    one = (pages_sdf.repartition(2, "url")
           .sortWithinPartitions("url", "warc_ts"))
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    warc.write_wet(one, d1).collect()
    warc.write_wet(one, d2).collect()
    f1 = sorted(glob.glob(os.path.join(d1, "*.warc.gz")))
    f2 = sorted(glob.glob(os.path.join(d2, "*.warc.gz")))
    assert [os.path.basename(p) for p in f1] == \
        [os.path.basename(p) for p in f2]
    for a, b in zip(f1, f2):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read()
