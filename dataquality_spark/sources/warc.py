"""WARC / WET source — Common Crawl's native interchange format.

The production corpus behind the pages table arrives as WARC (ISO
28500: raw `response` records carrying HTTP payloads) or WET (the
text-only `conversion` records Common Crawl derives from them). This
module gives the engine a native reader and writer for that layout so
ingest does not need a separate conversion fleet:

* **Writer** — every Spark task serializes its partition into ONE
  `part-NNNNN.warc.gz` member-gzipped file (each record is an
  independent gzip member, the exact Common Crawl layout: a byte-range
  fetch of one member decompresses on its own). On a cluster each task
  writes straight to shared storage; there is no driver funnel and no
  shuffle — the writer is a `mapInPandas` pass over whatever
  partitioning the upstream plan already has.
* **Reader** — `spark.read.format("binaryFile")` over the `.warc.gz`
  files, one task per file, then a `mapInPandas` parser that walks
  records by `Content-Length` framing (never by scanning for
  delimiters, so payloads containing `\\r\\n\\r\\n` round-trip
  byte-exactly). Parallelism is per-file — the Common Crawl norm of
  ~1 GB files × tens of thousands of files saturates any cluster
  without needing intra-file splits; `maxPartitionBytes` tuning does
  not apply because gzip members are only discoverable by streaming.

Scale notes (100 TB): the writer adds zero exchanges; the reader's
only hot loop is framing arithmetic plus one `gzip` stream per file
(C-backed zlib). Text crosses to Python exactly once in each
direction, as Arrow batches.

Reference ancestry: the reference has no file-format layer at all
(tables arrive via its warehouse catalog, main.py:378-433); this module
exists because the north-star corpus is Common-Crawl-shaped. Format
details follow the public WARC 1.0/1.1 spec (ISO 28500) and the
Common Crawl WET convention (`WARC-Type: conversion`,
`Content-Type: text/plain`).
"""

from __future__ import annotations

import gzip
import hashlib
import io as _io
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType,
                               StructField, StructType, TimestampType)

_CRLF = b"\r\n"
_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"  # WARC-Date (spec: UTC, second precision)


def _assert_utc(spark: SparkSession, fn: str) -> None:
    """WARC-Date is spec-mandated UTC and this module renders/parses it
    with a literal 'Z' suffix, which is only correct when Spark's
    session timezone is UTC (get_spark pins it; a foreign session might
    not). Fail loudly instead of writing mislabeled timestamps that
    shift on cross-session read-back."""
    tz = spark.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"{fn} requires spark.sql.session.timeZone=UTC (got {tz!r}): "
            "WARC-Date carries a literal 'Z' (UTC) suffix, so a non-UTC "
            "session would stamp spec-violating shifted timestamps")


def _record_bytes(rec_type: str, uri: str, date_iso: str,
                  content_type: str, payload: bytes) -> bytes:
    """Serialize one WARC record. WARC-Record-ID is REQUIRED by the
    spec; we derive it deterministically (md5 of type+uri+date) so the
    same input always produces byte-identical files — retried tasks
    overwrite with identical content instead of forking lineage."""
    digest = hashlib.md5(
        (rec_type + "\x00" + uri + "\x00" + date_iso).encode("utf-8")
    ).hexdigest()
    head = ("WARC/1.0\r\n"
            f"WARC-Type: {rec_type}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: {date_iso}\r\n"
            f"WARC-Record-ID: <urn:md5:{digest}>\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n").encode("utf-8")
    return head + payload + _CRLF + _CRLF


def _parse_stream(stream) -> Iterator[dict]:
    """Walk WARC records off a byte stream by Content-Length framing.

    Header names are case-insensitive per spec; the payload is read as
    exactly Content-Length bytes, so record bodies may contain any
    byte sequence (including header-like lines and blank lines)."""
    while True:
        line = stream.readline()
        while line in (_CRLF, b"\n"):  # tolerate inter-record padding
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            line = stream.readline()
            if line in (_CRLF, b"\n", b""):
                break
            name, _, value = line.decode("utf-8", "replace").partition(":")
            headers[name.strip().lower()] = value.strip()
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError("truncated WARC record payload")
        yield {"rec_type": headers.get("warc-type", ""),
               "uri": headers.get("warc-target-uri", ""),
               "date": headers.get("warc-date", ""),
               "content_type": headers.get("content-type", ""),
               "payload": payload}


WRITE_SUMMARY_SCHEMA = StructType([
    StructField("file", StringType()),
    StructField("n_records", LongType()),
    StructField("n_bytes", LongType()),
])

RECORD_SCHEMA = StructType([
    StructField("rec_type", StringType()),
    StructField("uri", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("content_type", StringType()),
    StructField("payload", BinaryType()),
])


def write_warc(df: DataFrame, out_dir: str, *, rec_type: str = "conversion",
               content_type: str = "text/plain",
               uri_col: str = "uri", ts_col: str = "warc_ts",
               payload_col: str = "payload",
               mode: str = "overwrite") -> DataFrame:
    """Write `df` as member-gzipped WARC part files under `out_dir`.

    One output file per input partition, written by the task itself
    (shared-storage pattern — no driver funnel; requires driver and
    executors to share the filesystem under `out_dir`, e.g. NFS/local
    mode — an object store needs a Hadoop-FS-based writer instead, and
    the in-task makedirs fails loudly when the path isn't mountable).
    Returns the one-row-per-file summary frame; the caller triggers the
    write by acting on it. Rows with NULL payload are written as empty
    records so every input row survives the round trip.

    Rerun/retry safety: `mode='overwrite'` (default) clears pre-existing
    part files on the driver before planning the write, so a rerun that
    produces fewer partitions cannot leave stale parts that read_warc
    would silently include; `mode='error'` refuses instead. Each task
    writes to a temp name suffixed with its task attempt id and
    `os.replace`s it into place — atomic on POSIX, so a speculative or
    retried attempt can never interleave bytes into a half-written
    part, and because record bytes are deterministic the last rename
    wins with identical content."""
    _assert_utc(df.sparkSession, "write_warc")
    os.makedirs(out_dir, exist_ok=True)
    stale = [f for f in os.listdir(out_dir)
             if f.startswith("part-") and ".warc.gz" in f]
    if stale:
        if mode == "overwrite":
            for f in stale:
                os.remove(os.path.join(out_dir, f))
        elif mode == "error":
            raise FileExistsError(
                f"write_warc(mode='error'): {out_dir} already holds "
                f"{len(stale)} part file(s), e.g. {stale[0]!r}")
        else:
            raise ValueError(f"unknown mode {mode!r} "
                             "(expected 'overwrite' or 'error')")
    slim = df.select(
        F.col(uri_col).cast("string").alias("uri"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
         .alias("date_iso"),
        F.col(payload_col).cast("binary").alias("payload"))

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        n_rec = 0
        buf = _io.BytesIO()
        for pdf in batches:
            for uri, date_iso, payload in zip(
                    pdf["uri"], pdf["date_iso"], pdf["payload"]):
                rec = _record_bytes(
                    rec_type, uri or "", date_iso or "1970-01-01T00:00:00Z",
                    content_type, bytes(payload or b""))
                # one gzip member per record — the Common Crawl layout
                buf.write(gzip.compress(rec, compresslevel=6, mtime=0))
                n_rec += 1
        data = buf.getvalue()
        if n_rec:
            # makedirs in the task too: on a multi-node cluster the
            # driver-side makedirs only touched the driver's filesystem
            os.makedirs(out_dir, exist_ok=True)
            tmp = f"{path}.inprogress-{ctx.taskAttemptId()}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)  # atomic publish; retries never interleave
            yield pd.DataFrame({"file": [path], "n_records": [n_rec],
                                "n_bytes": [len(data)]})

    return slim.mapInPandas(_write, schema=WRITE_SUMMARY_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC/WET part files into (rec_type, uri, warc_ts,
    content_type, payload). One task per file (gzip members are not
    random-access); Common-Crawl-sized corpora parallelize across
    their tens of thousands of files. In-progress temp files
    (`*.inprogress-<attempt>`) never match the glob, so a concurrent
    or crashed writer is invisible to readers."""
    _assert_utc(spark, "read_warc")
    files = (spark.read.format("binaryFile")
             .load(os.path.join(path, "*.warc.gz"))
             .select("content"))

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = []
                # gzip.GzipFile reads concatenated members transparently
                with gzip.GzipFile(fileobj=_io.BytesIO(bytes(blob))) as fh:
                    for rec in _parse_stream(fh):
                        rows.append(rec)
                if rows:
                    out = pd.DataFrame(rows)
                    out["warc_ts"] = pd.to_datetime(
                        out.pop("date"), format=_DATE_FMT, errors="coerce")
                    yield out[["rec_type", "uri", "warc_ts",
                               "content_type", "payload"]]

    return files.mapInPandas(_parse, schema=RECORD_SCHEMA)


def write_wet(df: DataFrame, out_dir: str, *, uri_col: str = "url",
              ts_col: str = "warc_ts", text_col: str = "text") -> DataFrame:
    """WET writer: text-only `conversion` records (the Common Crawl
    derived-text convention). Text is encoded UTF-8; byte identity on
    read-back is pinned by tests and the wet_roundtrip driver query."""
    payload = df.withColumn(
        "__wet_payload", F.encode(F.coalesce(F.col(text_col), F.lit("")),
                                  "UTF-8"))
    return write_warc(payload, out_dir, rec_type="conversion",
                      content_type="text/plain", uri_col=uri_col,
                      ts_col=ts_col, payload_col="__wet_payload")


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WET files back to (url, warc_ts, text) — conversion
    records only, payload decoded UTF-8."""
    recs = read_warc(spark, path)
    return (recs.filter(F.col("rec_type") == "conversion")
            .select(F.col("uri").alias("url"), "warc_ts",
                    F.decode(F.col("payload"), "UTF-8").alias("text")))
