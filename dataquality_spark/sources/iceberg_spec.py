"""Iceberg table specs for the production deployment (SURVEY.md §1.3,
§4.2) — committed as executable DDL so the layout the scale story leans
on is pinned, reviewable, and testable, not prose.

Layout rationale at 10^12 docs:

* ``pages``    PARTITIONED BY (days(warc_ts), bucket(64, url)).
               - days(warc_ts): the timeliness predicate and the resume
                 anti-join prune whole days at the manifest level —
                 a month-bounded rerun touches ~3% of files.
               - bucket(64, url): the url-dedup aggregate and the flag
                 join back are STORAGE-PARTITIONED on the same key, so
                 at full scale the dedup needs no shuffle at all
                 (storage-partitioned joins; AQE broadcast covers the
                 small-batch case).
* ``decisions`` same transforms as pages (the join that writes it is
               co-partitioned) plus sorted-on-host data files so
               per-host analytics scan contiguous ranges.
* ``audit``    tiny append-only metrics table, partitioned by
               partition_id (the yyyy-MM lineage key).

Parquet fallback equivalence (no Iceberg jars in the sandbox): the same
predicates prune because write_decisions partitions directories by
partition_id = date_format(warc_ts,'yyyy-MM') — coarser than days() but
the same pruning semantics; bucket-join locality degrades to an AQE
shuffle join. sources/io.py routes reads/writes identically either way.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .io import iceberg_available

PAGES_DDL = """
CREATE TABLE IF NOT EXISTS {fq}.pages (
  url      STRING  NOT NULL,
  warc_ts  TIMESTAMP NOT NULL,
  html     BINARY,
  text     STRING,
  lang     STRING)
USING iceberg
PARTITIONED BY (days(warc_ts), bucket(64, url))
TBLPROPERTIES (
  'format-version' = '2',
  'write.distribution-mode' = 'hash',
  'write.parquet.compression-codec' = 'zstd',
  'write.target-file-size-bytes' = '536870912',
  'read.split.target-size' = '134217728')
"""

DECISIONS_DDL = """
CREATE TABLE IF NOT EXISTS {fq}.decisions (
  url           STRING NOT NULL,
  warc_ts       TIMESTAMP NOT NULL,
  lang          STRING,
  host          STRING,
  partition_id  STRING,
  keep          BOOLEAN,
  rule_hits     ARRAY<STRING>,
  lang_pred     STRING,
  lang_score    DOUBLE,
  ppl           DOUBLE,
  text_scrubbed STRING,
  pii_email     INT,
  pii_phone     INT,
  pii_ipv4      INT,
  pii_toxicity  INT)
USING iceberg
PARTITIONED BY (days(warc_ts), bucket(64, url))
TBLPROPERTIES (
  'format-version' = '2',
  'write.distribution-mode' = 'hash',
  'write.parquet.compression-codec' = 'zstd',
  'sort-order' = 'host ASC NULLS LAST')
"""

AUDIT_DDL = """
CREATE TABLE IF NOT EXISTS {fq}.audit (
  partition_id    STRING,
  n_docs          BIGINT,
  n_kept          BIGINT,
  rule_hit_counts MAP<STRING, BIGINT>,
  started_at      TIMESTAMP,
  finished_at     TIMESTAMP,
  docs_per_sec    DOUBLE)
USING iceberg
PARTITIONED BY (partition_id)
TBLPROPERTIES ('format-version' = '2')
"""

ALL_DDL = {"pages": PAGES_DDL, "decisions": DECISIONS_DDL,
           "audit": AUDIT_DDL}


def create_tables(spark: SparkSession, catalog: str, database: str
                  ) -> list[str]:
    """Execute the DDL against an Iceberg catalog; returns the table ids
    created. Raises RuntimeError when no Iceberg runtime is on the
    classpath (callers fall back to the parquet layout in io.py)."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; use the parquet "
            "fallback (io.write_decisions) — same pruning semantics, "
            "see module docstring")
    fq = f"{catalog}.{database}"
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {fq}")
    out = []
    for name, ddl in ALL_DDL.items():
        spark.sql(ddl.format(fq=fq))
        out.append(f"{fq}.{name}")
    return out
