"""Incremental (streaming) quality filtering.

The reference is strictly batch request/response
(/root/reference/agents/unity_sql_agent.py:173-215 — synchronous
execute), so streaming is an engine extension, not parity surface: a
Common-Crawl dump lands as new files; we filter them incrementally with
Structured Streaming instead of re-running the batch job.

Design: `readStream` over the pages directory (file source, schema
fixed) → the SAME `pipeline.decisions` transforms (they are stateless
per-row projections + Arrow UDFs, so they lift to streaming unchanged —
the url-dedup window is replaced by a `dropDuplicates` with watermark) →
`writeStream` parquet sink with checkpointing. `Trigger.AvailableNow`
drains the backlog then stops — the streaming twin of the batch resume
manifest: the checkpoint IS the manifest.

Watermarking: late pages older than `watermark` behind the max observed
warc_ts are dropped from the dedup state so state stays bounded at
10^12-doc scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import pipeline
from ..sources.io import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (spark.readStream
              .schema(PAGES_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(input_dir)


def streaming_decisions(pages: DataFrame,
                        watermark: str = "30 days") -> DataFrame:
    """Stateless decision transforms + watermarked url dedup.

    The batch pipeline's corpus-wide first-occurrence-per-url window is
    not streamable (unbounded state); the streaming contract is instead
    "first arrival per (url, text-hash) within the watermark wins" via
    dropDuplicates — bounded state, late arrivals beyond the watermark
    are ignored.
    """
    from pyspark.sql import functions as F

    deduped = (pages
               .withWatermark("warc_ts", watermark)
               .withColumn("_md5", F.md5(F.coalesce(F.col("text"),
                                                    F.lit("")).cast("binary")))
               .dropDuplicates(["url", "_md5"])
               .drop("_md5"))
    # mark_dups=False: a row_number window is not streamable; duplicate
    # suppression is the watermarked dropDuplicates state above.
    return pipeline.decisions(deduped, mark_dups=False)


def streaming_quality_metrics(pages: DataFrame,
                              watermark: str = "7 days",
                              window: str = "1 day") -> DataFrame:
    """Watermarked tumbling-window quality metrics over the decision
    stream: per (warc_ts window) docs seen, docs kept, PII hits.

    Late pages beyond the watermark are dropped from window state, so
    state stays bounded on an unbounded crawl stream. Append output mode
    — a window emits once its watermark passes.
    """
    from pyspark.sql import functions as F

    # streaming_decisions already watermarks warc_ts for its dedup state;
    # redefining the watermark downstream is disallowed — it propagates.
    decided = streaming_decisions(pages, watermark=watermark)
    return (decided
            .groupBy(F.window("warc_ts", window).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("keep").cast("long")).alias("n_kept"),
                 (F.sum("pii_email") + F.sum("pii_phone")
                  + F.sum("pii_ipv4")).alias("n_pii_hits"))
            .select(F.col("w.start").alias("window_start"),
                    "n_docs", "n_kept", "n_pii_hits"))


def run_available_now(spark: SparkSession, input_dir: str, output_dir: str,
                      checkpoint_dir: str) -> None:
    """Drain all currently-available files, then stop (incremental batch)."""
    pages = read_pages_stream(spark, input_dir)
    out = streaming_decisions(pages)
    q = (out.writeStream
         .format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .outputMode("append")
         .start())
    q.awaitTermination()


def streaming_sessionize(events: DataFrame, key: str = "user_id",
                         ts: str = "ts", gap: str = "30 minutes",
                         watermark: str = "1 hour") -> DataFrame:
    """Stateful gap-sessionization — the streaming twin of
    operators/joins.sessionize, via Structured Streaming's built-in
    session windows: events for a key whose gaps stay under ``gap``
    merge into one session; the watermark bounds session state and
    closes (emits) sessions once no in-gap event can still arrive.

    Boundary note: a batch gap of EXACTLY ``gap`` stays in-session
    (strict >), while session_window's half-open [ts, ts+gap) starts a
    new one — sub-second timestamps make this a measure-zero edge; the
    equivalence test uses off-boundary gaps.

    Output (append mode, one row per CLOSED session): key,
    session_start, session_end, n_events.
    """
    from pyspark.sql import functions as F

    return (events
            .withWatermark(ts, watermark)
            .groupBy(F.col(key),
                     F.session_window(F.col(ts), gap).alias("sw"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col(key),
                    F.col("sw.start").alias("session_start"),
                    F.col("sw.end").alias("session_end"),
                    "n_events"))


def host_quality_state(decided: DataFrame,
                       out_mode: str = "update") -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-host cumulative (n_docs, n_kept, keep_rate) maintained across
    micro-batches — the per-host health signal a long-running crawl
    filter feeds back to its scheduler (quality-collapsing hosts get
    deprioritized at the source).

    State per host is two longs — bounded by the host cardinality, not
    the document count; Arrow-batched like every other Python crossing
    in this engine (no per-row Python).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ("host string, n_docs bigint, n_kept bigint, "
                  "keep_rate double")
    state_schema = "n_docs bigint, n_kept bigint"

    def update(key, pdfs, state):
        n, k = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            k += int(pdf["keep"].sum())
        state.update((n, k))
        yield pd.DataFrame({"host": [key[0]], "n_docs": [n],
                            "n_kept": [k],
                            "keep_rate": [round(k / n, 6) if n else 0.0]})

    return (decided
            .select("host", "keep")
            .groupBy("host")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    out_mode,
                                    GroupStateTimeout.NoTimeout))


def streaming_needs_processing(new_stream: DataFrame,
                               previous: DataFrame,
                               key_col: str = "url",
                               text_col: str = "text") -> DataFrame:
    """Streaming twin of operators/snapshot.needs_processing: as the
    new crawl lands file-by-file, emit only pages that are NEW or whose
    text CHANGED vs the static previous snapshot — the incremental
    curation front-door (`--previous` in jobs/run_pipeline is the batch
    form; this is the continuous form).

    Shape: a stream-STATIC left join (supported stateless by Structured
    Streaming — no watermark or state store needed: the static side is
    a snapshot, each micro-batch joins against it map-side when the
    slim (key, md5) projection broadcasts). A page is re-emitted only
    when its key is absent from the previous snapshot (added) or its
    md5 differs (changed) — NULL text folds to '' exactly as in the
    batch operator, and the batch/stream results are proven equivalent
    by the availableNow pytest.
    """
    from pyspark.sql import functions as F

    txt = F.coalesce(F.col(text_col), F.lit(""))
    prev_slim = previous.select(
        F.col(key_col).alias("_pk"),
        F.md5(F.encode(F.coalesce(F.col(text_col), F.lit("")),
                       "UTF-8")).alias("_ph"))
    cur = new_stream.withColumn("_h", F.md5(F.encode(txt, "UTF-8")))
    joined = cur.join(
        prev_slim, cur[key_col] == prev_slim["_pk"], "left")
    status = (F.when(F.col("_ph").isNull(), F.lit("added"))
              .otherwise(F.lit("changed")))
    return (joined
            .where(F.col("_ph").isNull() | (F.col("_h") != F.col("_ph")))
            .withColumn("status", status)
            .drop("_pk", "_ph", "_h"))
