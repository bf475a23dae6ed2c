"""Gopher/C4 heuristic document statistics as pure Catalyst expressions.

These are the validity / completeness / uniqueness(-within-doc) rules
(reference dimensions: /root/reference/DataQuality_AI_CaseStudy.md:108-147)
expressed entirely with built-in pyspark.sql.functions — they run inside
whole-stage codegen with zero Python on the hot path. The pure-pandas
oracle (dataquality_spark.oracle) reimplements the same math independently
so the pipeline-vs-oracle tests are non-circular.

Emitted columns (given a `text` string column):
  n_words, mean_word_len, symbol_ratio, stopword_count, stopword_frac,
  n_lines, repeated_line_frac
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import config as C


def words_col(text: Column) -> Column:
    """Array of words: split on ASCII whitespace, empties removed.

    Matches Python str.split() on corpora that only use ' '/'\\n'/'\\t'/'\\r'
    separators (the engine-wide tokenization contract, config.WORD_SPLIT_REGEX).
    """
    return F.filter(F.split(text, C.WORD_SPLIT_REGEX), lambda w: w != "")


def lines_col(text: Column) -> Column:
    """Array of non-empty lines (exact '\\n' segments, no trimming)."""
    return F.filter(F.split(text, "\n", -1), lambda l: l != "")


def stats_columns_cheap() -> list[Column]:
    """The allocation-free arithmetic stats only: n_words (regexp run
    count), mean_word_len (translate/length arithmetic), symbol_ratio.
    The word/line-array stats (stopwords, repeated lines) are computed
    in the pipeline's fused pandas UDF where the text transfer is
    already paid — building those arrays JVM-side was the largest
    non-scaling allocation cost at high parallelism."""
    text = F.coalesce(F.col("text"), F.lit(""))
    n_words = F.regexp_count(text, F.lit("[^ \\n\\t\\r]+")).cast("long")
    total_word_chars = F.length(
        F.translate(text, " \n\t\r", "")).cast("long")
    n_symbols = F.length(text) - F.length(F.translate(text, C.SYMBOL_CHARS,
                                                      ""))
    return [
        n_words.alias("n_words"),
        F.when(n_words > 0,
               total_word_chars.cast("double") / n_words.cast("double"))
         .otherwise(F.lit(0.0)).alias("mean_word_len"),
        F.when(n_words > 0,
               n_symbols.cast("double") / n_words.cast("double"))
         .otherwise(F.lit(0.0)).alias("symbol_ratio"),
    ]


def stats_columns() -> list[Column]:
    """Stat columns over a `text` column; select alongside the input.

    NULL text is treated as the empty document (n_words = 0) — without the
    coalesce, split(NULL) propagates NULL through size() and every rule
    predicate would silently evaluate to NULL (doc passes all rules).
    """
    text = F.coalesce(F.col("text"), F.lit(""))
    words = words_col(text)
    lines = lines_col(text)
    # n_words = count of maximal non-separator runs: one regex pass, no
    # word-array allocation (identical to size(split+filter)).
    n_words = F.regexp_count(text, F.lit("[^ \\n\\t\\r]+")).cast("long")
    # total word chars = total non-whitespace chars: translate+length
    # arithmetic instead of an array fold (identical by definition —
    # words are exactly the non-separator characters).
    total_word_chars = F.length(
        F.translate(text, " \n\t\r", "")).cast("long")
    # Symbol chars are never whitespace, so counting over the raw text equals
    # counting over words; translate+length diff stays in codegen (no arrays).
    n_symbols = F.length(text) - F.length(F.translate(text, C.SYMBOL_CHARS, ""))
    # isin over a literal list optimizes to InSet (hash lookup per word).
    stopword_count = F.size(F.filter(
        words, lambda w: F.lower(w).isin(C.ALL_STOPWORDS))).cast("long")
    n_lines = F.size(lines).cast("long")
    n_distinct_lines = F.size(F.array_distinct(lines)).cast("long")
    return [
        n_words.alias("n_words"),
        F.when(n_words > 0,
               total_word_chars.cast("double") / n_words.cast("double"))
         .otherwise(F.lit(0.0)).alias("mean_word_len"),
        F.when(n_words > 0,
               n_symbols.cast("double") / n_words.cast("double"))
         .otherwise(F.lit(0.0)).alias("symbol_ratio"),
        stopword_count.alias("stopword_count"),
        F.when(n_words > 0,
               stopword_count.cast("double") / n_words.cast("double"))
         .otherwise(F.lit(0.0)).alias("stopword_frac"),
        n_lines.alias("n_lines"),
        F.when(n_lines > 0,
               (n_lines - n_distinct_lines).cast("double")
               / n_lines.cast("double"))
         .otherwise(F.lit(0.0)).alias("repeated_line_frac"),
    ]
