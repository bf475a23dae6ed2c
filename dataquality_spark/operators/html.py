"""HTML -> text extraction as a pure-codegen regexp chain.

The reference pipeline's per-row invariant is *byte-identical extracted
text per url*; `pipeline.extract_text_udf` handles the trivial synth
wrapper, while this module is the general extractor for real
Common-Crawl-style markup: script/style/comment removal, block-tag
newline structure, inline-tag stripping, a fixed named-entity decode,
and whitespace canonicalization.

Scale design: every rule is a built-in `regexp_replace` — the whole
extractor runs inside WholeStageCodegen on the JVM with ZERO Python
crossings, zero shuffles, and a scan that reads only the html column.
At 100 TB this is the difference between a map-only columnar pass and
an Arrow round-trip of the corpus' largest column.

Cross-engine exactness: the rule list deliberately stays inside the
regex subset where Java's engine (Spark) and RE2 (DuckDB) agree —
no backreferences (RE2 has none), no lookaround, inline `(?is)` flags,
non-greedy `.*?`, explicit character classes. `duckdb_extract_expr`
generates the DuckDB twin mechanically from the SAME rule list
(`regexp_replace(..., 'g')` for global, flags stay inline in the
pattern), so the two engines can never drift apart rule-by-rule. Both
use leftmost, non-overlapping, global replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Tags whose open OR close marks a block boundary -> newline. One
# alternation keeps the chain short (each rule is one codegen regex
# pass over the column).
_BLOCK_TAGS = ("p|div|br|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|td|th|table"
               "|thead|tbody|section|article|header|footer|nav|aside"
               "|blockquote|pre|hr|title|form|figure|figcaption|dl|dt|dd")

# (pattern, replacement) — applied IN ORDER.
HTML_RULES: list[tuple[str, str]] = [
    # 1-3: remove invisible content first, while its delimiters exist.
    (r"(?is)<script\b[^>]*>.*?</script\s*>", ""),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", ""),
    (r"(?s)<!--.*?-->", ""),
    # 4: block-level structure -> newline (open, close, or self-close).
    (rf"(?is)</?(?:{_BLOCK_TAGS})\b[^>]*>", "\n"),
    # 5: every remaining tag (inline markup) vanishes without a space,
    # so words split across <b>/<i>/<a> stay intact.
    (r"(?s)<[^>]*>", ""),
    # 6: fixed named-entity decode, AFTER tag stripping so a decoded
    # '<' can never be re-parsed as markup; &amp; decodes LAST so
    # '&amp;lt;' yields the literal '&lt;'. Numeric forms (&#160;) are
    # deliberately left verbatim: decoding them needs chr(), which a
    # pure-SQL twin cannot replay byte-exactly.
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&apos;", "'"),
    (r"&amp;", "&"),
    # 7: whitespace canon — horizontal runs to one space, then any
    # whitespace run containing a newline to ONE newline (blocks
    # become single lines; blank-line runs collapse), then edge trim.
    (r"[ \t\r\f]+", " "),
    (r"\s*\n\s*", "\n"),
    (r"^\s+", ""),
    (r"\s+$", ""),
]

LINK_PATTERN = r'(?is)<a\b[^>]*\bhref="([^"]*)"'


def extract_html_text(df: DataFrame, html_col: str = "html",
                      out_col: str = "text_extracted",
                      input_is_binary: bool = True) -> DataFrame:
    """Add `out_col` = plain text extracted from the HTML column.

    `input_is_binary=True` (the pages-table shape: html is BINARY)
    first decodes UTF-8 via CAST, mirroring DuckDB's decode(blob).
    Output lines are block-level units in document order; inline
    markup is dropped, HTML_RULES entities decoded, whitespace
    canonical (no leading/trailing, single spaces, single newlines).
    NULL html yields NULL text.
    """
    col = F.col(html_col).cast("string") if input_is_binary \
        else F.col(html_col)
    for pat, rep in HTML_RULES:
        col = F.regexp_replace(col, pat, rep)
    return df.withColumn(out_col, col)


def extract_links(df: DataFrame, html_col: str = "html",
                  out_col: str = "links",
                  input_is_binary: bool = True) -> DataFrame:
    """Add `out_col` = array of href targets in document order —
    the edge list for host-graph construction (link analysis /
    PageRank): one `regexp_extract_all` per row, pure codegen,
    zero shuffles, html never leaves the JVM.

    Matches double-quoted href attributes in anchor tags only
    (`<a ... href="...">`), the dominant Common-Crawl citation shape;
    unquoted/single-quoted hrefs are out of scope and skipped in BOTH
    engines (the DuckDB twin uses the same RE2-safe pattern).
    """
    col = F.col(html_col).cast("string") if input_is_binary \
        else F.col(html_col)
    return df.withColumn(
        out_col, F.regexp_extract_all(col, F.lit(LINK_PATTERN), 1))


def duckdb_extract_expr(col_expr: str) -> str:
    """The DuckDB twin of extract_html_text's chain, generated from
    the SAME HTML_RULES so the oracle cannot drift: nested
    regexp_replace(..., 'g') around `col_expr` (inline (?is) flags
    ride along in the pattern — RE2 honors them; 'g' makes the
    replacement global to match Spark/Java semantics)."""
    expr = col_expr
    for pat, rep in HTML_RULES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return expr


ANCHOR_PATTERN = r'(?is)<a\b[^>]*\bhref="([^"]*)"[^>]*>(.*?)</a\s*>'


def extract_anchor_pairs(df: DataFrame, html_col: str = "html",
                         out_col: str = "anchors",
                         input_is_binary: bool = True) -> DataFrame:
    """Add `out_col` = array<struct<href, anchor>> of (link target,
    anchor text) pairs in document order — the raw material for
    anchor-text reputation signals (what OTHER pages call a host is a
    quality/topic prior the host cannot fake).

    Alignment trick: hrefs and texts come from two regexp_extract_all
    calls with the IDENTICAL pattern (different capture group), so the
    two arrays index the same match list and arrays_zip can never
    misalign — anchors without a double-quoted href simply don't
    match. Anchor text is captured RAW (inner inline markup included);
    compose with extract_html_text-style cleanup downstream if needed.
    Pure codegen: two regex passes + a zip, zero Python, zero shuffles.
    """
    col = F.col(html_col).cast("string") if input_is_binary \
        else F.col(html_col)
    hrefs = F.regexp_extract_all(col, F.lit(ANCHOR_PATTERN), 1)
    texts = F.regexp_extract_all(col, F.lit(ANCHOR_PATTERN), 2)
    return df.withColumn(
        out_col,
        F.arrays_zip(hrefs.alias("href"), texts.alias("anchor")))


def anchor_text_counts(df: DataFrame, html_col: str = "html",
                       id_col: str | None = None,
                       input_is_binary: bool = True) -> DataFrame:
    """(host, anchor, n_refs, n_docs): how often each anchor string
    points at each target host, and from how many distinct documents —
    the aggregation behind anchor-text host reputation. One slim
    shuffle of (host, anchor, doc-id); html never leaves the scan
    stage. Relative hrefs (no host) aggregate under NULL host — keep
    or filter downstream. `id_col` identifies documents; without one,
    xxhash64(html) stands in (byte-identical docs then count once —
    usually the right thing after exact dedup)."""
    pairs = extract_anchor_pairs(df, html_col, "_an", input_is_binary)
    doc = (F.col(id_col) if id_col
           else F.xxhash64(F.col(html_col)))
    ex = pairs.select(
        doc.alias("_doc"),
        F.explode("_an").alias("_p")).select(
        "_doc",
        F.expr("parse_url(_p.href, 'HOST')").alias("host"),
        F.col("_p.anchor").alias("anchor"))
    return (ex.groupBy("host", "anchor")
            .agg(F.count(F.lit(1)).cast("long").alias("n_refs"),
                 F.count_distinct("_doc").cast("long").alias("n_docs")))


def markup_stats(df: DataFrame, html_col: str = "html",
                 input_is_binary: bool = True,
                 ratio_scale: int = 1_000_000) -> DataFrame:
    """Add per-page markup-density columns — the jusText/trafilatura
    family of boilerplate priors, computable without extracting
    anything: html_len (chars), n_tags, n_anchors, n_scripts,
    text_len (chars of extract_html_text output) and text_ratio_ppm
    (text_len·ratio_scale div html_len, an integer lattice so the
    ratio is engine-exact; 0 when html is empty). Low text ratio and
    high anchor density mark link farms and chrome-heavy pages; the
    thresholds belong downstream.

    Pure codegen: regexp_count for the tallies plus the extraction
    chain for text_len, all in one projection — zero Python, zero
    shuffles, scan pruned to the html column. NULL html yields NULL
    stats.
    """
    col = F.col(html_col).cast("string") if input_is_binary \
        else F.col(html_col)
    extracted = col
    for pat, rep in HTML_RULES:
        extracted = F.regexp_replace(extracted, pat, rep)
    return (df
            .withColumn("html_len", F.length(col).cast("long"))
            .withColumn("n_tags",
                        F.regexp_count(col, F.lit(r"(?s)<[^>]*>"))
                        .cast("long"))
            .withColumn("n_anchors",
                        F.regexp_count(col, F.lit(r"(?is)<a\b"))
                        .cast("long"))
            .withColumn("n_scripts",
                        F.regexp_count(col, F.lit(r"(?is)<script\b"))
                        .cast("long"))
            .withColumn("text_len", F.length(extracted).cast("long"))
            .withColumn(
                "text_ratio_ppm",
                F.when(F.col("html_len").isNull(),
                       F.lit(None).cast("long"))
                 .when(F.col("html_len") > 0,
                       F.expr(f"CAST(text_len * {int(ratio_scale)} AS "
                              f"BIGINT) div html_len"))
                 .otherwise(F.lit(0).cast("long"))))
