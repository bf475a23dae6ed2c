"""HTML -> text extraction (operators/html.py): pinned extraction
behavior, cross-engine byte identity vs the mechanically generated
DuckDB twin, link extraction, and adversarial markup."""

import duckdb
from pyspark.sql import functions as F

from dataquality_spark.operators import html as H


def _spark_extract(spark, cases):
    df = spark.createDataFrame(list(enumerate(cases)), "i long, h string")
    out = H.extract_html_text(df, "h", "t", input_is_binary=False)
    return {r.i: r.t for r in out.collect()}


def _duck_extract(cases):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT i, {H.duckdb_extract_expr('h')} FROM "
        f"(SELECT UNNEST(range({len(cases)})) AS i, UNNEST(?) AS h)",
        [list(cases)]).fetchall()
    return {r[0]: r[1] for r in rows}


class TestExtractHtmlText:
    def test_full_document_pinned(self, spark):
        doc = ('<html><head><title>My Title</title>'
               '<style>.x{color:red}</style>'
               '<script type="text/javascript">var x = "<p>";</script>'
               '</head><body><!-- nav -->'
               '<div class="nav">Home | <a href="/about">About</a></div>'
               '<h1>Head &amp; Tail</h1>'
               '<p>first   para with <b>bold</b> and <i>ital</i>.</p>'
               '<p>5 &lt; 6 &gt; 4 &quot;q&quot; &#39;a&#39; &nbsp;end</p>'
               '<ul><li>one</li><li>two</li></ul></body></html>')
        got = _spark_extract(spark, [doc])[0]
        assert got == ('My Title\nHome | About\nHead & Tail\n'
                       'first para with bold and ital.\n'
                       '5 < 6 > 4 "q" \'a\' end\none\ntwo')

    def test_script_content_never_leaks(self, spark):
        # the script BODY (including markup-looking strings) must
        # vanish, even across newlines
        doc = ('<p>before</p><script>\nif (a < b) { emit("<p>SPY</p>") }'
               '\n</script><p>after</p>')
        got = _spark_extract(spark, [doc])[0]
        assert got == 'before\nafter'
        assert 'SPY' not in got

    def test_unclosed_script_is_just_a_tag(self, spark):
        # no closing tag -> block rule can't fire; the open tag is
        # stripped as inline markup and the body survives as text
        # (deterministic, documented behavior — not silent truncation)
        got = _spark_extract(spark, ['<p>a</p><script>var x;'])[0]
        assert got == 'a\nvar x;'

    def test_entity_double_escape_order(self, spark):
        # '&amp;lt;' is the ESCAPED literal '&lt;' — decoding &amp;
        # last must yield the 4-char string, never '<'
        got = _spark_extract(spark, ['<p>&amp;lt; &amp;amp;</p>'])[0]
        assert got == '&lt; &amp;'

    def test_whitespace_canon_and_null(self, spark):
        cases = ['  leading <br>  and\r\ncrlf\t\ttabs  ',
                 'plain text, no markup',
                 '', None,
                 '<p>\n\n\n</p><p>x</p>']
        got = _spark_extract(spark, cases)
        assert got[0] == 'leading\nand\ncrlf tabs'
        assert got[1] == 'plain text, no markup'
        assert got[2] == ''
        assert got[3] is None
        assert got[4] == 'x'

    def test_numeric_entities_left_verbatim(self, spark):
        got = _spark_extract(spark, ['<p>&#160;&#x27;&eacute;</p>'])[0]
        assert got == '&#160;&#x27;&eacute;'

    def test_cross_engine_byte_identity(self, spark):
        cases = [
            '<html><body><h1>T &amp; U</h1><p>a<b>b</b>c</p></body></html>',
            '<SCRIPT>UPPER()</SCRIPT><P>case <A HREF="x">fold</A></P>',
            '<!-- c1 --><div>d<!-- c2\nmultiline --></div>',
            'literal < not a tag > and & alone',
            '<pre>  spaced\n  block  </pre>',
            '<p>unicode café — dash</p>',
            '  \n \t ', '',
        ]
        s, d = _spark_extract(spark, cases), _duck_extract(cases)
        for i in range(len(cases)):
            assert s[i] == d[i], (i, s[i], d[i])

    def test_binary_input_path(self, spark):
        df = spark.createDataFrame(
            [(1, '<p>café</p>'.encode())], "i long, html binary")
        got = H.extract_html_text(df, "html", "t").collect()[0].t
        assert got == 'café'


class TestExtractLinks:
    def test_links_in_order_and_anchors_only(self, spark):
        doc = ('<a href="/first">1</a><img href="/not-an-anchor">'
               '<A class="x" HREF="/second">2</A>'
               "<a href='/single-quoted'>skipped</a>"
               '<a href="">empty</a>')
        df = spark.createDataFrame([(1, doc)], "i long, h string")
        got = H.extract_links(df, "h", "links",
                              input_is_binary=False).collect()[0].links
        assert got == ['/first', '/second', '']

    def test_links_cross_engine(self, spark):
        cases = ['<a href="http://h/a">x</a> text <a href="/b#f">y</a>',
                 'no anchors', None]
        df = spark.createDataFrame(list(enumerate(cases)),
                                   "i long, h string")
        s = {r.i: r.links for r in H.extract_links(
            df, "h", "links", input_is_binary=False).collect()}
        con = duckdb.connect()
        d = {r[0]: r[1] for r in con.execute(
            f"SELECT i, regexp_extract_all(h, '{H.LINK_PATTERN}', 1) "
            f"FROM (SELECT UNNEST(range(3)) AS i, UNNEST(?) AS h)",
            [cases]).fetchall()}
        assert s == d


class TestAnchorPairs:
    def test_pairs_aligned_and_ordered(self, spark):
        doc = ('<a href="/a">first</a> mid '
               '<a name="no-href">skipped</a>'
               '<A HREF="https://h1.example/x" class="c">Second <b>bold</b></A>'
               '<a href="/c"></a>')
        df = spark.createDataFrame([(1, doc)], "i long, h string")
        got = H.extract_anchor_pairs(
            df, "h", "anchors", input_is_binary=False).collect()[0].anchors
        assert [(p.href, p.anchor) for p in got] == [
            ("/a", "first"),
            ("https://h1.example/x", "Second <b>bold</b>"),
            ("/c", ""),
        ]

    def test_anchor_text_counts(self, spark):
        rows = [
            (1, '<a href="https://h1.ex/a">Good Site</a>'
                '<a href="https://h1.ex/b">Good Site</a>'),
            (2, '<a href="https://h1.ex/c">Good Site</a>'
                '<a href="/relative">rel</a>'),
            (3, '<a href="https://h2.ex/">Spam</a>'),
        ]
        df = spark.createDataFrame(rows, "doc_id long, h string")
        got = {(r.host, r.anchor): (r.n_refs, r.n_docs)
               for r in H.anchor_text_counts(
                   df, "h", id_col="doc_id",
                   input_is_binary=False).collect()}
        assert got[("h1.ex", "Good Site")] == (3, 2)
        assert got[("h2.ex", "Spam")] == (1, 1)
        assert got[(None, "rel")] == (1, 1)


class TestMarkupStats:
    def test_counts_and_ratio(self, spark):
        doc = ('<html><body><script src="x"></script>'
               '<a href="/a">link</a><p>some visible text</p>'
               '</body></html>')
        df = spark.createDataFrame([(1, doc)], "i long, h string")
        r = H.markup_stats(df, "h", input_is_binary=False).collect()[0]
        assert r.html_len == len(doc)
        assert r.n_tags == 10
        assert r.n_anchors == 1
        assert r.n_scripts == 1
        # extracted text: 'link\nsome visible text'
        assert r.text_len == len("link\nsome visible text")
        assert r.text_ratio_ppm == r.text_len * 1_000_000 // len(doc)

    def test_empty_and_null(self, spark):
        df = spark.createDataFrame([(1, ""), (2, None)],
                                   "i long, h string")
        got = {r.i: r for r in H.markup_stats(
            df, "h", input_is_binary=False).collect()}
        assert got[1].html_len == 0 and got[1].text_ratio_ppm == 0
        assert got[2].html_len is None and got[2].text_ratio_ppm is None

    def test_link_farm_signature(self, spark):
        farm = "".join(f'<a href="/l{i}">x</a>' for i in range(50))
        prose = "<p>" + ("real words " * 50) + "</p>"
        df = spark.createDataFrame([(1, farm), (2, prose)],
                                   "i long, h string")
        got = {r.i: r for r in H.markup_stats(
            df, "h", input_is_binary=False).collect()}
        assert got[1].n_anchors == 50 and got[2].n_anchors == 0
        assert got[1].text_ratio_ppm < got[2].text_ratio_ppm


class TestCrossEngineFuzz:
    """Hypothesis fuzz: on RANDOM markup-ish strings the Spark (Java
    regex) and DuckDB (RE2) extraction chains must agree byte-for-byte
    — the strongest guard against dialect drift in HTML_RULES."""

    def test_random_markup_agrees(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        frag = st.one_of(
            st.text(alphabet="<>&; \t\r\n\"'abcZ09é—", max_size=12),
            st.sampled_from([
                "<p>", "</p>", "<script>", "</script>", "<style>",
                "</style>", "<!--", "-->", "<a href=\"x\">", "</a>",
                "&amp;", "&lt;", "&nbsp;", "&#39;", "<br/>", "<DIV >",
                "< div", "<<p>>", "</ p>", "&amp;lt;",
            ]))
        docs = st.lists(st.lists(frag, max_size=14).map("".join),
                        min_size=1, max_size=8)

        collected: list[list[str]] = []

        @settings(max_examples=30, deadline=None)
        @given(docs)
        def _gather(case):
            collected.append(case)

        _gather()
        # one Spark job over every generated corpus (per-example Spark
        # jobs would be 30x slower for no extra coverage)
        cases = [s for case in collected for s in case]
        s = _spark_extract(spark, cases)
        d = _duck_extract(cases)
        for i, raw in enumerate(cases):
            assert s[i] == d[i], (repr(raw), s[i], d[i])
