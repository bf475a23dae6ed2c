"""Curation operators: decontamination, deterministic splits/sampling,
repeated-line removal (operators/curation.py)."""

import pytest
from pyspark.sql import functions as F

from dataquality_spark.operators import curation
from dataquality_spark.operators import dedup as dedup_mod


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestDecontaminate:
    def test_planted_overlap(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta iota " \
               "kappa lam mu nu xi omicron pi rho sigma tau"  # 19 words
        train = _docs(spark, [
            (1, base),                       # contains the eval 13-gram
            (2, "totally different words " * 5),
            (3, None),                       # NULL text → 0 shingles
            (4, "short doc"),                # < n words → 0 shingles
        ])
        # eval doc = words 3..19 of base (17 words → five 13-grams)
        ev = _docs(spark, [(100, " ".join(base.split()[2:]))])
        out = curation.decontaminate(train, ev, "text", "doc_id",
                                     n=13, min_overlap=1)
        got = {r["doc_id"]: r for r in out.collect()}
        assert got[1]["contaminated"] and got[1]["n_matched"] == 5
        assert got[1]["n_shingles"] == 7     # 19 words → 7 13-grams
        for d in (2, 3, 4):
            assert not got[d]["contaminated"] and got[d]["n_matched"] == 0
        assert got[3]["n_shingles"] == 0 and got[4]["n_shingles"] == 0

    def test_min_overlap_threshold(self, spark):
        words = [f"w{i}" for i in range(20)]
        train = _docs(spark, [(1, " ".join(words))])
        ev = _docs(spark, [(9, " ".join(words[:13]))])  # exactly 1 shared
        strict = curation.decontaminate(train, ev, "text", "doc_id",
                                        n=13, min_overlap=2)
        loose = curation.decontaminate(train, ev, "text", "doc_id",
                                       n=13, min_overlap=1)
        assert not strict.collect()[0]["contaminated"]
        assert loose.collect()[0]["contaminated"]

    def test_eval_set_is_broadcast(self, spark):
        train = _docs(spark, [(i, f"doc number {i} body text") for i in
                              range(10)])
        ev = _docs(spark, [(0, "doc number 0 body text")])
        out = curation.decontaminate(train, ev, "text", "doc_id", n=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestSplits:
    def test_fractions_and_determinism(self, spark):
        df = spark.range(20000).withColumnRenamed("id", "k")
        for method in ("xxhash64", "lcg"):
            out = curation.split_assign(df, "k",
                                        {"train": 0.8, "val": 0.1,
                                         "test": 0.1}, method=method)
            counts = {r["split"]: r["n"] for r in
                      out.groupBy("split").agg(F.count("*").alias("n"))
                      .collect()}
            assert sum(counts.values()) == 20000
            assert abs(counts["train"] / 20000 - 0.8) < 0.02
            assert abs(counts["val"] / 20000 - 0.1) < 0.01
            # identical assignment on re-run (no rand() anywhere)
            again = curation.split_assign(df, "k",
                                          {"train": 0.8, "val": 0.1,
                                           "test": 0.1}, method=method)
            assert out.exceptAll(again).count() == 0

    def test_salt_changes_assignment(self, spark):
        df = spark.range(5000).withColumnRenamed("id", "k")
        a = curation.split_assign(df, "k", {"a": 0.5, "b": 0.5}, salt=0)
        b = curation.split_assign(df, "k", {"a": 0.5, "b": 0.5}, salt=1)
        moved = (a.select("k", "split").join(
            b.select("k", F.col("split").alias("s2")), "k")
            .where("split <> s2").count())
        assert moved > 1000  # ~half the keys re-bucket under a new salt

    def test_no_shuffle_in_plan(self, spark):
        df = spark.range(100).withColumnRenamed("id", "k")
        out = curation.split_assign(df, "k")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure narrow projection


class TestStratifiedSample:
    def test_rates_monotone_nested(self, spark):
        df = (spark.range(10000)
              .select(F.col("id").alias("k"),
                      (F.col("id") % 3).cast("string").alias("s")))
        lo = curation.stratified_sample(df, "s", {"0": 0.2, "1": 0.5,
                                                  "2": 0.0}, "k")
        hi = curation.stratified_sample(df, "s", {"0": 0.6, "1": 0.9,
                                                  "2": 0.0}, "k")
        assert lo.select("k").exceptAll(hi.select("k")).count() == 0
        n_lo = lo.groupBy("s").count().collect()
        got = {r["s"]: r["count"] for r in n_lo}
        assert abs(got["0"] / (10000 / 3) - 0.2) < 0.05
        assert abs(got["1"] / (10000 / 3) - 0.5) < 0.05
        assert "2" not in got

    def test_default_rate_for_unknown_stratum(self, spark):
        df = (spark.range(1000)
              .select(F.col("id").alias("k"), F.lit("zzz").alias("s")))
        none = curation.stratified_sample(df, "s", {"a": 1.0}, "k")
        all_ = curation.stratified_sample(df, "s", {"a": 0.0}, "k",
                                          default_rate=1.0)
        assert none.count() == 0 and all_.count() == 1000


class TestDedupeParagraphsGlobal:
    def test_global_first_occurrence(self, spark):
        df = _docs(spark, [
            (1, "a\nb\nc"),
            (2, "b\nd\na"),   # b and a already seen in doc 1
            (3, "a\nb\nc"),   # whole doc duplicated → nothing kept
            (4, "x\nx\ny"),   # within-doc repeat
            (5, None),
        ])
        out = {r["doc_id"]: r for r in
               curation.dedupe_paragraphs_global(df, "text", "doc_id")
               .collect()}
        assert out[1]["text_kept"] == "a\nb\nc"
        assert out[2]["text_kept"] == "d" and out[2]["n_kept"] == 1
        assert out[3]["text_kept"] == "" and out[3]["n_kept"] == 0
        assert out[4]["text_kept"] == "x\ny"
        assert all(out[d]["n_paragraphs"] == 3 for d in (1, 2, 3, 4))

    def test_drop_list_broadcasts_at_runtime(self, spark):
        """The winner aggregate runs on slim (id, pos, hash64) triples
        and AQE broadcasts the small drop-list back onto the original
        rows — after execution the adaptive plan must contain a
        broadcast join, so document text never crosses an exchange."""
        df = _docs(spark, [(i, f"para {i}\nshared line") for i in
                           range(200)])
        out = curation.dedupe_paragraphs_global(df, "text", "doc_id")
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestDedupeLines:
    def test_first_occurrence_kept(self, spark):
        df = _docs(spark, [(1, "a\nb\na\nc\nb\na"),
                           (2, "x\ny"),
                           (3, ""),
                           (4, None)])
        out = {r["doc_id"]: r for r in
               curation.dedupe_lines(df, "text").collect()}
        assert out[1]["text_dedup"] == "a\nb\nc"
        assert (out[1]["n_lines"], out[1]["n_unique_lines"]) == (6, 3)
        assert out[1]["dup_line_frac"] == 0.5
        assert out[2]["text_dedup"] == "x\ny"
        assert out[2]["dup_line_frac"] == 0.0
        # empty and NULL text → single empty line, nothing dropped
        for d in (3, 4):
            assert out[d]["text_dedup"] == ""
            assert out[d]["dup_line_frac"] == 0.0


class TestSimhashMd5Twin:
    def test_twin_equals_production_bit_bank(self, spark):
        """The md5-60-bit twin and the production numpy bit-bank use
        identical majority semantics (votes > 0, ties → 0), so fed the
        SAME feature hashes they must produce the SAME signature (md5
        hashes are < 2^60, so bits 60..63 vote 0 in the 64-bit bank)."""
        import pandas as pd

        from dataquality_spark.operators import dedup

        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta"),
             (2, "one two three four five six seven eight"),
             (3, "x"),            # < shingle_n words → empty shingles
             (4, None)],
            ["doc_id", "text"])
        twin = {r["doc_id"]: r["simhash_md5"] for r in
                dedup.simhash_md5(df, "text", "doc_id", shingle_n=2)
                .collect()}
        hashes = {r["doc_id"]: r["sh"] for r in
                  df.select("doc_id",
                            dedup.md5_shingle_hashes(
                                df["text"], 2).alias("sh")).collect()}
        bank = dedup.simhash64_udf.func(
            pd.Series([hashes[d] for d in sorted(hashes)]))
        for i, d in enumerate(sorted(hashes)):
            assert twin[d] == int(bank.iloc[i]), d
        assert twin[3] == 0 and twin[4] == 0


class TestReviewRegressions:
    def test_blank_lines_survive_global_paragraph_dedup(self, spark):
        """Blank-line separators are structure, not content: every doc
        keeps its blank lines even though '' repeats corpus-wide."""
        df = _docs(spark, [(1, "p1\n\np2"), (2, "p3\n\np4"),
                           (3, "p1\n\np5")])
        out = {r["doc_id"]: r for r in
               curation.dedupe_paragraphs_global(df, "text", "doc_id")
               .collect()}
        assert out[1]["text_kept"] == "p1\n\np2"
        assert out[2]["text_kept"] == "p3\n\np4"
        assert out[3]["text_kept"] == "\np5"    # only 'p1' deduped

    def test_blank_lines_survive_intra_doc_dedup(self, spark):
        df = _docs(spark, [(1, "a\n\nb\n\na")])
        row = curation.dedupe_lines(df, "text").collect()[0]
        assert row["text_dedup"] == "a\n\nb\n"   # both blanks kept

    def test_split_assign_rejects_bad_fractions(self, spark):
        import pytest
        df = spark.range(10).withColumnRenamed("id", "k")
        with pytest.raises(ValueError):
            curation.split_assign(df, "k", {"a": 1.2, "b": -0.2})
        with pytest.raises(ValueError):
            curation.split_assign(df, "k", {"a": 0.7, "b": 0.7})

    def test_stratified_sample_empty_rates_uses_default(self, spark):
        df = (spark.range(100)
              .select(F.col("id").alias("k"), F.lit("s").alias("g")))
        assert curation.stratified_sample(df, "g", {}, "k").count() == 0
        assert curation.stratified_sample(
            df, "g", {}, "k", default_rate=1.0).count() == 100

    def test_decontaminate_single_text_pass(self, spark):
        """The slim shingle table is persisted so the corpus is
        shingled once, and the cache registry releases it."""
        from dataquality_spark import caching
        caching.unpersist_all()
        jsc = spark.sparkContext._jsc.sc()
        # earlier test modules may leave localCheckpoint RDDs that only
        # the ContextCleaner reclaims — assert RELATIVE to that floor
        base = jsc.getPersistentRDDs().size()
        train = _docs(spark, [(i, f"w{i} a b c") for i in range(10)])
        ev = _docs(spark, [(0, "a b c")])
        out = curation.decontaminate(train, ev, "text", "doc_id", n=2)
        out.collect()
        assert jsc.getPersistentRDDs().size() > base
        caching.unpersist_all()
        assert jsc.getPersistentRDDs().size() == base


# ---------------------------------------------------------------------------
# Property-based checks (Spark-batched, small example counts)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_line = st.text(alphabet="ab x", max_size=6)
_doc = st.lists(_line, min_size=0, max_size=5).map("\n".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


class TestCurationProperties:
    @settings(max_examples=8, deadline=None)
    @given(_corpus)
    def test_dedupe_lines_idempotent(self, spark, docs):
        df = _docs(spark, list(enumerate(docs)))
        once = curation.dedupe_lines(df, "text").select(
            "doc_id", F.col("text_dedup").alias("text"))
        twice = curation.dedupe_lines(once, "text")
        rows = twice.select("text", "text_dedup").collect()
        assert all(r["text"] == r["text_dedup"] for r in rows)

    @settings(max_examples=8, deadline=None)
    @given(_corpus)
    def test_dedupe_paragraphs_global_idempotent(self, spark, docs):
        df = _docs(spark, list(enumerate(docs)))
        once = curation.dedupe_paragraphs_global(df, "text", "doc_id") \
            .select("doc_id", F.col("text_kept").alias("text"))
        twice = curation.dedupe_paragraphs_global(once, "text", "doc_id")
        rows = twice.select("text", "text_kept").collect()
        assert all(r["text"] == r["text_kept"] for r in rows)

    @settings(max_examples=20, deadline=None)
    @given(st.integers(min_value=0, max_value=2**62),
           st.integers(min_value=1, max_value=10**6))
    def test_lcg_bucket_range_and_determinism(self, key, buckets):
        from dataquality_spark.operators.curation import (_LCG_A, _LCG_C,
                                                          _LCG_M)
        h = (((key % _LCG_M) * _LCG_A + _LCG_C) % _LCG_M) % buckets
        assert 0 <= h < buckets
        # pure int64 arithmetic: no overflow anywhere in the chain
        assert (key % _LCG_M) * _LCG_A + _LCG_C < 2**63


class TestHostBlocklist:
    def test_filter_and_broadcast_plan(self, spark):
        df = spark.createDataFrame(
            [(1, "https://bad.example.com/a"),
             (2, "https://good.example.org/b"),
             (3, "http://bad.example.com/c?q=1"),
             (4, "https://also-good.net/")],
            ["doc_id", "url"])
        bl = spark.createDataFrame([("bad.example.com",)], ["h"])
        out = curation.host_blocklist_filter(df, "url", bl)
        kept = {r["doc_id"]: r["host"] for r in out.collect()}
        assert set(kept) == {2, 4}
        assert kept[2] == "good.example.org"
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan and "LeftAnti" in plan


class TestTopNgramFrac:
    def test_matches_python_counter(self, spark):
        """The in-array sorted-run fold must equal a direct Counter over
        word 2-grams, including repeats, short docs and NULLs."""
        from collections import Counter

        from dataquality_spark.operators import text_analysis as ta

        docs = [(1, "a b a b a b c"), (2, "x y z"), (3, "w"),
                (4, None), (5, "q q q q"), (6, "r s r s r s r s")]
        out = {r["doc_id"]: r for r in
               ta.top_ngram_frac(spark.createDataFrame(
                   docs, ["doc_id", "text"])).collect()}
        for doc_id, text in docs:
            ws = (text or "").split()
            grams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
            top = max(Counter(grams).values()) if grams else 0
            assert out[doc_id]["n_ngrams"] == len(grams)
            assert out[doc_id]["top_ngram_count"] == top, doc_id
            exp = round(top / len(grams), 6) if grams else 0.0
            assert out[doc_id]["top_ngram_frac"] == exp


class TestDecontaminateNormalize:
    def test_case_and_punct_insensitive_matching(self, spark):
        words = [f"w{i}" for i in range(15)]
        clean = " ".join(words)
        messy = " ".join(w.upper() + "," for w in words)   # 'W0, W1, ...'
        train = _docs(spark, [(1, messy)])
        ev = _docs(spark, [(9, clean)])
        exact = curation.decontaminate(train, ev, "text", "doc_id", n=13)
        norm = curation.decontaminate(train, ev, "text", "doc_id", n=13,
                                      normalize=True)
        assert not exact.collect()[0]["contaminated"]
        assert norm.collect()[0]["contaminated"]


class TestPackSequences:
    def test_offsets_contiguous_and_partition_invariant(self, spark):
        import pandas as pd
        df = spark.createDataFrame(
            [(i, 30 + (i * 7) % 50) for i in range(200)],
            ["doc_id", "n_tok"])
        out = curation.pack_sequences(df, "n_tok", "doc_id",
                                      capacity=128, shards=4).toPandas()
        for _, g in out.groupby("shard"):
            g = g.sort_values("doc_id")
            # offset = running sum of previous docs' tokens (contiguous
            # token stream, no gaps or overlaps)
            expect = g["n_tok"].cumsum().shift(fill_value=0)
            assert (g["tok_offset"].to_numpy()
                    == expect.to_numpy()).all()
            assert (g["seq_no"] == g["tok_offset"] // 128).all()
            assert (g["spans_boundary"]
                    == (g["tok_offset"] % 128 + g["n_tok"] > 128)).all()
        # identical assignment regardless of input partitioning
        out2 = curation.pack_sequences(df.repartition(7), "n_tok",
                                       "doc_id", capacity=128,
                                       shards=4).toPandas()
        a = out.sort_values("doc_id").reset_index(drop=True)
        b = out2.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestMinhashCross:
    def test_new_vs_reference_recall_and_direction(self, spark):
        """Every truncated new doc must match its reference source (and
        only sources): the incremental-crawl dedup scenario."""
        from dataquality_spark.operators import dedup

        base = [(i, " ".join(f"tok{i}_{j}" for j in range(40)))
                for i in range(30)]
        ref = spark.createDataFrame(base, ["doc_id", "text"])
        new = spark.createDataFrame(
            [(i + 1000, " ".join(t.split()[:32]))      # 80% truncation
             for i, t in base] +
            [(9999, "completely unrelated fresh words here")],
            ["doc_id", "text"])
        pairs = dedup.minhash_lsh_pairs_cross(
            new, ref, "text", "doc_id", shingle_n=3,
            num_perm=128, bands=64, jaccard_threshold=0.5).collect()
        got = {(r["new_id"], r["ref_id"]) for r in pairs}
        assert got == {(i + 1000, i) for i in range(30)}
        assert all(r["jaccard"] >= 0.5 for r in pairs)


class TestExactDedupCross:
    def test_null_and_copy_semantics(self, spark):
        ref = _docs(spark, [(1, "kept text"), (2, ""), (3, "other")])
        new = _docs(spark, [(10, "kept text"),    # exact copy → dropped
                            (11, "brand new"),
                            (12, None),           # NULL not in ref → kept
                            (13, "")])            # '' in ref → dropped
        kept = {r["doc_id"] for r in
                dedup_mod.exact_dedup_cross(new, ref, "text", "doc_id")
                .collect()}
        assert kept == {11, 12}
        # NULL in ref drops NULL in new (NULL matches NULL, never '')
        ref2 = spark.createDataFrame([(1, None)],
                                     "doc_id long, text string")
        kept2 = {r["doc_id"] for r in
                 dedup_mod.exact_dedup_cross(new, ref2, "text", "doc_id")
                 .collect()}
        assert 12 not in kept2 and 13 in kept2

    def test_verify_mode_same_result_and_columns(self, spark):
        """verify=True (128-bit md5 appended to the join key) keeps the
        same decisions on collision-free data and leaks no key cols."""
        ref = _docs(spark, [(1, "kept text"), (2, "")])
        new = _docs(spark, [(10, "kept text"), (11, "brand new"),
                            (12, None), (13, "")])
        out = dedup_mod.exact_dedup_cross(new, ref, "text", "doc_id",
                                          verify=True)
        assert {r["doc_id"] for r in out.collect()} == {11, 12}
        assert set(out.columns) == set(new.columns)


class TestCanonicalizeUrl:
    CASES = [
        # fragment dropped, scheme+host lowered, :443 stripped, www
        # stripped, trailing slash stripped, params sorted, utm_* gone
        ("HTTPS://WWW.Site.COM:443/A/Path/?utm_source=x&b=2&a=1#frag",
         "https://site.com/A/Path?a=1&b=2"),
        (":80 stripped, no query, path case preserved",
         None),
        ("http://site.com:80/Doc", "http://site.com/Doc"),
        # non-default port kept; tracking-only query → no '?'
        ("http://site.com:8080/x?gclid=1&utm_campaign=y",
         "http://site.com:8080/x"),
        # bare host, no path, no query
        ("HTTP://Example.Org", "http://example.org"),
        # fragment only
        ("http://a.com/p#Sec", "http://a.com/p"),
        # schemeless crawl url → normalized to http://
        ("WWW.Site.com/Path?b=2&a=1", "http://site.com/Path?a=1&b=2"),
        # protocol-relative → http://, host survives
        ("//cdn.example.com/lib.js", "http://cdn.example.com/lib.js"),
        # NON-default ports are distinct origins and must survive
        ("http://site.com:443/a", "http://site.com:443/a"),
        ("https://site.com:80/a", "https://site.com:80/a"),
    ]

    def test_handcrafted(self, spark):
        cases = [(i, raw) for i, (raw, want) in enumerate(self.CASES)
                 if want is not None]
        want = {i: w for i, (raw, w) in enumerate(self.CASES)
                if w is not None}
        df = spark.createDataFrame(cases, "i long, url string")
        got = {r["i"]: r["c"] for r in
               df.select("i", curation.canonicalize_url(F.col("url"))
                         .alias("c")).collect()}
        assert got == want

    def test_strip_www_flag(self, spark):
        df = spark.createDataFrame([(1, "http://www.a.com/x")],
                                   "i long, url string")
        keep = df.select(curation.canonicalize_url(
            F.col("url"), strip_www=False).alias("c")).head()["c"]
        assert keep == "http://www.a.com/x"


class TestRepeatUpsample:
    def test_lcg_exact_vs_python(self, spark):
        rows = [(i, 0.5 + (i % 40) / 16.0) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, wt double")
        got = (curation.repeat_upsample(df, "doc_id", "wt",
                                        salt=3, method="lcg")
               .select("doc_id", "n_copies", "copy_idx")
               .orderBy("doc_id", "copy_idx").collect())
        import math
        expect = []
        for i, w in rows:
            b = ((i % 2147483648) * 1103515245 + 12345 + 3) \
                % 2147483648 % 1_000_000
            n = math.floor(w) + (1 if b < math.floor((w - math.floor(w))
                                                     * 1_000_000) else 0)
            expect += [(i, n, c) for c in range(1, n + 1)]
        assert [(r.doc_id, r.n_copies, r.copy_idx) for r in got] == expect

    def test_xxhash_deterministic_and_unbiased(self, spark):
        rows = [(i, 1.25) for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id long, wt double")
        out = curation.repeat_upsample(df, "doc_id", "wt")
        n1 = out.count()
        n2 = curation.repeat_upsample(df.repartition(7), "doc_id",
                                      "wt").count()
        assert n1 == n2                       # retry/partitioning stable
        # E[count] = 2000*1.25 = 2500; binomial sd ≈ 19 → ±5 sd window
        assert 2400 <= n1 <= 2600
        # weight < 1 rows can drop entirely; copy_idx always contiguous
        low = curation.repeat_upsample(
            spark.createDataFrame([(1, 0.0), (2, 0.999)],
                                  "doc_id long, wt double"),
            "doc_id", "wt").collect()
        assert all(r.copy_idx == 1 for r in low)


class TestTokenBudgetSample:
    """token_budget_sample: per-group greedy quota in deterministic
    hash-priority order, cutoff-rewrite ≡ direct window formula."""

    def _ref_keep(self, rows, budget, budgets=None, salt=0):
        # pure-Python greedy over the same LCG priority
        A, C, M = 1103515245, 12345, 2147483648
        by_g = {}
        for doc_id, g, t in rows:
            by_g.setdefault(g, []).append(
                (((doc_id % M) * A + C + salt) % M, doc_id, t))
        keep = set()
        for g, items in by_g.items():
            b = (budgets or {}).get(g, budget)
            cum = 0
            for prio, doc_id, t in sorted(items):
                if cum < b:
                    keep.add(doc_id)
                cum += t
        return keep

    def test_matches_reference_and_overshoot(self, spark):
        rows = [(i, ["a", "b", "c"][i % 3], (i * 37) % 400 + 1)
                for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, g string, tok long")
        out = curation.token_budget_sample(
            df, "g", "tok", "doc_id", budget=6000, budgets={"b": 900},
            salt=5, method="lcg")
        got = {r.doc_id for r in out.collect()}
        assert got == self._ref_keep(rows, 6000, {"b": 900}, salt=5)
        # overshoot ≤ one document: dropping the LAST kept doc (max
        # priority) must bring the group back under budget
        kept = out.collect()
        A, C, M = 1103515245, 12345, 2147483648
        for g, b in (("a", 6000), ("b", 900), ("c", 6000)):
            grp = [r for r in kept if r.g == g]
            tot = sum(r.tok for r in grp)
            last = max(grp, key=lambda r: (((r.doc_id % M) * A + C + 5)
                                           % M, r.doc_id))
            assert tot - last.tok < b <= max(tot, b)

    def test_partitioning_invariant_and_nested(self, spark):
        rows = [(i, "g" + str(i % 5), (i * 13) % 200 + 1)
                for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, g string, tok long")
        a = {r.doc_id for r in curation.token_budget_sample(
            df, "g", "tok", "doc_id", budget=2500).collect()}
        b = {r.doc_id for r in curation.token_budget_sample(
            df.repartition(13), "g", "tok", "doc_id",
            budget=2500).collect()}
        assert a == b                       # retry/partitioning stable
        bigger = {r.doc_id for r in curation.token_budget_sample(
            df, "g", "tok", "doc_id", budget=5000).collect()}
        assert a <= bigger                  # nested: raising only adds

    def test_zero_budget_and_keep_all(self, spark):
        rows = [(i, "only", 10) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, g string, tok long")
        none = curation.token_budget_sample(df, "g", "tok", "doc_id",
                                            budget=0)
        assert none.count() == 0
        allk = curation.token_budget_sample(df, "g", "tok", "doc_id",
                                            budget=10_000_000)
        assert allk.count() == 20

    def test_text_never_joins_slim_side(self, spark):
        rows = [(i, "g", 10, "payload " * 50) for i in range(50)]
        df = spark.createDataFrame(
            rows, "doc_id long, g string, tok long, text string")
        out = curation.token_budget_sample(df, "g", "tok", "doc_id",
                                           budget=200)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # decision side broadcasts one row per group back onto the corpus
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" \
            not in plan
        got = out.select("doc_id", "text").collect()
        assert all(r.text.startswith("payload") for r in got)


class TestTemperatureSample:
    """temperature_sample: p_g ∝ n_g^alpha as a deterministic per-group
    downsampling rate on the integer lattice — bit-identical to the
    pure-Python reference for any corpus."""

    _M, _A, _C = 2147483648, 1103515245, 12345

    def _ref_keep(self, rows, target, alpha, salt, buckets=1_000_000,
                  scale=1000, sizes=None):
        import math

        n = {}
        for doc_id, g in rows:
            n[g] = n.get(g, 0) + (sizes[doc_id] if sizes else 1)
        w = {}
        for g, ng in n.items():
            p = (math.sqrt(ng) if alpha == 0.5
                 else float(ng) if alpha == 1.0
                 else 1.0 if alpha == 0.0 else ng ** alpha)
            w[g] = math.floor(p * scale)
        W = sum(w.values())
        thr = {g: min(buckets, (target * w[g] * buckets) // (W * n[g]))
               for g in n}
        def bucket(k):
            return (((k % self._M) * self._A + self._C + salt)
                    % self._M) % buckets
        return {d for d, g in rows if bucket(d) < thr[g]}

    def test_matches_reference_alpha_half(self, spark):
        rows = [(i, ["en"] * 6 + ["de", "de", "fr", "zz"]) for i in range(400)]
        rows = [(i, r[1][i % 10]) for i, r in enumerate(rows)]
        df = spark.createDataFrame(rows, "doc_id long, g string")
        out = curation.temperature_sample(df, "g", "doc_id", 150,
                                          alpha=0.5, salt=3, method="lcg")
        got = {r.doc_id for r in out.collect()}
        assert got == self._ref_keep(rows, 150, 0.5, 3)
        # flattening: the dominant group's kept SHARE must be below its
        # corpus share; the smallest group's above
        kept = out.groupBy("g").count().collect()
        share = {r.g: r["count"] for r in kept}
        assert share.get("en", 0) / max(1, len(got)) < 0.6  # corpus share
        assert share.get("zz", 0) > 0

    def test_alpha_one_is_uniform_global_downsample(self, spark):
        rows = [(i, "g" + str(i % 7)) for i in range(350)]
        df = spark.createDataFrame(rows, "doc_id long, g string")
        out = curation.temperature_sample(df, "g", "doc_id", 100,
                                          alpha=1.0, salt=0, method="lcg")
        got = {r.doc_id for r in out.collect()}
        # identical threshold for every group: floor(T*buckets/N)
        thr = (100 * 1_000_000) // 350
        def bucket(k):
            return (((k % self._M) * self._A + self._C) % self._M) % 1_000_000
        assert got == {i for i, _ in rows if bucket(i) < thr}

    def test_alpha_zero_equalizes_groups(self, spark):
        rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, g string")
        out = curation.temperature_sample(df, "g", "doc_id", 200,
                                          alpha=0.0, salt=1, method="lcg")
        got = {r.doc_id for r in out.collect()}
        assert got == self._ref_keep(rows, 200, 0.0, 1)
        per = {r.g: r["count"]
               for r in out.groupBy("g").count().collect()}
        # expected ~100 kept from EACH group despite the 9:1 skew
        assert 60 <= per.get("big", 0) <= 140
        assert 60 <= per.get("small", 0) <= 140

    def test_cap_keeps_everything_and_partitioning_invariance(self, spark):
        rows = [(i, "g" + str(i % 3)) for i in range(120)]
        df = spark.createDataFrame(rows, "doc_id long, g string")
        allk = curation.temperature_sample(df, "g", "doc_id", 10_000_000,
                                           alpha=0.5, method="lcg")
        assert allk.count() == 120          # rate capped at 1 → keep all
        a = {r.doc_id for r in curation.temperature_sample(
            df, "g", "doc_id", 40, alpha=0.5, salt=9).collect()}
        b = {r.doc_id for r in curation.temperature_sample(
            df.repartition(13), "g", "doc_id", 40,
            alpha=0.5, salt=9).collect()}
        assert a == b                       # retry/partitioning stable

    def test_size_col_weights_by_tokens(self, spark):
        rows = [(i, "a" if i % 2 == 0 else "b", 100 if i % 2 == 0 else 1)
                for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, g string, tok long")
        out = curation.temperature_sample(df, "g", "doc_id", 3000,
                                          alpha=0.5, size_col="tok",
                                          salt=2, method="lcg")
        got = {r.doc_id for r in out.collect()}
        sizes = {i: t for i, _, t in rows}
        assert got == self._ref_keep([(i, g) for i, g, _ in rows],
                                     3000, 0.5, 2, sizes=sizes)
        # group b (100 docs × 1 token) is far under any fair share of a
        # 3000-token target → kept whole; group a is downsampled
        per = {r.g: r["count"] for r in out.groupBy("g").count().collect()}
        assert per.get("b", 0) == 100
        assert per.get("a", 0) < 100

    def test_validation_errors(self, spark):
        df = spark.createDataFrame([(1, "g")], "doc_id long, g string")
        import pytest
        with pytest.raises(ValueError, match="alpha"):
            curation.temperature_sample(df, "g", "doc_id", 10, alpha=-0.1)
        with pytest.raises(ValueError, match="target_total"):
            curation.temperature_sample(df, "g", "doc_id", 0)

    def test_absurd_target_never_overflows(self, spark):
        # numerator-side cap: a 10^15 target on a 1-doc group must keep
        # everything instead of overflowing the ANSI BIGINT quotient
        df = spark.createDataFrame([(1, "g"), (2, "h")],
                                   "doc_id long, g string")
        out = curation.temperature_sample(df, "g", "doc_id",
                                          10**15, alpha=0.5)
        assert out.count() == 2


class TestC4LineFilter:
    """C4 §2.2 line rules: terminal punctuation, min words, banned
    substrings, and the doc-level brace/lorem/min-lines flags."""

    def test_rules_handcrafted(self, spark):
        rows = [
            (1, "This is a good sentence.\nshort.\nNo punct here at all\n"
                "Enable JavaScript to continue.\nProper long sentence!"),
            (2, "function() { return 1; }\nA valid long sentence."),
            (3, "Lorem Ipsum dolor sit amet.\nReal sentence here too."),
            (4, None),
            (5, 'Quoted line counts too."'),
            (6, "One good sentence.\nTwo good sentences!\n"
                "Three good sentences?"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in
               curation.c4_line_filter(df, "text").collect()}
        assert out[1].text_c4 == ("This is a good sentence.\n"
                                  "Proper long sentence!")
        assert (out[1].n_lines, out[1].n_kept_lines) == (5, 2)
        assert out[2].has_brace and not out[2].keep_doc
        assert out[3].has_lorem and not out[3].keep_doc
        assert out[4].text_c4 == "" and out[4].n_kept_lines == 0
        assert out[5].n_kept_lines == 1       # quote is terminal punct
        assert out[6].keep_doc                # 3 kept lines, no flags
        # no rows dropped — flag-table semantics
        assert len(out) == 6

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        import pytest
        with pytest.raises(ValueError, match="min_words"):
            curation.c4_line_filter(df, "text", min_words=-1)


class TestDsirImportance:
    """dsir_importance: integer-lattice log-ratio importance scores vs
    a pure-Python reference (Xie et al. 2023 semantics)."""

    def _ref(self, rows, target_ids, n=2, a=1.0, scale=1_000_000):
        import math
        from collections import Counter

        def grams(t):
            ws = [w for w in (t or "").split() if w]
            out = list(ws)
            for k in range(2, n + 1):
                out += [" ".join(ws[i:i + k])
                        for i in range(len(ws) - k + 1)]
            return out

        tc, rc = Counter(), Counter()
        for doc_id, t in rows:
            g = grams(t)
            rc.update(g)
            if doc_id in target_ids:
                tc.update(g)
        V = len(rc)
        T, R = sum(tc.values()), sum(rc.values())
        w = {f: math.floor(scale * (
            math.log((tc.get(f, 0) + a) / (T + a * V))
            - math.log((cr + a) / (R + a * V)))) for f, cr in rc.items()}
        return {doc_id: (len(grams(t)), sum(w[f] for f in grams(t)))
                for doc_id, t in rows}

    def test_matches_reference_and_target_affinity(self, spark):
        rows = ([(i, "the quick brown fox jumps high") for i in range(10)]
                + [(i, "der schnelle braune fuchs springt hoch")
                   for i in range(10, 20)]
                + [(20, "the quick fox"), (21, ""), (22, None)])
        df = spark.createDataFrame(rows, "doc_id long, text string")
        target = df.filter("doc_id < 10")   # the 'english' distribution
        got = {r.doc_id: (r.n_feats, r.dsir_score)
               for r in curation.dsir_importance(
                   df, target, "text", "doc_id", n=2).collect()}
        want = self._ref(rows, set(range(10)))
        assert got == want
        # target-like docs outscore the rest; empty/null text scores 0
        assert got[20][1] > 0 > got[15][1]
        assert got[21] == (0, 0) and got[22] == (0, 0)

    def test_buckets_mode_broadcasts_and_preserves_ranking(self, spark):
        rows = ([(i, "alpha beta gamma delta " * 3) for i in range(20)]
                + [(i, "uno dos tres cuatro " * 3) for i in range(20, 40)])
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = curation.dsir_importance(df, df.filter("doc_id < 20"),
                                       "text", "doc_id", buckets=1024)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan   # fixed weight table
        sc = {r.doc_id: r.dsir_score for r in out.collect()}
        assert min(sc[i] for i in range(20)) > max(
            sc[i] for i in range(20, 40))

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        import pytest
        with pytest.raises(ValueError, match="n must"):
            curation.dsir_importance(df, df, "text", "doc_id", n=0)
        with pytest.raises(ValueError, match="smoothing"):
            curation.dsir_importance(df, df, "text", "doc_id",
                                     smoothing=0)


class TestQuantileBuckets:
    """quantile_buckets: CCNet-style per-group score-quantile
    assignment — exact NTILE mode vs a pure-Python reference, plus the
    scale-path thresholds mode."""

    def _ref_ntile(self, rows, k):
        # SQL NTILE: groups of size ceil then floor, lowest scores first
        out = {}
        by_g = {}
        for key, g, s in rows:
            by_g.setdefault(g, []).append((s, key))
        for g, items in by_g.items():
            items.sort()
            n = len(items)
            base, extra = divmod(n, k)
            i = 0
            for b in range(1, k + 1):
                size = base + (1 if b <= extra else 0)
                for _ in range(size):
                    if i < n:
                        out[items[i][1]] = b
                        i += 1
        return out

    def test_ntile_matches_reference(self, spark):
        rows = [(i, "g" + str(i % 4), (i * 37) % 50) for i in range(237)]
        df = spark.createDataFrame(rows, "doc_id long, g string, s long")
        got = {r.doc_id: r.qbucket
               for r in curation.quantile_buckets(
                   df, "g", "s", "doc_id", k=3).collect()}
        assert got == self._ref_ntile(rows, 3)

    def test_labels_and_head_is_lowest(self, spark):
        rows = [(i, "g", i) for i in range(90)]
        df = spark.createDataFrame(rows, "doc_id long, g string, s long")
        got = curation.quantile_buckets(
            df, "g", "s", "doc_id", k=3,
            labels=("head", "middle", "tail")).collect()
        lab = {r.doc_id: r.qbucket for r in got}
        assert all(lab[i] == "head" for i in range(30))
        assert all(lab[i] == "tail" for i in range(60, 90))

    def test_thresholds_mode_is_map_side_and_close(self, spark):
        rows = [(i, "g" + str(i % 3), (i * 13) % 997) for i in range(600)]
        df = spark.createDataFrame(rows, "doc_id long, g string, s long")
        exact = {r.doc_id: r.qbucket for r in curation.quantile_buckets(
            df, "g", "s", "doc_id", k=4).collect()}
        approx_df = curation.quantile_buckets(
            df, "g", "s", "doc_id", k=4, mode="thresholds")
        approx = {r.doc_id: r.qbucket for r in approx_df.collect()}
        agree = sum(exact[i] == approx[i] for i in exact) / len(exact)
        assert agree > 0.95          # boundary rows only may differ
        plan = approx_df._jdf.queryExecution().executedPlan().toString()
        # corpus side probes a broadcast threshold table — no sort of
        # the full rows anywhere (the ntile mode's per-group sort is
        # exactly what this mode exists to avoid)
        assert "BroadcastHashJoin" in plan

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "g", 1)], "doc_id long, g string, s long")
        import pytest
        with pytest.raises(ValueError, match="k must"):
            curation.quantile_buckets(df, "g", "s", "doc_id", k=0)
        with pytest.raises(ValueError, match="labels"):
            curation.quantile_buckets(df, "g", "s", "doc_id", k=3,
                                      labels=("a", "b"))
        with pytest.raises(ValueError, match="mode"):
            curation.quantile_buckets(df, "g", "s", "doc_id", mode="nope")


# Property test: the cutoff-rewrite (window cumsum → one-row-per-group
# crossing point → broadcast filter) must equal the direct greedy over
# the same LCG priority for ANY corpus shape hypothesis can draw —
# duplicate token values, zero/NULL tokens, budgets at/over/under the
# group total, per-group overrides, singleton and empty-after-filter
# groups. The Spark round trip is ~0.5 s/example, so examples are few
# but each carries many groups and collision-prone small token values.
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_tb_rows = st.lists(
    st.tuples(st.integers(0, 200),                    # doc_id (dedup below)
              st.sampled_from(["a", "b", "c", "d"]),  # group
              st.one_of(st.none(), st.integers(0, 40))),  # tokens
    min_size=1, max_size=60,
    unique_by=lambda r: r[0])


class TestTokenBudgetProperty:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=_tb_rows, budget=st.integers(0, 300),
           override=st.one_of(st.none(), st.integers(-5, 120)),
           salt=st.integers(0, 10_000))
    def test_cutoff_rewrite_equals_greedy(self, spark, rows, budget,
                                          override, salt):
        budgets = None if override is None else {"b": override}
        df = spark.createDataFrame(rows, "doc_id long, g string, tok long")
        got = {r.doc_id for r in curation.token_budget_sample(
            df, "g", "tok", "doc_id", budget=budget, budgets=budgets,
            salt=salt, method="lcg").collect()}
        A, C, M = 1103515245, 12345, 2147483648
        want, by_g = set(), {}
        for doc_id, g, t in rows:
            by_g.setdefault(g, []).append(
                (((doc_id % M) * A + C + salt) % M, doc_id, t or 0))
        for g, items in by_g.items():
            b, cum = (budgets or {}).get(g, budget), 0
            for _, doc_id, t in sorted(items):
                if cum < b:
                    want.add(doc_id)
                cum += t
        assert got == want


_ts_rows = st.lists(
    st.tuples(st.integers(0, 500),                     # doc_id
              st.sampled_from(["a", "b", "c", "d"])),  # group
    min_size=1, max_size=80,
    unique_by=lambda r: r[0])


_c4_line = st.lists(
    st.sampled_from(["word", "alpha", "beta", "x", "JavaScript",
                     "{", "lorem", "ipsum"]),
    min_size=0, max_size=6).map(" ".join).flatmap(
        lambda body: st.sampled_from(["", ".", "!", "?", '"', ",", "x"])
        .map(lambda p: body + p))
_c4_doc = st.lists(_c4_line, min_size=0, max_size=8).map("\n".join)


class TestC4LineFilterProperty:
    """Spark c4_line_filter ≡ a pure-Python reference for arbitrary
    line/punctuation/banned-substring combinations."""

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(docs=st.lists(_c4_doc, min_size=1, max_size=8),
           min_words=st.integers(0, 4))
    def test_matches_python_reference(self, spark, docs, min_words):
        rows = list(enumerate(docs))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: (r.text_c4, r.n_lines, r.n_kept_lines,
                          r.has_brace, r.has_lorem, r.keep_doc)
               for r in curation.c4_line_filter(
                   df, "text", min_words=min_words).collect()}
        for doc_id, text in rows:
            lines = (text or "").split("\n")

            def ok(x):
                t = x.strip()
                return (bool(t) and t[-1] in '.!?"'
                        and len(t.split()) >= min_words
                        and "javascript" not in t.lower())

            kept = [x for x in lines if ok(x)]
            low = (text or "").lower()
            brace, lorem = "{" in low, "lorem ipsum" in low
            want = ("\n".join(kept), len(lines), len(kept), brace,
                    lorem, not brace and not lorem and len(kept) >= 3)
            assert got[doc_id] == want, (doc_id, text)


class TestTemperatureSampleProperty:
    """The Spark integer-lattice threshold path must equal the
    pure-Python reference for ANY corpus shape/target/salt at the
    IEEE-exact alphas (0 = uniform groups, 0.5 = sqrt, 1 = global)."""

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=_ts_rows, target=st.integers(1, 500),
           alpha=st.sampled_from([0.0, 0.5, 1.0]),
           salt=st.integers(0, 10_000))
    def test_lattice_equals_reference(self, spark, rows, target, alpha,
                                      salt):
        import math

        df = spark.createDataFrame(rows, "doc_id long, g string")
        got = {r.doc_id for r in curation.temperature_sample(
            df, "g", "doc_id", target, alpha=alpha, salt=salt,
            method="lcg").collect()}
        A, C, M, B, S = 1103515245, 12345, 2147483648, 1_000_000, 1000
        n = {}
        for _, g in rows:
            n[g] = n.get(g, 0) + 1
        w = {g: math.floor(
            (math.sqrt(ng) if alpha == 0.5
             else float(ng) if alpha == 1.0 else 1.0) * S)
            for g, ng in n.items()}
        W = sum(w.values())
        thr = {g: min(B, (target * w[g] * B) // (W * n[g])) for g in n}
        want = {d for d, g in rows
                if (((d % M) * A + C + salt) % M) % B < thr[g]}
        assert got == want


class TestChunkDocuments:
    def test_window_lattice(self, spark):
        # N=5, K=2, stride=3: n=12 -> i_max=(12-3)//3=3 -> 4 chunks
        words = [f"w{i}" for i in range(12)]
        out = curation.chunk_documents(
            _docs(spark, [(1, " ".join(words))]),
            chunk_tokens=5, overlap=2)
        rows = sorted(out.collect(), key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]
        assert rows[0]["chunk_text"] == "w0 w1 w2 w3 w4"
        assert rows[1]["chunk_text"] == "w3 w4 w5 w6 w7"
        assert rows[3]["chunk_text"] == "w9 w10 w11"   # short tail
        assert [r["chunk_tokens"] for r in rows] == [5, 5, 5, 3]

    def test_no_window_without_new_token(self, spark):
        # n = N + K: the would-be window at stride covers only overlap
        # +K tokens... n=7, N=5, K=2, stride=3: i_max=(7-3)//3=1 -> 2
        # chunks; n=5 -> 1 chunk; n=6 -> (6-3)//3=1 -> 2nd chunk has
        # tokens 3..5 (one new). n=2 (<=K) -> single chunk.
        for n, want in [(5, 1), (6, 2), (7, 2), (2, 1)]:
            out = curation.chunk_documents(
                _docs(spark, [(1, " ".join(["x"] * n))]),
                chunk_tokens=5, overlap=2)
            assert out.count() == want, n

    def test_empty_and_null_emit_nothing(self, spark):
        out = curation.chunk_documents(
            _docs(spark, [(1, ""), (2, None), (3, "   ")]),
            chunk_tokens=5, overlap=2)
        assert out.count() == 0

    def test_zero_overlap_partitions_exactly(self, spark):
        # overlap=0: chunks tile the token stream — re-joining them
        # reproduces the whitespace-normalized document byte-for-byte
        words = [f"tok{i}" for i in range(23)]
        out = curation.chunk_documents(
            _docs(spark, [(1, "  " + "  ".join(words) + " ")]),
            chunk_tokens=4, overlap=0)
        rows = sorted(out.collect(), key=lambda r: r["chunk_id"])
        assert " ".join(r["chunk_text"] for r in rows) == " ".join(words)
        assert sum(r["chunk_tokens"] for r in rows) == 23

    def test_param_validation(self, spark):
        import pytest
        df = _docs(spark, [(1, "a b c")])
        with pytest.raises(ValueError):
            curation.chunk_documents(df, chunk_tokens=4, overlap=4)
        with pytest.raises(ValueError):
            curation.chunk_documents(df, chunk_tokens=4, overlap=-1)


class TestShardAssign:
    def _corpus(self, spark, n=200):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc "), F.col("id")).alias("text"))

    def test_shape_and_density(self, spark):
        out = curation.shard_assign(self._corpus(spark), "doc_id",
                                    n_shards=8, salt=1)
        rows = out.collect()
        assert len(rows) == 200
        assert {r["shard"] for r in rows} <= set(range(8))
        # pos is a dense 0-based rank within each shard
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(len(ps))), shard

    def test_partitioning_invariance(self, spark):
        base = self._corpus(spark)
        a = curation.shard_assign(base.repartition(13), "doc_id",
                                  n_shards=8, salt=1)
        b = curation.shard_assign(base.coalesce(1), "doc_id",
                                  n_shards=8, salt=1)
        ka = {(r["doc_id"], r["shard"], r["pos"]) for r in a.collect()}
        kb = {(r["doc_id"], r["shard"], r["pos"]) for r in b.collect()}
        assert ka == kb

    def test_salt_reshuffles(self, spark):
        base = self._corpus(spark)
        a = {(r["doc_id"], r["shard"], r["pos"])
             for r in curation.shard_assign(base, "doc_id", 8, salt=1)
             .collect()}
        b = {(r["doc_id"], r["shard"], r["pos"])
             for r in curation.shard_assign(base, "doc_id", 8, salt=2)
             .collect()}
        assert a != b

    def test_lcg_matches_pure_python(self, spark):
        out = curation.shard_assign(self._corpus(spark, 50), "doc_id",
                                    n_shards=4, salt=7, method="lcg")
        got = {r["doc_id"]: (r["shard"], r["pos"]) for r in out.collect()}
        pri = {i: ((i % 2147483648) * 1103515245 + 12345 + 7)
               % 2147483648 for i in range(50)}
        by_shard = {}
        for i in sorted(range(50), key=lambda i: (pri[i], i)):
            s = pri[i] % 4
            by_shard.setdefault(s, []).append(i)
        want = {i: (s, ps.index(i))
                for s, ps in by_shard.items() for i in ps}
        assert got == want

    def test_validation(self, spark):
        import pytest
        with pytest.raises(ValueError):
            curation.shard_assign(self._corpus(spark), "doc_id",
                                  n_shards=0)


_chunk_doc = st.lists(
    st.sampled_from(["tok", "a", "xx", "", " ", "\t"]),
    min_size=0, max_size=40).map(" ".join)


class TestChunkDocumentsProperty:
    """Spark chunk_documents ≡ a pure-Python sliding-window reference
    for arbitrary token counts / window sizes / overlaps."""

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(docs=st.lists(_chunk_doc, min_size=1, max_size=8),
           chunk_tokens=st.integers(1, 9),
           overlap=st.integers(0, 8))
    def test_matches_python_reference(self, spark, docs, chunk_tokens,
                                      overlap):
        from hypothesis import assume
        assume(chunk_tokens > overlap)
        rows = list(enumerate(docs))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for r in curation.chunk_documents(
                df, "text", "doc_id", chunk_tokens=chunk_tokens,
                overlap=overlap).collect():
            got.setdefault(r.doc_id, {})[r.chunk_id] = (
                r.chunk_tokens, r.chunk_text)
        stride = chunk_tokens - overlap
        for doc_id, text in rows:
            toks = [w for w in (text or "").split() if w]
            n = len(toks)
            if n == 0:
                assert doc_id not in got, (doc_id, text)
                continue
            i_max = (n - overlap - 1) // stride if n > overlap else 0
            want = {}
            for i in range(i_max + 1):
                window = toks[i * stride:i * stride + chunk_tokens]
                want[i] = (len(window), " ".join(window))
            assert got[doc_id] == want, (doc_id, text, chunk_tokens,
                                         overlap)


# ---------------------------------------------------------------------------
# normalize_text (unicode + whitespace normalization)
# ---------------------------------------------------------------------------

import re as _re_norm  # noqa: E402
import unicodedata as _ud  # noqa: E402

# Pure-Python reference: same ordered rules, Python `re` (semantics
# coincide with RE2 for these patterns — character classes and greedy
# quantifiers only, leftmost non-overlapping global replacement) and
# unicodedata NFC (what the operator itself uses; cross-engine NFC
# equivalence vs DuckDB's utf8proc is pinned by the normalize_text
# contract query and the fixed cases below).
_REF_RULES = [
    (_re_norm.compile(
        p.replace(r"\x{00A0}", " ")
         .replace(r"\x{2007}", " ")
         .replace(r"\x{202F}", " ")), r)
    for p, r in curation.NORM_RULES]


def _ref_normalize(t):
    if t is None:
        return None
    t = _ud.normalize("NFC", t)
    for pat, rep in _REF_RULES:
        t = pat.sub(rep, t)
    return t.strip(" \t\n")


class TestNormalizeText:
    def _run(self, spark, texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string")
        out = curation.normalize_text(df)
        return [r.text_norm
                for r in out.orderBy("id").select("text_norm").collect()]

    def test_fixed_cases(self, spark):
        cases = [
            # NFC composition: decomposed e + U+0301 -> é
            ("Café au lait", "Café au lait"),
            # singleton composition (Ohm sign -> Greek Omega)
            ("Ω ohm", "Ω ohm"),
            # CRLF + lone CR -> LF
            ("a\r\nb\rc", "a\nb\nc"),
            # NBSP family -> space, then collapsed
            ("a  b c d", "a b c d"),
            # C0/DEL stripped, \t and \n survive as layout
            ("x\x07y\x00z\x7fw", "xyzw"),
            ("x\ty", "x y"),
            # space/tab runs collapse; newline de-padding
            ("a  \t b \n   c", "a b\nc"),
            # blank-line runs cap at one blank line
            ("p1\n\n\n\n\np2", "p1\n\np2"),
            # edge trim of spaces/tabs/newlines
            ("\n\n  hi  \t\n", "hi"),
            # ASCII fast path is the identity
            ("plain ascii text", "plain ascii text"),
            ("", ""),
        ]
        got = self._run(spark, [t for t, _ in cases])
        for (src, want), g in zip(cases, got):
            assert g == want, (src, want, g)

    def test_null_propagates(self, spark):
        assert self._run(spark, [None, "a"]) == [None, "a"]

    def test_idempotent(self, spark):
        texts = ["Café  x\r\n\r\n\r\ny\x07 ", "a b", " \t\n "]
        once = self._run(spark, texts)
        twice = self._run(spark, once)
        assert once == twice

    def test_matches_python_reference_fixed(self, spark):
        texts = ["Café  \t mixed\r\n\r\n\r\n \x07tail\x7f  ",
                 "Ω   \x01\x1f",
                 "a\rb\r\nc\nd\n\n\n\ne",
                 "", " ", "\t\n\r"]
        assert self._run(spark, texts) == [_ref_normalize(t) for t in texts]


_norm_alphabet = st.sampled_from(
    list("ab .!") + ["\t", "\n", "\r", "\x07", "\x00", "\x7f",
                     " ", " ", " ", "́", "e",
                     "é", "Ω", "Ω"])


class TestNormalizeTextProperty:
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(texts=st.lists(
        st.one_of(st.none(), st.text(_norm_alphabet, max_size=40)),
        min_size=1, max_size=12))
    def test_matches_python_reference(self, spark, texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string")
        got = [r.text_norm for r in curation.normalize_text(df)
               .orderBy("id").select("text_norm").collect()]
        assert got == [_ref_normalize(t) for t in texts]


# ---------------------------------------------------------------------------
# remove_boilerplate_lines (cross-document nav/footer strip)
# ---------------------------------------------------------------------------


class TestRemoveBoilerplateLines:
    ROWS = [
        (1, "h1", "unique one\nFOOTER\nbody a"),
        (2, "h1", "FOOTER\nbody b"),
        (3, "h1", "body c\nFOOTER"),
        (4, "h2", "FOOTER\nother host"),   # same text, different group
        (5, "h1", None),
        (6, "h1", "  \nFOOTER\n"),          # blank lines preserved
    ]

    def _run(self, spark, min_docs=3):
        df = spark.createDataFrame(self.ROWS,
                                   "doc_id long, g string, text string")
        return {r.doc_id: r for r in curation.remove_boilerplate_lines(
            df, "text", "doc_id", "g", min_docs).collect()}

    def test_footer_stripped_group_isolated(self, spark):
        got = self._run(spark)
        # FOOTER appears in 4 distinct h1 docs -> stripped from ALL
        assert got[1].text_clean == "unique one\nbody a"
        assert got[2].text_clean == "body b"
        assert got[3].text_clean == "body c"
        assert [got[i].n_boiler for i in (1, 2, 3, 6)] == [1, 1, 1, 1]
        # identical text under h2 is one doc there -> untouched
        assert got[4].text_clean == "FOOTER\nother host"
        assert got[4].n_boiler == 0

    def test_blank_lines_never_flagged(self, spark):
        got = self._run(spark)
        # blanks survive even though '' repeats across docs
        assert got[6].text_clean == "  \n"
        assert got[5].n_lines == 1 and got[5].text_clean == ""

    def test_threshold(self, spark):
        # min_docs above the footer's df -> nothing stripped
        got = self._run(spark, min_docs=5)
        assert all(r.n_boiler == 0 for r in got.values())
        import pytest
        with pytest.raises(ValueError):
            self._run(spark, min_docs=1)

    def test_trim_matching_position_fidelity(self, spark):
        # '  FOOTER ' matches 'FOOTER' (trimmed key) but untouched
        # lines keep their original bytes
        rows = [(1, "g", "  FOOTER \nkeep  me"),
                (2, "g", "FOOTER\nx"), (3, "g", "FOOTER\ny")]
        df = spark.createDataFrame(rows,
                                   "doc_id long, g string, text string")
        got = {r.doc_id: r for r in curation.remove_boilerplate_lines(
            df, "text", "doc_id", "g", 3).collect()}
        assert got[1].text_clean == "keep  me"
        assert got[1].n_boiler == 1

    def test_global_mode_without_group(self, spark):
        rows = [(i, f"line{i}\nCOMMON") for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in curation.remove_boilerplate_lines(
            df, "text", "doc_id", None, 3).collect()}
        assert all(got[i].text_clean == f"line{i}" for i in range(4))


class TestWeightedMix:
    """weighted_mix: explicit DoReMi-style proportions realized as the
    largest exactly-proportioned corpus — bit-identical to a pure-
    Python lattice reference; unweighted groups drop; target_total
    caps; mixture ratios hold."""

    _M, _A, _C = 2147483648, 1103515245, 12345

    def _ref_keep(self, rows, weights, target=None, salt=0,
                  buckets=1_000_000, scale=1_000_000):
        n = {}
        for doc_id, g in rows:
            n[g] = n.get(g, 0) + 1
        w = {g: int(wv * scale) for g, wv in weights.items()
             if int(wv * scale) > 0}
        present = {g: w[g] for g in w if g in n}
        W = sum(present.values())
        t = min((n[g] * W) // present[g] for g in present)
        if target is not None:
            t = min(t, target)
        thr = {g: (t * present[g] * buckets) // (W * n[g])
               for g in present}
        def bucket(k):
            return (((k % self._M) * self._A + self._C + salt)
                    % self._M) % buckets
        return {d for d, g in rows if g in thr and bucket(d) < thr[g]}

    def test_matches_reference_and_drops_unweighted(self, spark):
        rows = [(i, ["a", "a", "a", "a", "b", "b", "c", "zz"][i % 8])
                for i in range(800)]
        df = spark.createDataFrame(rows, "doc_id long, g string")
        w = {"a": 0.6, "b": 0.3, "c": 0.1}
        out = curation.weighted_mix(df, "g", "doc_id", w, salt=5,
                                    method="lcg")
        got = {r.doc_id for r in out.collect()}
        assert got == self._ref_keep(rows, w, salt=5)
        assert not any(g == "zz" for _, g in rows if _ in got)

    def test_bottleneck_group_sets_total(self, spark):
        # c is the bottleneck: weight 0.5 but only 20 rows available →
        # T = 20·W/w_c = 40-equivalent; a and b are downsampled to hold
        # the 25/25/50 ratio even though they have 10x the rows.
        rows = ([(i, "a") for i in range(200)]
                + [(200 + i, "b") for i in range(200)]
                + [(400 + i, "c") for i in range(20)])
        df = spark.createDataFrame(rows, "doc_id long, g string")
        w = {"a": 0.25, "b": 0.25, "c": 0.5}
        out = curation.weighted_mix(df, "g", "doc_id", w, salt=1,
                                    method="lcg")
        got = {r.doc_id for r in out.collect()}
        assert got == self._ref_keep(rows, w, salt=1)
        kept = out.groupBy("g").count().collect()
        share = {r.g: r["count"] for r in kept}
        # c keeps everything (bucket < buckets·(T·w/W)/n_c = full rate)
        assert share.get("c", 0) == 20
        # a and b each land near 10 (= 20·0.25/0.5), far below their 200
        assert share.get("a", 0) < 30 and share.get("b", 0) < 30

    def test_target_total_caps(self, spark):
        rows = [(i, "a" if i % 2 else "b") for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, g string")
        w = {"a": 0.5, "b": 0.5}
        capped = curation.weighted_mix(df, "g", "doc_id", w,
                                       target_total=50, salt=2,
                                       method="lcg")
        got = {r.doc_id for r in capped.collect()}
        assert got == self._ref_keep(rows, w, target=50, salt=2)
        assert len(got) < 100  # far below the uncapped T = 400

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, g string")
        with pytest.raises(ValueError):
            curation.weighted_mix(df, "g", "doc_id", {})
        with pytest.raises(ValueError):
            curation.weighted_mix(df, "g", "doc_id", {"a": -0.1})
        with pytest.raises(ValueError):
            curation.weighted_mix(df, "g", "doc_id", {"a": 1.0},
                                  target_total=0)
        with pytest.raises(ValueError):
            curation.weighted_mix(df, "g", "doc_id", {"a": 1e-9})


class TestSplitLeakage:
    def test_counts_shared_contents_and_docs(self, spark):
        rows = [
            ("train", "alpha"), ("train", "beta"), ("train", "alpha"),
            ("val", "alpha"), ("val", "gamma"),
            ("test", "beta"), ("test", "beta"), ("test", "delta"),
        ]
        df = spark.createDataFrame(rows, "split string, text string")
        got = {(r.split_a, r.split_b): r for r in
               curation.split_leakage(df, "split").collect()}
        # 'alpha' leaks train<->val (2 train docs + 1 val doc);
        # 'beta' leaks test<->train (1 train + 2 test)
        assert got[("train", "val")].n_shared_contents == 1
        assert got[("train", "val")].n_leaked_docs == 3
        assert got[("test", "train")].n_shared_contents == 1
        assert got[("test", "train")].n_leaked_docs == 3
        assert ("test", "val") not in got  # no overlap

    def test_whitespace_normalization_toggle(self, spark):
        rows = [("train", "same  text"), ("val", "same text"),
                ("val", None), ("train", "")]
        df = spark.createDataFrame(rows, "split string, text string")
        norm = {(r.split_a, r.split_b): r.n_shared_contents for r in
                curation.split_leakage(df, "split").collect()}
        # normalized: 'same  text' == 'same text'; NULL == ''
        assert norm[("train", "val")] == 2
        raw = {(r.split_a, r.split_b): r.n_shared_contents for r in
               curation.split_leakage(df, "split",
                                      normalize_ws=False).collect()}
        # raw bytes differ on the double space; NULL=='' still shared
        assert raw[("train", "val")] == 1

    def test_clean_split_reports_nothing(self, spark):
        rows = [("train", "a"), ("val", "b"), ("test", "c")]
        df = spark.createDataFrame(rows, "split string, text string")
        assert curation.split_leakage(df, "split").count() == 0


class TestUrlPatternFilter:
    ROWS = [
        (1, "https://ok.example/article/1"),
        (2, "https://bad.example/casino/slots"),
        (3, "https://ok.example/print/page?sid=abc123"),
        (4, "https://ARCHIVE.example/2009/07/cal"),
        (5, None),
    ]
    PATS = [r"/casino/", r"[?&]sid=", r"/\d{4}/\d{2}/"]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "doc_id long, url string")

    def test_block_drop_mode(self, spark):
        out = curation.url_pattern_filter(
            self._df(spark), self.PATS, tag_col=None)
        assert {r.doc_id for r in out.collect()} == {1, 5}

    def test_audit_mode_tags_first_match(self, spark):
        got = {r.doc_id: r.url_block_reason for r in
               curation.url_pattern_filter(
                   self._df(spark), self.PATS).collect()}
        assert got[1] is None and got[5] is None
        assert got[2] == r"/casino/"
        assert got[3] == r"[?&]sid="
        assert got[4] == r"/\d{4}/\d{2}/"

    def test_allow_mode_and_case_insensitive(self, spark):
        out = curation.url_pattern_filter(
            self._df(spark), [r"https://ok\."], mode="allow")
        assert {r.doc_id for r in out.collect()} == {1, 3}
        out2 = curation.url_pattern_filter(
            self._df(spark), [r"https://archive\."], mode="allow")
        assert {r.doc_id for r in out2.collect()} == {4}

    def test_validation(self, spark):
        import pytest
        df = self._df(spark)
        with pytest.raises(ValueError):
            curation.url_pattern_filter(df, [])
        with pytest.raises(ValueError):
            curation.url_pattern_filter(df, ["x"], mode="nope")


class TestCapPerGroup:
    def test_priority_mode_keeps_best(self, spark):
        rows = [(i, "big" if i < 20 else "small", float(i))
                for i in range(25)]
        df = spark.createDataFrame(rows, "doc_id long, g string, s double")
        got = {r.doc_id for r in curation.cap_per_group(
            df, "g", "doc_id", 3, priority_col="s").collect()}
        # big keeps its 3 highest scores; small (5 docs) keeps its 3
        assert got == {17, 18, 19, 22, 23, 24}

    def test_hash_mode_deterministic_and_capped(self, spark):
        rows = [(i, f"h{i % 4}") for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, g string")
        a = {r.doc_id for r in curation.cap_per_group(
            df, "g", "doc_id", 10, salt=3).collect()}
        b = {r.doc_id for r in curation.cap_per_group(
            df.repartition(13), "g", "doc_id", 10, salt=3).collect()}
        assert a == b and len(a) == 40
        # different salt -> different (but equally sized) survivor set
        c = {r.doc_id for r in curation.cap_per_group(
            df, "g", "doc_id", 10, salt=4).collect()}
        assert len(c) == 40 and c != a

    def test_under_cap_groups_untouched(self, spark):
        rows = [(i, "only") for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, g string")
        assert curation.cap_per_group(df, "g", "doc_id", 10).count() == 5

    def test_validation(self, spark):
        import pytest
        df = spark.createDataFrame([(1, "a")], "doc_id long, g string")
        with pytest.raises(ValueError):
            curation.cap_per_group(df, "g", "doc_id", 0)


class TestSplitSentences:
    def test_boundaries_and_ids(self, spark):
        df = spark.createDataFrame(
            [(1, 'One sentence. Two!  Three?" Quoted." No terminal tail'),
             (2, 'Only one line'),
             (3, ''), (4, None)],
            "doc_id long, text string")
        got = {}
        for r in curation.split_sentences(df).collect():
            got.setdefault(r.doc_id, []).append(
                (r.sentence_id, r.sentence))
        assert got[1] == [(0, 'One sentence.'), (1, 'Two!'),
                          (2, 'Three?"'), (3, 'Quoted."'),
                          (4, 'No terminal tail')]
        assert got[2] == [(0, 'Only one line')]
        assert 3 not in got and 4 not in got

    def test_inner_whitespace_preserved(self, spark):
        df = spark.createDataFrame(
            [(1, 'keeps  inner   runs. next\tkeeps\ttabs.')],
            "doc_id long, text string")
        got = [r.sentence for r in
               curation.split_sentences(df).collect()]
        assert got == ['keeps  inner   runs.', 'next\tkeeps\ttabs.']

    def test_abbreviations_split_by_design(self, spark):
        df = spark.createDataFrame([(1, 'Dr. Smith arrived. Yes.')],
                                   "doc_id long, text string")
        got = [r.sentence for r in
               curation.split_sentences(df).collect()]
        assert got == ['Dr.', 'Smith arrived.', 'Yes.']
