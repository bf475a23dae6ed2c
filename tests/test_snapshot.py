"""Crawl-snapshot diff (operators/snapshot.py): change classes,
NULL-text semantics, incremental work set, summary aggregates."""

from pyspark.sql import functions as F

from dataquality_spark.operators import snapshot


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


class TestSnapshotDiff:
    def test_all_four_statuses(self, spark):
        old = _snap(spark, [("u1", "same"), ("u2", "before"),
                            ("u3", "gone")])
        new = _snap(spark, [("u1", "same"), ("u2", "after"),
                            ("u4", "fresh")])
        got = {r.url: r for r in
               snapshot.snapshot_diff(old, new).collect()}
        assert got["u1"].status == "unchanged"
        assert got["u2"].status == "changed"
        assert got["u3"].status == "removed"
        assert got["u4"].status == "added"
        assert got["u2"].delta_chars == len("after") - len("before")
        assert got["u3"].n_chars_new is None
        assert got["u4"].n_chars_old is None
        assert got["u4"].delta_chars is None

    def test_null_text_equals_empty(self, spark):
        # NULL vs '' is NOT a content change; NULL vs 'x' is
        old = _snap(spark, [("u1", None), ("u2", None)])
        new = _snap(spark, [("u1", ""), ("u2", "x")])
        got = {r.url: r.status for r in
               snapshot.snapshot_diff(old, new).collect()}
        assert got == {"u1": "unchanged", "u2": "changed"}

    def test_needs_processing_work_set(self, spark):
        old = _snap(spark, [("u1", "same"), ("u2", "before")])
        new = _snap(spark, [("u1", "same"), ("u2", "after"),
                            ("u3", "fresh")])
        got = {r.url: r.status for r in
               snapshot.needs_processing(old, new).collect()}
        assert got == {"u2": "changed", "u3": "added"}

    def test_diff_summary_counts_and_chars(self, spark):
        old = _snap(spark, [("u1", "aa"), ("u2", "bbb"), ("u3", "c")])
        new = _snap(spark, [("u1", "aa"), ("u2", "dddd"),
                            ("u4", "eeeee")])
        got = {r.status: r for r in
               snapshot.diff_summary(old, new).collect()}
        assert got["unchanged"].n_keys == 1
        assert got["changed"].chars_old == 3
        assert got["changed"].chars_new == 4
        assert got["added"].chars_new == 5
        assert got["removed"].chars_old == 1
        assert got["removed"].chars_new == 0
