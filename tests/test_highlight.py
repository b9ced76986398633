"""Snippet highlighting edge cases."""

from __future__ import annotations


from spcht_spark.index.highlight import highlight


def _run(spark, content: str, terms: list[str], window: int = 2) -> str | None:
    hits = spark.createDataFrame(
        [("q", 1, 0)], ["query_id", "rank", "doc_id"]
    )
    store = spark.createDataFrame([(0, content)], ["doc_id", "content"])
    rows = highlight(hits, store, [("q", terms)], window=window).collect()
    assert len(rows) == 1
    return rows[0]["snippet"]


def test_match_mid_doc(spark):
    s = _run(spark, "a b c d X e f g h", ["x".upper()], window=2)
    assert s == "c d <em>X</em> e f"


def test_match_at_start_clamps_left(spark):
    assert _run(spark, "X a b c d", ["X"], window=2) == "<em>X</em> a b c d"


def test_match_at_end_clamps_right(spark):
    # the window is [pos-w, pos+w] clamped — no left backfill at the end
    assert _run(spark, "a b c d X", ["X"], window=2) == "c d <em>X</em>"


def test_first_of_multiple_terms_wins(spark):
    # first occurrence of ANY query term anchors the window
    s = _run(spark, "p q Y r s X t", ["X", "Y"], window=1)
    assert s == "q <em>Y</em> r"


def test_all_matches_in_window_wrapped(spark):
    s = _run(spark, "a X b X c", ["X"], window=2)
    assert s == "a <em>X</em> b <em>X</em> c"


def test_no_match_null_snippet(spark):
    assert _run(spark, "a b c", ["zz"], window=2) is None
