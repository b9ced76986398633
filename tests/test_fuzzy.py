"""Fuzzy term retrieval (``term~d`` → scoring boolean)."""

from __future__ import annotations

from spcht_spark.index.fuzzy import expand_fuzzy, fuzzy_topk, parse_fuzzy
from spcht_spark.index.query import exact_topk


def test_parse_fuzzy():
    assert parse_fuzzy("roam~2") == ("roam", 2)
    assert parse_fuzzy("roam~1") == ("roam", 1)
    assert parse_fuzzy("roam") == ("roam", 0)
    assert parse_fuzzy("a~b~1") == ("a~b", 1)  # only the trailing ~d


def test_expand_includes_exact_and_near(spark, small_index):
    exp = expand_fuzzy(small_index.dictionary, ["retrn~2", "return~1"], 10)
    # deletion misspelling finds the real term
    assert "return" in exp["retrn~2"]
    # exact term with fuzzy budget includes itself (distance 0 first)
    assert exp["return~1"][0] == "return"


def test_fuzzy_topk_equals_exact_over_expansion(spark, small_index):
    idx = small_index
    exp = expand_fuzzy(idx.dictionary, ["whle~1"], 5)["whle~1"]
    assert exp, "expected at least one expansion for whle~1"
    got = fuzzy_topk(
        spark, idx.blocks, idx.doclens, idx.dictionary, idx.stats,
        [("q", "whle~1", 10)], max_expansions=5,
    ).collect()
    want = exact_topk(
        spark, idx.blocks, idx.doclens, idx.dictionary, idx.stats,
        [("q", exp, 10)],
    ).collect()
    key = lambda rows: sorted((r["rank"], r["doc_id"], r["score"]) for r in rows)
    assert key(got) == key(want)


def test_fuzzy_no_match_is_empty(spark, small_index):
    idx = small_index
    out = fuzzy_topk(
        spark, idx.blocks, idx.doclens, idx.dictionary, idx.stats,
        [("q", "zzqqxxyy~1", 10)],
    )
    assert out.count() == 0
    assert out.columns == ["query_id", "rank", "doc_id", "score"]


def test_fuzzy_in_boolean_q(spark, small_index):
    """`base~d` inside the boolean language: expands to its dictionary
    OR before execution, composing with AND/NOT like any clause."""
    from spcht_spark.index.boolean import (
        boolean_topk,
        expand_fuzzy_ast,
        parse_query,
    )

    idx = small_index
    ast = parse_query("whle~1 AND return")
    assert ("fuzzy", "whle", 1) in ast[1]
    expanded = expand_fuzzy_ast(ast, idx.dictionary)
    assert all(a[0] != "fuzzy" for a in expanded[1])

    got = boolean_topk(
        spark, idx.blocks, idx.doclens, idx.dictionary, idx.stats,
        [("q", "whle~1 AND return", 10)],
    ).collect()
    exp_terms = expand_fuzzy(idx.dictionary, ["whle~1"], 50)["whle~1"]
    want = boolean_topk(
        spark, idx.blocks, idx.doclens, idx.dictionary, idx.stats,
        [("q", f"({' OR '.join(exp_terms)}) AND return", 10)],
    ).collect()
    key = lambda rows: sorted((r["rank"], r["doc_id"], r["score"]) for r in rows)
    assert key(got) == key(want)
    assert got, "expected matches for whle~1 AND return"


def test_complete_prefix_suggester(spark, small_index):
    """/suggest completion: df-desc rank, top_n cap, absent prefix
    empty, short prefixes filtered by min_chars."""
    from spcht_spark.index.suggest import complete

    pdf = small_index.dictionary.select("term", "df").toPandas()
    got = complete(
        spark, small_index.dictionary, ["re", "zzzz", "r"],
        top_n=3, min_chars=2,
    ).collect()
    by_pref = {}
    for r in sorted(got, key=lambda r: (r["prefix"], r["rank"])):
        by_pref.setdefault(r["prefix"], []).append(
            (r["suggestion"], r["weight"])
        )
    assert "zzzz" not in by_pref           # absent prefix: no rows
    assert "r" not in by_pref              # below min_chars: dropped
    want = sorted(
        ((t, int(d)) for t, d in zip(pdf.term, pdf.df) if t.startswith("re")),
        key=lambda td: (-td[1], td[0]),
    )[:3]
    assert by_pref.get("re", []) == want
