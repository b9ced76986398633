"""Boolean query parser + postings execution vs a pure-Python oracle."""

from __future__ import annotations

from collections import Counter

import pytest

from spcht_spark.index.boolean import (
    QueryParseError,
    ast_terms,
    ast_to_duckdb,
    boolean_topk,
    eval_ast,
    parse_query,
    positive_terms,
)
from spcht_spark.oracle import idf as idf_py
from spcht_spark.oracle import term_score, tokenize_py

# ------------------------------------------------------------- parser

def test_parse_precedence_and_over_or():
    assert parse_query("a AND b OR c") == (
        "or", [("and", [("term", "a"), ("term", "b")]), ("term", "c")]
    )


def test_parse_implicit_or_default_op():
    assert parse_query("a b c") == (
        "or", [("term", "a"), ("term", "b"), ("term", "c")]
    )


def test_parse_not_and_minus():
    assert parse_query("a AND NOT b") == parse_query("a AND -b") == (
        "and", [("term", "a"), ("not", ("term", "b"))]
    )


def test_parse_parens_case_preserving_default():
    # Default analyzer is case-preserving — the index build never folds
    # case (source code: `Return` != `return`), so neither may the
    # parser (round-3 VERDICT "What's wrong" #1).
    ast = parse_query("(X OR y) AND NOT (z AND w)")
    assert ast == (
        "and",
        [
            ("or", [("term", "X"), ("term", "y")]),
            ("not", ("and", [("term", "z"), ("term", "w")])),
        ],
    )
    assert ast_terms(ast) == {"X", "y", "z", "w"}
    assert positive_terms(ast) == {"X", "y"}


def test_parse_lowercase_analyzer_folds():
    ast = parse_query("(X OR y) AND -Wzz^2.5 AND -Neg", analyzer="lowercase")
    assert ast == (
        "and",
        [
            ("or", [("term", "x"), ("term", "y")]),
            ("not", ("term", "wzz")),
            ("not", ("term", "neg")),
        ],
    )
    # attr field/value are never folded
    assert parse_query("a AND Lang:EN", analyzer="lowercase") == (
        "and", [("term", "a"), ("eq", "Lang", "EN")]
    )


@pytest.mark.parametrize(
    "bad", ["NOT a", "a OR NOT b", "NOT (a AND b)", "-a", "(a", "a)", "a AND", "AND a"]
)
def test_parse_rejects(bad):
    with pytest.raises(QueryParseError):
        parse_query(bad)


def test_double_negation_in_and_is_allowed():
    # a AND NOT NOT b == a AND b: not satisfiable by the empty set
    ast = parse_query("a AND NOT (NOT b)")
    assert eval_ast(ast, frozenset({"a", "b"}))
    assert not eval_ast(ast, frozenset({"a"}))


def test_ast_to_duckdb_shape():
    sql = ast_to_duckdb(parse_query("a AND NOT b"))
    assert sql == "(list_contains(terms, 'a') AND (NOT list_contains(terms, 'b')))"


# ------------------------------------------------- fq strings

def test_parse_filter_query_attr_only():
    from spcht_spark.index.boolean import parse_filter_query

    assert parse_filter_query("lang:en AND n:[200 TO *]") == (
        "and", [("eq", "lang", "en"), ("range", "n", 200.0, None)]
    )
    # pure-negative is FINE in fq (metadata filters need no postings)
    assert parse_filter_query("NOT lang:zh") == ("not", ("eq", "lang", "zh"))
    with pytest.raises(QueryParseError, match="fulltext terms"):
        parse_filter_query("lang:en AND spark")


def test_fq_filter_frame(spark, small_corpus_pd, small_corpus):
    from spcht_spark.index.boolean import fq_filter

    lang = small_corpus_pd["lang"].iloc[0]
    ids = {
        r["doc_id"]
        for r in fq_filter(small_corpus, f"lang:{lang}").collect()
    }
    assert ids == {
        int(r.doc_id) for r in small_corpus_pd.itertuples() if r.lang == lang
    }


def test_search_with_fq_string(spark, small_corpus_pd, small_corpus, small_index):
    from pyspark.sql import functions as F

    from spcht_spark.index.search import SearchRequest, search

    lang = small_corpus_pd["lang"].iloc[0]
    via_str = search(
        spark, small_index, small_corpus,
        SearchRequest(q="return", k=8, fq=f"lang:{lang}"),
    ).hits.collect()
    via_frame = search(
        spark, small_index, small_corpus,
        SearchRequest(
            q="return", k=8,
            fq=small_corpus.filter(F.col("lang") == lang).select("doc_id"),
        ),
    ).hits.collect()
    key = lambda rows: sorted((r["rank"], r["doc_id"], r["score"]) for r in rows)
    assert key(via_str) == key(via_frame)
    assert via_str  # non-empty


# ------------------------------------------------- term boosts

def test_parse_term_boost():
    from spcht_spark.index.boolean import term_boosts

    ast = parse_query("a^2.5 AND b AND -c^3")
    assert ast == (
        "and",
        [("term", "a", 2.5), ("term", "b"), ("not", ("term", "c"))],
    )
    assert term_boosts(ast) == {"a": 2.5, "b": 1.0}


def test_conflicting_boosts_rejected():
    from spcht_spark.index.boolean import term_boosts

    with pytest.raises(QueryParseError, match="conflicting"):
        term_boosts(parse_query("a^2 OR a^3"))


def test_boost_scales_score(spark, small_corpus_pd, small_index):
    base = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q", "handler7", 5)],
    ).collect()
    boosted = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q", "handler7^2", 5)],
    ).collect()
    assert len(base) == len(boosted) > 0
    for b, bb in zip(sorted(base, key=lambda r: r["rank"]),
                     sorted(boosted, key=lambda r: r["rank"])):
        assert bb["doc_id"] == b["doc_id"]
        assert abs(bb["score"] - 2.0 * b["score"]) < 1e-9


def test_search_start_offset(spark, small_corpus, small_index):
    from spcht_spark.index.search import SearchRequest, search

    full = search(
        spark, small_index, small_corpus, SearchRequest(q="return", k=9)
    ).hits.collect()
    page2 = search(
        spark, small_index, small_corpus, SearchRequest(q="return", k=3, start=3)
    ).hits.collect()
    full_sorted = sorted(full, key=lambda r: r["rank"])
    page2_sorted = sorted(page2, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in page2_sorted] == [
        r["doc_id"] for r in full_sorted[3:6]
    ]
    assert [r["rank"] for r in page2_sorted] == [4, 5, 6]


# ------------------------------------------------- attribute clauses

def test_parse_attr_clauses():
    assert parse_query("a AND lang:en") == (
        "and", [("term", "a"), ("eq", "lang", "en")]
    )
    assert parse_query("a AND n:[200 TO *]") == (
        "and", [("term", "a"), ("range", "n", 200.0, None)]
    )
    assert parse_query("a AND n:[* TO 5]") == (
        "and", [("term", "a"), ("range", "n", None, 5.0)]
    )
    assert parse_query("a AND -lang:zh") == (
        "and", [("term", "a"), ("not", ("eq", "lang", "zh"))]
    )


@pytest.mark.parametrize(
    "bad",
    [
        "lang:en",                      # attr alone cannot drive retrieval
        "a OR lang:en",                 # an attr-only branch
        "a OR NOT n:[1 TO 2]",          # attr-only branch (negated)
        "a AND n:[1 2]",                # malformed range
    ],
)
def test_attr_rejects(bad):
    with pytest.raises(QueryParseError):
        parse_query(bad)


def test_parse_string_range_bounds():
    # Non-numeric bounds make a LEXICOGRAPHIC string range — the
    # reference's datetime pattern (WorkOrder.py:702-707) parses as-is.
    assert parse_query("a AND last:[2021-01-01T00:00:00Z TO *]") == (
        "and", [("term", "a"), ("range", "last", "2021-01-01T00:00:00Z", None)]
    )
    # mixed bounds: any non-numeric closed bound → both compared as text
    assert parse_query("a AND v:[1 TO x]") == (
        "and", [("term", "a"), ("range", "v", "1", "x")]
    )
    ast = parse_query("a AND last:[2021-01-01 TO 2022-01-01]")
    assert eval_ast(ast, frozenset({"a"}), {"last": "2021-06-15"})
    assert not eval_ast(ast, frozenset({"a"}), {"last": "2022-06-15"})
    sql = ast_to_duckdb(ast)
    assert "d.last::VARCHAR >= '2021-01-01'" in sql
    assert "d.last::VARCHAR <= '2022-01-01'" in sql


def test_eval_ast_with_attrs():
    ast = parse_query("a AND lang:en AND n:[10 TO 20]")
    ok = {"lang": "en", "n": 15}
    assert eval_ast(ast, frozenset({"a"}), ok)
    assert not eval_ast(ast, frozenset({"a"}), {"lang": "de", "n": 15})
    assert not eval_ast(ast, frozenset({"a"}), {"lang": "en", "n": 25})
    assert not eval_ast(ast, frozenset({"a"}), {})  # missing attrs → False
    assert not eval_ast(ast, frozenset(), ok)


def test_attr_duckdb_sql_shape():
    sql = ast_to_duckdb(parse_query("a AND n:[1 TO 2] AND -lang:zh"))
    # COALESCE(..., FALSE): missing/NULL attrs satisfy no clause, so
    # NOT-over-missing matches (Solr absence semantics) in DuckDB too.
    assert "COALESCE(d.n::DOUBLE >= 1.0 AND d.n::DOUBLE <= 2.0, FALSE)" in sql
    assert "(NOT COALESCE(d.lang::VARCHAR = 'zh', FALSE))" in sql


def test_boolean_topk_requires_attrs_table(spark, small_index):
    with pytest.raises(ValueError, match="attrs"):
        boolean_topk(
            spark, small_index.blocks, small_index.doclens,
            small_index.dictionary, small_index.stats,
            [("q", "return AND lang:en", 5)],
        )


def test_boolean_topk_with_attr_clauses(spark, small_corpus_pd, small_corpus, small_index):
    lang = small_corpus_pd["lang"].iloc[0]
    got = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q", f"return AND lang:{lang}", 1000)],
        attrs=small_corpus.select("doc_id", "lang"),
    ).collect()
    from spcht_spark.oracle import tokenize_py as tok

    expected = {
        int(r.doc_id)
        for r in small_corpus_pd.itertuples()
        if r.lang == lang and "return" in set(tok(r.content))
    }
    assert {r["doc_id"] for r in got} == expected


# ----------------------------------------------------------- execution

BOOL_QUERIES = [
    ("b_and", "return AND if", 10),
    ("b_or", "while let", 10),
    ("b_and_not", "return AND NOT if", 10),
    ("b_nested", "(def AND class) OR (func AND NOT var)", 10),
    ("b_missing_neg", "import AND NOT zz_no_such_term", 10),
    ("b_missing_pos", "zz_no_such_term AND import", 10),
]


def _py_bool_topk(pdf, qstring: str, k: int):
    ast = parse_query(qstring)
    terms = sorted(ast_terms(ast))
    pos = positive_terms(ast)
    toks = {int(r.doc_id): Counter(tokenize_py(r.content)) for r in pdf.itertuples()}
    dls = {d: sum(c.values()) for d, c in toks.items()}
    n_docs = len(toks)
    avgdl = sum(dls.values()) / n_docs
    dfs = {t: sum(1 for c in toks.values() if t in c) for t in terms}
    out = []
    for d, c in sorted(toks.items()):
        present = frozenset(t for t in terms if t in c)
        if not present or not eval_ast(ast, present):
            continue
        score = 0.0
        for t in sorted(present):
            if t in pos and dfs[t] > 0:
                score += term_score(c[t], dls[d], avgdl, idf_py(n_docs, dfs[t]))
        out.append((d, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_boolean_topk_matches_python(spark, small_corpus_pd, small_index):
    got = boolean_topk(
        spark,
        small_index.blocks,
        small_index.doclens,
        small_index.dictionary,
        small_index.stats,
        BOOL_QUERIES,
    ).collect()
    by_q: dict[str, list] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, qs, k in BOOL_QUERIES:
        exp = _py_bool_topk(small_corpus_pd, qs, k)
        assert by_q.get(qid, []) == exp, qid


def test_boolean_and_matches_and_topk(spark, small_index):
    """'a AND b' through the parser == the dedicated conjunctive path."""
    from spcht_spark.index.wand import and_topk

    got = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q", "return AND while", 15)],
    ).collect()
    want = and_topk(
        spark, small_index.blocks, small_index.dictionary, small_index.stats,
        [("q", ["return", "while"], 15)],
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in sorted(got, key=lambda r: r["rank"])] == [
        (r["doc_id"], r["score"]) for r in sorted(want, key=lambda r: r["rank"])
    ]


# ------------------------------------------------- wildcards inside q

def test_parse_wildcard_nodes_and_bare_rejection():
    assert parse_query("spark AND te*t") == (
        "and", [("term", "spark"), ("wild", "te*t")]
    )
    assert parse_query("a AND -w?d") == (
        "and", [("term", "a"), ("not", ("wild", "w?d"))]
    )
    with pytest.raises(QueryParseError, match="bare wildcard"):
        parse_query("spark AND *")
    # wildcard patterns bypass stemming but keep case folding
    assert parse_query("Te*T", analyzer="lowercase,stop,sstem") == (
        "wild", "te*t"
    )


def test_wildcard_in_q_equals_hand_expanded_query(
    spark, small_corpus_pd, small_index
):
    """`te*t` inside a boolean q must behave exactly like the flat OR
    of its dictionary expansion (engine-vs-engine), and match the
    pure-Python oracle of the hand-expanded string."""
    from spcht_spark.index.prefix import expand_wildcards

    exp = expand_wildcards(small_index.dictionary, ["*urn", "h*dler?"], 50)
    assert exp["*urn"] and len(exp["h*dler?"]) > 1  # fixture must expand

    cases = [
        ("w_and", "*urn AND import",
         f"({' OR '.join(exp['*urn'])}) AND import"),
        ("w_not", "import AND NOT h*dler?",
         f"import AND NOT ({' OR '.join(exp['h*dler?'])})"),
    ]
    args = (
        small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
    )
    got = boolean_topk(spark, *args, [(qid, q, 1000) for qid, q, _ in cases]).collect()
    want = boolean_topk(spark, *args, [(qid, e, 1000) for qid, _, e in cases]).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    as_rows = lambda rs: [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
                          for r in sorted(rs, key=key)]
    assert as_rows(got) == as_rows(want)
    for qid, _, expanded in cases:
        exp_py = _py_bool_topk(small_corpus_pd, expanded, 1000)
        rows = [(r["doc_id"], r["score"]) for r in sorted(got, key=key)
                if r["query_id"] == qid]
        assert rows == exp_py, qid


def test_wildcard_no_expansion_matches_nothing(spark, small_index):
    got = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("w_none", "import AND zq*x", 10)],
    ).collect()
    assert got == []


# ------------------------------------------------ Lucene '+' (MUST)

def test_parse_plus_required_desugar():
    """'+a b c' = a MUST, b/c SHOULD → AND(a, OR(a, b, c)): required
    clauses gate admissibility, bare siblings turn score-only; each
    distinct positive term still scores once (BooleanQuery contract)."""
    assert parse_query("+a b c") == (
        "and",
        [("term", "a"), ("or", [("term", "a"), ("term", "b"), ("term", "c")])],
    )
    assert parse_query("+a +b c") == (
        "and",
        [("term", "a"), ("term", "b"),
         ("or", [("term", "a"), ("term", "b"), ("term", "c")])],
    )
    assert parse_query("+a") == ("term", "a")
    assert parse_query("+a +b") == ("and", [("term", "a"), ("term", "b")])
    # explicit AND already makes every clause MUST — '+' is redundant
    assert parse_query("+a AND b") == parse_query("a AND b")
    assert parse_query("++a b") == parse_query("+a b")


def test_plus_required_execution(spark, small_corpus_pd, small_index):
    """Engine execution of '+return import': every hit contains
    'return'; docs also containing 'import' outscore their
    return-only twins; equals the pure-Python oracle."""
    got = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q_plus", "+return import", 1000)],
    ).collect()
    exp = _py_bool_topk(small_corpus_pd, "+return import", 1000)
    rows = [(r["doc_id"], r["score"])
            for r in sorted(got, key=lambda r: r["rank"])]
    assert rows == exp
    toks = {int(r.doc_id): set(tokenize_py(r.content))
            for r in small_corpus_pd.itertuples()}
    assert rows and all("return" in toks[d] for d, _ in rows)
    assert any("import" in toks[d] for d, _ in rows)


def test_parse_qop_and_default_operator():
    """q.op=AND: bare adjacency binds as MUST; explicit OR still
    separates; precedence NOT > AND = adjacency > OR."""
    assert parse_query("a b", default_op="AND") == (
        "and", [("term", "a"), ("term", "b")]
    )
    assert parse_query("a b OR c", default_op="AND") == (
        "or", [("and", [("term", "a"), ("term", "b")]), ("term", "c")]
    )
    assert parse_query("a OR b c", default_op="AND") == (
        "or", [("term", "a"), ("and", [("term", "b"), ("term", "c")])]
    )
    # '-clause' adjacency under AND is Solr's '+a -b'
    assert parse_query("a -b", default_op="AND") == (
        "and", [("term", "a"), ("not", ("term", "b"))]
    )
    # attr clause ANDs in — the reference's last_indexed pattern
    assert parse_query("a lang:en", default_op="AND") == (
        "and", [("term", "a"), ("eq", "lang", "en")]
    )
    # '+' markers are redundant under an AND default
    assert parse_query("+a b", default_op="AND") == (
        "and", [("term", "a"), ("term", "b")]
    )
    # single clause / explicit operators unchanged
    assert parse_query("a", default_op="AND") == ("term", "a")
    assert parse_query("a AND b OR c", default_op="AND") == parse_query(
        "a AND b OR c"
    )
    with pytest.raises(QueryParseError):
        parse_query("a b", default_op="XOR")


def test_qop_and_execution_equals_explicit_and(spark, small_index):
    """boolean_topk(default_op='AND') on 'return import' must produce
    exactly the explicit 'return AND import' ranking (routed AND path),
    and differ from the OR default."""
    got_qop = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q", "return import", 50)], default_op="AND",
    ).collect()
    got_and = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q", "return AND import", 50)],
    ).collect()
    key = lambda rows: [(r["rank"], r["doc_id"], round(r["score"], 9))
                        for r in sorted(rows, key=lambda r: r["rank"])]
    assert key(got_qop) == key(got_and)
    got_or = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q", "return import", 100000)],
    ).collect()
    got_and_all = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q", "return import", 100000)], default_op="AND",
    ).collect()
    or_docs = {r["doc_id"] for r in got_or}
    and_docs = {r["doc_id"] for r in got_and_all}
    assert and_docs < or_docs  # OR admits a strict superset
