"""Property tests (hypothesis) for the boolean query language and the
varbyte codec — pure-Python paths, no SparkSession."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spcht_spark.index.boolean import (
    QueryParseError,
    ast_terms,
    eval_ast,
    parse_query,
)
from spcht_spark.index.compress import varbyte_decode, varbyte_encode

TERMS = ["alpha", "beta", "gamma", "delta", "eps"]

# ---------------------------------------------------------------- ASTs

terms_st = st.sampled_from(TERMS)


def ast_st(depth: int = 3):
    leaf = st.builds(lambda t: ("term", t), terms_st)
    if depth == 0:
        return leaf
    sub = ast_st(depth - 1)
    return st.one_of(
        leaf,
        st.builds(lambda x: ("not", x), sub),
        st.builds(lambda xs: ("and", xs), st.lists(sub, min_size=2, max_size=3)),
        st.builds(lambda xs: ("or", xs), st.lists(sub, min_size=2, max_size=3)),
    )


def render(ast) -> str:
    kind = ast[0]
    if kind == "term":
        return ast[1]
    if kind == "not":
        return f"NOT {render(ast[1])}"
    op = " AND " if kind == "and" else " OR "
    return "(" + op.join(render(a) for a in ast[1]) + ")"


def norm(ast):
    """Flatten nested same-op n-ary nodes the way the parser builds
    them from a fully-parenthesized render (each paren group is one
    n-ary node, so only single-child collapse applies)."""
    return ast


@given(ast_st())
@settings(max_examples=300, deadline=None)
def test_parse_render_roundtrip_or_reject(ast):
    """Rendering an AST and parsing it back preserves semantics: for
    every subset of the vocabulary, eval(original) == eval(parsed).
    Pure-negative ASTs must be consistently REJECTED — exactly when the
    original matches the empty term set."""
    q = render(ast)
    matches_empty = eval_ast(ast, frozenset())
    try:
        parsed = parse_query(q)
    except QueryParseError:
        assert matches_empty, q
        return
    assert not matches_empty, q
    vocab = sorted(ast_terms(ast))
    for mask in range(1 << len(vocab)):
        present = frozenset(t for i, t in enumerate(vocab) if mask >> i & 1)
        assert eval_ast(parsed, present) == eval_ast(ast, present), (q, present)


@given(st.lists(st.sampled_from(TERMS + ["AND", "OR", "NOT", "(", ")", "-x"]),
                max_size=8))
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes(tokens):
    """Arbitrary token soup either parses or raises QueryParseError —
    never an unexpected exception."""
    q = " ".join(tokens)
    try:
        parse_query(q)
    except QueryParseError:
        pass


# ------------------------------------------------------------- varbyte

@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip_property(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@given(st.lists(st.sampled_from(
    TERMS + ["AND", "OR", "NOT", "(", ")", "-beta", "+alpha", "ga*",
             "?lpha", "eps~1", "x:y", "n:[1 TO 2]"]),
    max_size=8))
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes_extended_surface(tokens):
    """Token soup over the FULL round-5 surface (MUST markers,
    wildcards, fuzzy, attr clauses) either parses or raises
    QueryParseError under BOTH default operators — never any other
    exception."""
    q = " ".join(tokens)
    for op in ("OR", "AND"):
        try:
            parse_query(q, default_op=op)
        except QueryParseError:
            pass


@given(ast_st())
@settings(max_examples=200, deadline=None)
def test_qop_and_equals_explicit_and_render(ast):
    """For any AST, rendering with explicit operators parses to the
    same semantics under q.op=OR and q.op=AND — explicit operators
    leave no adjacency for the default op to bind."""
    q = render(ast)
    matches_empty = eval_ast(ast, frozenset())
    try:
        p_or = parse_query(q, default_op="OR")
        p_and = parse_query(q, default_op="AND")
    except QueryParseError:
        assert matches_empty, q
        return
    vocab = sorted(ast_terms(ast))
    for mask in range(1 << len(vocab)):
        present = frozenset(t for i, t in enumerate(vocab) if mask >> i & 1)
        assert eval_ast(p_or, present) == eval_ast(p_and, present), (q, present)


@given(st.lists(terms_st, min_size=2, max_size=4, unique=True))
@settings(max_examples=100, deadline=None)
def test_qop_and_adjacency_is_conjunction(ts):
    """'a b c' under q.op=AND evaluates exactly as 'a AND b AND c'."""
    adj = parse_query(" ".join(ts), default_op="AND")
    conj = parse_query(" AND ".join(ts))
    for mask in range(1 << len(ts)):
        present = frozenset(t for i, t in enumerate(ts) if mask >> i & 1)
        assert eval_ast(adj, present) == eval_ast(conj, present), (ts, present)
