"""Boolean query language over the block index (Lucene/Solr `q` syntax).

The reference talks to Solr with free-form `q` strings (default operator
OR, `AND`/`OR`/`NOT`, parentheses — /root/reference/Spcht/Core/
WorkOrder.py:693-707 builds exactly such conjunctions). This module
parses that surface and answers it from the posting blocks:

* ``parse_query`` — recursive-descent parser → tiny AST
  (('term', t) | ('fuzzy', base, dist) | ('wild', pattern) |
  ('and', [..]) | ('or', [..]) |
  ('not', x) | ('eq', field, value) | ('range', field, lo, hi)).
  Fuzzy terms (``roam~2``) and wildcard terms (``te*t``, ``*ing``)
  rewrite to their capped dictionary expansion before execution
  (:func:`expand_fuzzy_asts`, Lucene SCORING_BOOLEAN).
  Precedence NOT > AND > OR; adjacency is implicit OR (Solr default op).
  ``field:value`` and ``field:[lo TO hi]`` clauses are the in-``q``
  metadata predicates Solr mixes with fulltext — the reference ANDs
  ``last_indexed:[t TO *]`` into its query exactly like this
  (WorkOrder.py:702-707). ``*`` opens a range end; attr clauses match
  against a doc-attribute table (eq as string, range as double) and
  contribute no score (constant-score-0 filter clauses).
* ``boolean_topk`` — one term-pruned block scan for ALL terms of ALL
  queries (including negated ones: their postings are needed to prove a
  doc inadmissible), one groupBy (query, doc) building the doc's
  term-set + its BM25 score over the POSITIVE terms (Lucene semantics:
  MUST/SHOULD clauses score, MUST_NOT never does), then the AST
  evaluated as a pure Catalyst predicate over the term-set and the
  shared salted top-k. No corpus scan, no per-row Python.

Pure-negative queries (any clause satisfiable by a doc containing NONE
of the query terms, e.g. ``NOT x`` or ``a OR NOT b``) are rejected:
such docs are invisible to a postings-only engine — the same rule
Lucene applies to top-level MUST_NOT. The check is semantic, not
syntactic: the AST is evaluated against the empty term-set.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spcht_spark.index.query import (
    decode_blocks,
    query_idfs,
    sql_in,
    stats_and_idfs,
    topk,
    values_df,
)
from spcht_spark.oracle import B, K1

Ast = tuple

# range clauses carry spaces inside the brackets — lex them as one token
_TOKEN_RE = re.compile(r"\(|\)|[^\s()]+:\[[^\]]*\]|[^\s()]+")
_ATTR_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_.]*):(.+)$")
_RANGE_RE = re.compile(r"^\[\s*(\S+)\s+TO\s+(\S+)\s*\]$", re.IGNORECASE)
_BOOST_RE = re.compile(r"^([^\s:()^]+)\^(\d+(?:\.\d+)?)$")
# Lucene fuzzy term: base~1 / base~2 (distance 0 would be a plain term)
_FUZZY_Q_RE = re.compile(r"^([^\s:()^~]+)~([12])$")
# Lucene wildcard term in q: contains * or ? plus at least one literal
# char (a bare * is MatchAllDocs, which postings-driven retrieval
# cannot answer — rejected at parse)
_WILD_Q_RE = re.compile(r"^(?=.*[*?])(?=.*[^*?])[^\s:()^~]+$")


class QueryParseError(ValueError):
    pass


def _lex(q: str) -> list[str]:
    return _TOKEN_RE.findall(q)


def _attr_clause(field_name: str, val: str, q: str) -> Ast:
    if val.startswith("["):
        m = _RANGE_RE.match(val)
        if not m:
            raise QueryParseError(f"malformed range {val!r} in {q!r}")
        raw = [m.group(1), m.group(2)]
        closed = [s for s in raw if s != "*"]
        # Numeric range when every closed bound parses as a number;
        # otherwise a LEXICOGRAPHIC string range — which is exactly
        # right for the reference's ISO-8601 datetime bounds
        # (`last_indexed:[2021-01-01T00:00:00Z TO *]`, WorkOrder.py:
        # 702-707): fixed-width ISO-8601 sorts chronologically as text.
        try:
            nums = [float(s) for s in closed]
        except ValueError:
            bounds = [None if s == "*" else s for s in raw]
        else:
            it = iter(nums)
            bounds = [None if s == "*" else next(it) for s in raw]
        return ("range", field_name, bounds[0], bounds[1])
    return ("eq", field_name, val)


def parse_query(
    q: str, analyzer: str | None = None, require_positive: bool = True,
    default_op: str = "OR",
) -> Ast:
    """Parse a boolean query string. Raises QueryParseError on syntax
    errors and — when ``require_positive`` (the default) — on
    pure-negative (postings-unanswerable) queries. Pass
    ``require_positive=False`` for contexts whose candidate universe
    does NOT come from this query's own postings (facet.query counts
    over the base query's DocSet, so ``NOT term`` / pure attribute
    predicates are answerable there).

    ``analyzer`` must MATCH the analyzer the index was built with
    (build_tokens/build_index): ``None`` keeps terms verbatim (the
    default build is case-preserving — ``Return`` and ``return`` are
    distinct terms, right for source code), ``"lowercase"`` folds query
    terms exactly as the build folded content (Solr: the same analyzer
    chain runs at index and query time). Attribute field names/values
    (``lang:en``) are never folded — they address the doc-attribute
    table, not the analyzed text.

    ``default_op`` is Solr's ``q.op``: the operator bare adjacency
    binds with. ``"OR"`` (Solr's default) keeps adjacency = SHOULD;
    ``"AND"`` makes every adjacency-joined run a MUST group.
    Precedence stays NOT > AND = adjacency > OR, so ``a b OR c`` under
    q.op=AND reads ``(a AND b) OR c`` — the coherent reading of
    "default operator", without the classic Lucene QueryParser quirk
    where OR-adjacent SHOULD clauses survive inside an AND default."""
    if default_op not in ("OR", "AND"):
        raise QueryParseError(f"q.op must be OR or AND, got {default_op!r}")
    ast = _parse_tokens(_lex(q), q, analyzer, default_op)
    if require_positive and _satisfiable_without_terms(ast):
        raise QueryParseError(
            f"query {q!r} can match docs containing none of its fulltext "
            "terms — unanswerable from postings (Lucene top-level MUST_NOT "
            "rule; attribute clauses alone cannot drive retrieval here)"
        )
    return ast


def _fold_fn(analyzer: str | None):
    """Query-side analyzer: the SAME chain the build ran
    (spcht_spark.index.analyze). A stopword query term keeps its
    verbatim form — stopwords carry no postings, so it matches nothing
    (strict semantics; Lucene drops the clause instead — drop
    client-side if that is wanted)."""
    if analyzer is None:
        return lambda s: s
    from spcht_spark.index.analyze import content_steps, fold_token_py

    low = "lowercase" in content_steps(analyzer)  # validates the spec

    def fold(s: str) -> str:
        if low:
            s = s.lower()
        out = fold_token_py(s, analyzer)
        return s if out is None else out

    return fold


def _parse_tokens(
    toks: list[str], q: str, analyzer: str | None = None,
    default_op: str = "OR",
) -> Ast:
    fold = _fold_fn(analyzer)
    # Wildcard patterns bypass analysis except case folding (Lucene
    # multi-term query semantics: stop/stem never run on `te*t`, but
    # lowercaseExpandedTerms applies when the chain folds case) — the
    # dictionary the pattern expands against holds folded terms.
    if analyzer is not None:
        from spcht_spark.index.analyze import content_steps

        _wild_low = "lowercase" in content_steps(analyzer)
    else:
        _wild_low = False
    wild_fold = (lambda s: s.lower()) if _wild_low else (lambda s: s)
    pos = 0

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def take() -> str:
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or() -> Ast:
        parts = [parse_and()]
        seps: list[str] = []  # joiner BEFORE parts[i+1]: "or" | "adj"
        while True:
            t = peek()
            if t is None or t == ")":
                break
            if t.upper() == "OR":
                take()
                seps.append("or")
                parts.append(parse_and())
            elif t.upper() == "AND":
                break
            else:  # adjacency: the q.op default operator (Solr: OR)
                seps.append("adj")
                parts.append(parse_and())
        if default_op == "AND":
            # q.op=AND: adjacency-joined runs become MUST groups;
            # explicit OR still separates them. '+' markers are
            # redundant under an AND default and simply unwrap.
            groups: list[list[Ast]] = [[parts[0]]]
            for sep, p in zip(seps, parts[1:]):
                (groups[-1].append(p) if sep == "adj" else groups.append([p]))

            def _and_group(g: list[Ast]) -> Ast:
                g = [x[1] if x[0] == "req" else x for x in g]
                return g[0] if len(g) == 1 else ("and", g)

            gs = [_and_group(g) for g in groups]
            return gs[0] if len(gs) == 1 else ("or", gs)
        # Lucene '+clause' (MUST among SHOULDs): required clauses gate
        # admissibility, bare siblings turn score-only. Desugars to
        # AND(required..., OR(required..., optional...)) — each distinct
        # positive term still scores once, exactly BooleanQuery's
        # MUST/SHOULD contract. '+a OR b' is a parse error in Lucene
        # too; here the marker simply binds the adjacency list.
        req = [p[1] for p in parts if p[0] == "req"]
        if req:
            opt = [p for p in parts if p[0] != "req"]
            if not opt:
                return req[0] if len(req) == 1 else ("and", req)
            return ("and", [*req, ("or", [*req, *opt])])
        return parts[0] if len(parts) == 1 else ("or", parts)

    def parse_and() -> Ast:
        parts = [parse_unary()]
        while peek() is not None and peek().upper() == "AND":
            take()
            parts.append(parse_unary())
        if len(parts) == 1:
            return parts[0]  # a lone '+clause' marker propagates to OR level
        # explicit AND makes every clause MUST — '+' markers are redundant
        return ("and", [p[1] if p[0] == "req" else p for p in parts])

    def parse_unary() -> Ast:
        t = peek()
        if t is None:
            raise QueryParseError(f"unexpected end of query: {q!r}")
        if t.upper() == "NOT":
            take()
            inner = parse_unary()
            if inner[0] == "req":  # 'NOT +a': no OR-level to bind — the
                inner = inner[1]   # MUST marker is vacuous under NOT
            return ("not", inner)
        if t.startswith("+") and len(t) > 1:  # Lucene '+clause' (MUST)
            take()
            toks.insert(pos, t[1:])  # re-lex the body as its own token
            inner = parse_unary()
            if inner[0] == "req":  # '++a' — idempotent marker
                inner = inner[1]
            return ("req", inner)
        if t.startswith("-") and len(t) > 1:  # Lucene '-clause'
            take()
            body = t[1:]
            mb = _BOOST_RE.match(body)
            if mb:  # boost on a negated clause never scores; keep the term
                return ("not", ("term", fold(mb.group(1))))
            m = _ATTR_RE.match(body)
            if m:
                return ("not", _attr_clause(m.group(1), m.group(2), q))
            mf = _FUZZY_Q_RE.match(body)
            if mf:
                return ("not", ("fuzzy", fold(mf.group(1)), int(mf.group(2))))
            if "*" in body or "?" in body:
                if not _WILD_Q_RE.match(body):
                    raise QueryParseError(
                        f"bare wildcard {body!r} in {q!r} — a match-all "
                        "clause is not answerable from postings"
                    )
                return ("not", ("wild", wild_fold(body)))
            return ("not", ("term", fold(body)))
        if t == "(":
            take()
            inner = parse_or()
            if peek() != ")":
                raise QueryParseError(f"unbalanced parens in {q!r}")
            take()
            return inner
        if t == ")" or t.upper() in ("AND", "OR"):
            raise QueryParseError(f"unexpected {t!r} in {q!r}")
        mb = _BOOST_RE.match(t)
        if mb:  # Lucene per-term boost: term^2.5
            take()
            return ("term", fold(mb.group(1)), float(mb.group(2)))
        m = _ATTR_RE.match(t)
        if m:
            take()
            return _attr_clause(m.group(1), m.group(2), q)
        mf = _FUZZY_Q_RE.match(t)
        if mf:  # Lucene fuzzy: base~1 / base~2 → dictionary expansion
            take()
            return ("fuzzy", fold(mf.group(1)), int(mf.group(2)))
        if "*" in t or "?" in t:  # Lucene wildcard term → dictionary scan
            take()
            if not _WILD_Q_RE.match(t):
                raise QueryParseError(
                    f"bare wildcard {t!r} in {q!r} — a match-all clause "
                    "is not answerable from postings"
                )
            return ("wild", wild_fold(t))
        return ("term", fold(take()))

    ast = parse_or()
    if pos != len(toks):
        raise QueryParseError(f"trailing tokens in {q!r}")
    return ast


def _attr_clauses(ast: Ast) -> list[Ast]:
    kind = ast[0]
    if kind in ("eq", "range"):
        return [ast]
    if kind in ("term", "fuzzy", "wild"):
        return []
    if kind == "not":
        return _attr_clauses(ast[1])
    out: list[Ast] = []
    for a in ast[1]:
        out.extend(_attr_clauses(a))
    return out


def _collect_fuzzy_specs(ast: Ast, specs: set[tuple[str, int]]) -> None:
    if ast[0] == "fuzzy":
        specs.add((ast[1], ast[2]))
    elif ast[0] == "not":
        _collect_fuzzy_specs(ast[1], specs)
    elif ast[0] in ("and", "or"):
        for c in ast[1]:
            _collect_fuzzy_specs(c, specs)


def expand_fuzzy_asts(
    asts: list[Ast], dictionary: DataFrame, max_expansions: int = 50
) -> list[Ast]:
    """Batch form of :func:`expand_fuzzy_ast`: rewrite every
    ``('fuzzy', base, dist)`` node across ALL asts into the scoring
    boolean of its dictionary expansion (Lucene's SCORING_BOOLEAN
    rewrite) — a flat OR of the ≤ ``max_expansions`` nearest terms
    (distance asc, df desc, term asc — spcht_spark.index.fuzzy). A
    fuzzy term with NO expansion becomes its (index-absent) base term,
    which matches nothing — exactly an unmatched plain term.

    ``('wild', pattern)`` nodes (``te*t`` / ``*ing`` in q) expand the
    same way through :func:`spcht_spark.index.prefix.expand_wildcards`
    (anchored-regex dictionary scan, same maxExpansions discipline); a
    pattern with no expansion becomes itself as an (index-absent) term.

    The fuzzy/wildcard specs of the WHOLE BATCH feed one pruned
    dictionary pass each (round-4 VERDICT "What's wrong" #2: the
    per-query call made a batch of F fuzzy queries cost F driver
    round-trips); batches without such nodes never touch the
    dictionary."""
    from spcht_spark.index.fuzzy import expand_fuzzy
    from spcht_spark.index.prefix import expand_wildcards

    specs: set[tuple[str, int]] = set()
    wild: set[str] = set()
    for ast in asts:
        _collect_fuzzy_specs(ast, specs)
        _collect_wild_patterns(ast, wild)
    if not specs and not wild:
        return list(asts)
    exp = (
        expand_fuzzy(
            dictionary, [f"{b}~{d}" for b, d in sorted(specs)], max_expansions
        )
        if specs
        else {}
    )
    wexp = expand_wildcards(dictionary, sorted(wild), max_expansions) if wild else {}

    def flat_or(terms: list[str]) -> Ast:
        if len(terms) == 1:
            return ("term", terms[0])
        return ("or", [("term", t) for t in terms])

    def rewrite(a: Ast) -> Ast:
        if a[0] == "fuzzy":
            return flat_or(exp.get(f"{a[1]}~{a[2]}") or [a[1]])
        if a[0] == "wild":
            return flat_or(wexp.get(a[1]) or [a[1]])
        if a[0] == "not":
            return ("not", rewrite(a[1]))
        if a[0] in ("and", "or"):
            return (a[0], [rewrite(c) for c in a[1]])
        return a

    return [rewrite(ast) for ast in asts]


def _collect_wild_patterns(ast: Ast, out: set[str]) -> None:
    if ast[0] == "wild":
        out.add(ast[1])
    elif ast[0] == "not":
        _collect_wild_patterns(ast[1], out)
    elif ast[0] in ("and", "or"):
        for c in ast[1]:
            _collect_wild_patterns(c, out)


def expand_fuzzy_ast(
    ast: Ast, dictionary: DataFrame, max_expansions: int = 50
) -> Ast:
    """Single-AST convenience wrapper over :func:`expand_fuzzy_asts`."""
    return expand_fuzzy_asts([ast], dictionary, max_expansions)[0]


def expand_synonyms_ast(ast: Ast, synonyms: dict[str, list[str]]) -> Ast:
    """Query-time synonym expansion (Solr SynonymGraphFilter on the
    query analyzer chain): every positive OR negated ``('term', t)``
    whose ``t`` keys ``synonyms`` rewrites to a flat OR of itself and
    its synonyms — each alternative scored with its OWN idf (Lucene's
    SynonymQuery ≈ scoring-boolean rewrite; the engine scores each
    term clause once, same as the fuzzy expansion). A per-term boost
    propagates to every alternative (Solr: the boost wraps the whole
    expanded clause). Under NOT the OR-expansion is exactly Solr's
    semantics too: ``-x`` with x≡y excludes docs containing either.

    The synonym map must be pre-analyzed with the index's analyzer
    (callers hold the map; the engine never guesses foldings).  Purely
    driver-side AST rewrite — zero plan cost beyond the extra terms'
    postings, which ride the same pruned block scan."""

    def rewrite(a: Ast) -> Ast:
        kind = a[0]
        if kind == "term":
            alts = synonyms.get(a[1])
            if not alts:
                return a
            boost = a[2:] if len(a) > 2 else ()
            seen: list[str] = [a[1]]
            for s in alts:
                if s not in seen:
                    seen.append(s)
            return ("or", [("term", t, *boost) for t in seen])
        if kind == "not":
            return ("not", rewrite(a[1]))
        if kind in ("and", "or"):
            return (kind, [rewrite(c) for c in a[1]])
        return a

    return rewrite(ast)


def _satisfiable_without_terms(ast: Ast) -> bool:
    """True if SOME truth assignment of the attribute clauses makes the
    query match a doc containing none of its fulltext terms — such docs
    never reach the postings-driven candidate set, so the query must be
    rejected. Attribute clauses are treated as free booleans (2^n
    enumeration; n is query-sized)."""
    clauses = sorted({c for c in _attr_clauses(ast)}, key=repr)
    for mask in range(1 << len(clauses)):
        assign = {c: bool(mask >> i & 1) for i, c in enumerate(clauses)}
        if eval_ast(ast, frozenset(), _attr=lambda c: assign[c]):
            return True
    return False


def ast_terms(ast: Ast) -> set[str]:
    kind = ast[0]
    if kind in ("term", "fuzzy", "wild"):  # pre-expansion: the base /
        return {ast[1]}                    # pattern stands for the clause
    if kind in ("eq", "range"):
        return set()
    if kind == "not":
        return ast_terms(ast[1])
    return set().union(*(ast_terms(a) for a in ast[1]))


def ast_attr_fields(ast: Ast) -> set[str]:
    """Attribute-table columns the query's eq/range clauses touch."""
    return {c[1] for c in _attr_clauses(ast)}


def term_boosts(ast: Ast) -> dict[str, float]:
    """Boost per positive term (default 1.0). A term carrying two
    different boosts in one query is rejected — Lucene would score the
    clauses separately; here a term scores once."""
    out: dict[str, float] = {}

    def walk(a: Ast, neg: bool) -> None:
        kind = a[0]
        if kind in ("fuzzy", "wild"):
            return  # expands to unboosted terms
        if kind == "term":
            if neg:
                return
            b = float(a[2]) if len(a) > 2 else 1.0
            if a[1] in out and out[a[1]] != b:
                raise QueryParseError(
                    f"term {a[1]!r} appears with conflicting boosts "
                    f"({out[a[1]]} vs {b})"
                )
            out[a[1]] = b
        elif kind == "not":
            walk(a[1], not neg)
        elif kind in ("and", "or"):
            for c in a[1]:
                walk(c, neg)

    walk(ast, False)
    return out


def positive_terms(ast: Ast, neg: bool = False) -> set[str]:
    """Terms occurring in scoring (non-negated) position."""
    kind = ast[0]
    if kind in ("term", "fuzzy", "wild"):
        return set() if neg else {ast[1]}
    if kind in ("eq", "range"):
        return set()
    if kind == "not":
        return positive_terms(ast[1], not neg)
    return set().union(*(positive_terms(a, neg) for a in ast[1]))


def _range_is_str(lo, hi) -> bool:
    return isinstance(lo, str) or isinstance(hi, str)


def _eval_attr(ast: Ast, attrs: dict | None) -> bool:
    if attrs is None:
        return False  # no attribute row available
    if ast[0] == "eq":
        v = attrs.get(ast[1])
        return v is not None and str(v) == ast[2]
    _, fld, lo, hi = ast
    v = attrs.get(fld)
    if v is None:
        return False
    if _range_is_str(lo, hi):
        s = str(v)
        return (lo is None or s >= lo) and (hi is None or s <= hi)
    x = float(v)
    return (lo is None or x >= lo) and (hi is None or x <= hi)


def eval_ast(
    ast: Ast,
    present: frozenset[str],
    attrs: dict | None = None,
    _attr=None,
) -> bool:
    """Reference evaluator. ``attrs`` maps attribute field → value for
    the doc under test (missing field → clause False); ``_attr`` is an
    internal hook used by the satisfiability check."""
    kind = ast[0]
    if kind == "term":
        return ast[1] in present
    if kind in ("fuzzy", "wild"):
        # pre-expansion node: satisfied only via term presence (its
        # base / pattern) — what the pure-negative check needs;
        # execution paths always expand first (expand_fuzzy_asts), so
        # scoring never evaluates a fuzzy/wild node.
        return ast[1] in present
    if kind in ("eq", "range"):
        return _attr(ast) if _attr is not None else _eval_attr(ast, attrs)
    if kind == "not":
        return not eval_ast(ast[1], present, attrs, _attr)
    if kind == "and":
        return all(eval_ast(a, present, attrs, _attr) for a in ast[1])
    return any(eval_ast(a, present, attrs, _attr) for a in ast[1])


def ast_predicate(ast: Ast, terms_col: Column) -> Column:
    """AST → Catalyst boolean over an array-of-terms column plus (for
    eq/range clauses) the joined attribute columns. Attribute clauses
    are coalesced to FALSE on NULL (a doc missing from the attrs table,
    or with a NULL field, satisfies no attribute clause) — so
    ``NOT field:v`` MATCHES such docs, Solr ``-field:v`` absence
    semantics, and all three evaluators (this, :func:`eval_ast`,
    :func:`ast_to_duckdb`) agree instead of SQL three-valued logic
    silently dropping the doc under negation."""
    kind = ast[0]
    if kind == "term":
        return F.array_contains(terms_col, ast[1])
    if kind == "eq":
        return F.coalesce(F.col(ast[1]).cast("string") == ast[2], F.lit(False))
    if kind == "range":
        _, fld, lo, hi = ast
        if _range_is_str(lo, hi):
            c = F.col(fld).cast("string")
        else:
            c = F.col(fld).cast("double")
        out = F.lit(True)
        if lo is not None:
            out = out & (c >= F.lit(lo))
        if hi is not None:
            out = out & (c <= F.lit(hi))
        return F.coalesce(out, F.lit(False))
    if kind == "not":
        return ~ast_predicate(ast[1], terms_col)
    parts = [ast_predicate(a, terms_col) for a in ast[1]]
    out = parts[0]
    for p in parts[1:]:
        out = (out & p) if kind == "and" else (out | p)
    return out


def ast_to_spark_sql(ast: Ast, terms_expr: str = "present") -> str:
    """AST → Spark SQL predicate string, semantics-identical to
    :func:`ast_predicate` (same coalesce-to-FALSE on NULL attr clauses,
    same operator tree). Built so a routed batch's per-query predicate
    dispatch is ONE parsed expression instead of a per-Column py4j
    construction (~2.5 ms per Column op in classic mode — the plan
    build, not the plan, was the cost)."""
    from spcht_spark.index.query import sql_double, sql_str

    kind = ast[0]
    if kind == "term":
        return f"array_contains({terms_expr}, {sql_str(ast[1])})"
    if kind == "eq":
        f = "`" + str(ast[1]).replace("`", "``") + "`"
        return f"coalesce(CAST({f} AS STRING) = {sql_str(ast[2])}, false)"
    if kind == "range":
        _, fld, lo, hi = ast
        f = "`" + str(fld).replace("`", "``") + "`"
        if _range_is_str(lo, hi):
            c = f"CAST({f} AS STRING)"
            lit = sql_str
        else:
            c = f"CAST({f} AS DOUBLE)"
            lit = sql_double
        out = "true"
        if lo is not None:
            out = f"({out} AND ({c} >= {lit(lo)}))"
        if hi is not None:
            out = f"({out} AND ({c} <= {lit(hi)}))"
        return f"coalesce({out}, false)"
    if kind == "not":
        return f"(NOT {ast_to_spark_sql(ast[1], terms_expr)})"
    parts = [ast_to_spark_sql(a, terms_expr) for a in ast[1]]
    op = " AND " if kind == "and" else " OR "
    out = parts[0]
    for p in parts[1:]:
        out = f"({out}{op}{p})"
    return out


def ast_to_duckdb(
    ast: Ast, terms_expr: str = "terms", attr_prefix: str = "d."
) -> str:
    """AST → DuckDB SQL predicate over a LIST(VARCHAR) column (oracle
    twin of ast_predicate); eq/range clauses reference
    ``{attr_prefix}<field>``."""
    kind = ast[0]
    if kind == "term":
        t = ast[1].replace("'", "''")
        return f"list_contains({terms_expr}, '{t}')"
    if kind == "eq":
        v = ast[2].replace("'", "''")
        return f"COALESCE({attr_prefix}{ast[1]}::VARCHAR = '{v}', FALSE)"
    if kind == "range":
        _, fld, lo, hi = ast
        parts = []
        if _range_is_str(lo, hi):
            if lo is not None:
                parts.append(
                    f"{attr_prefix}{fld}::VARCHAR >= '{lo.replace(chr(39), chr(39) * 2)}'"
                )
            if hi is not None:
                parts.append(
                    f"{attr_prefix}{fld}::VARCHAR <= '{hi.replace(chr(39), chr(39) * 2)}'"
                )
        else:
            if lo is not None:
                parts.append(f"{attr_prefix}{fld}::DOUBLE >= {lo}")
            if hi is not None:
                parts.append(f"{attr_prefix}{fld}::DOUBLE <= {hi}")
        return "COALESCE(" + (" AND ".join(parts) or "TRUE") + ", FALSE)"
    if kind == "not":
        return f"(NOT {ast_to_duckdb(ast[1], terms_expr, attr_prefix)})"
    op = " AND " if kind == "and" else " OR "
    return "(" + op.join(
        ast_to_duckdb(a, terms_expr, attr_prefix) for a in ast[1]
    ) + ")"


def boolean_matches(
    spark: SparkSession,
    blocks: DataFrame,
    doclens: DataFrame,
    dictionary: DataFrame,
    stats: DataFrame,
    queries: list[tuple[str, str, int]],
    doc_filter: DataFrame | None = None,
    attrs: DataFrame | None = None,
    analyzer: str | None = None,
    synonyms: dict[str, list[str]] | None = None,
    default_op: str = "OR",
) -> DataFrame:
    """ALL admissible (query_id, doc_id, score) rows of a batch of
    boolean query strings — the full matching set, pre-top-k (what
    facet/stats components count over).

    Plan: ``term IN (all terms)`` pruned block scan → Arrow decode (the
    dl lane rides along — no doclens join) → per-(query, doc) groupBy
    collecting the term-set and
    the term-ordered BM25 sum over positive terms (negated terms ride
    along with contribution 0.0 — they exist only to prove/disprove the
    predicate) → AST predicate (pure Catalyst, dispatched per query).
    Scoring stats stay corpus-wide, like fq.

    ``doclens`` is accepted for API symmetry but no longer joined —
    decode_blocks surfaces the blocks' dl lane.

    ``attrs`` (doc_id + metadata columns) is required when queries use
    ``field:value`` / ``field:[lo TO hi]`` clauses; candidates
    left-join it on doc_id (candidate rows only, never postings) and
    the clauses evaluate on the joined columns — in-``q`` metadata
    predicates, the reference's `last_indexed:[t TO *]` pattern
    (WorkOrder.py:702-707). Attr clauses never score."""
    asts = expand_fuzzy_asts(
        [expand_synonyms_ast(
            parse_query(qs, analyzer, default_op=default_op), synonyms or {})
         for _, qs, _ in queries],
        dictionary,
    )
    parsed = [(qid, ast, k) for (qid, _, k), ast in zip(queries, asts)]
    return boolean_matches_ast(
        spark, blocks, dictionary, stats, parsed,
        doc_filter=doc_filter, attrs=attrs,
    )


def boolean_matches_ast(
    spark: SparkSession,
    blocks: DataFrame,
    dictionary: DataFrame,
    stats: DataFrame,
    parsed: list[tuple[str, Ast, int]],
    doc_filter: DataFrame | None = None,
    attrs: DataFrame | None = None,
    stats_row=None,
    idfs: dict[str, float] | None = None,
) -> DataFrame:
    """:func:`boolean_matches` over pre-parsed, pre-expanded ASTs —
    what :func:`boolean_topk` calls so a routed batch parses and
    fuzzy-expands each query exactly once. ``stats_row``/``idfs``:
    shared batch precompute (see wand_topk) — skips this path's own
    stats/dictionary driver jobs when the router already ran them."""
    need_fields = sorted({f for _, ast, _ in parsed for f in ast_attr_fields(ast)})
    if need_fields and attrs is None:
        raise ValueError(
            f"queries reference attribute fields {need_fields} but no attrs "
            "table was given"
        )
    reserved = {"query_id", "doc_id", "score", "present", "term", "tf", "dl"}
    bad = reserved & set(need_fields)
    if bad:
        raise ValueError(
            f"attribute field name(s) {sorted(bad)} collide with engine "
            "columns — rename them in the attrs table and query"
        )
    all_terms = sorted({t for _, ast, _ in parsed for t in ast_terms(ast)})
    if stats_row is None and idfs is None:
        stats_row, idfs = stats_and_idfs(dictionary, stats, all_terms)
    elif stats_row is None:
        stats_row = stats.collect()[0]
        idfs = {t: idfs[t] for t in all_terms if t in idfs}
    elif idfs is None:
        idfs = query_idfs(dictionary, stats_row, all_terms)
    else:
        idfs = {t: idfs[t] for t in all_terms if t in idfs}
    avgdl = float(stats_row["avgdl"])
    if not idfs:
        return spark.createDataFrame(
            [], schema="query_id string, doc_id long, score double"
        )

    boosts = {qid: term_boosts(ast) for qid, ast, _ in parsed}
    qrows = [
        (qid, t, t in positive_terms(ast), boosts[qid].get(t, 1.0))
        for qid, ast, _ in parsed
        for t in sorted(ast_terms(ast))
        if t in idfs
    ]
    query_terms = values_df(
        spark, qrows, ["query_id", "term", "is_pos", "boost"]
    )
    from spcht_spark.index.query import sql_double, sql_map

    postings = decode_blocks(blocks.where(f"term IN ({sql_in(sorted(idfs))})"))
    # single-expr contrib (idf map + BM25 + boost gate) and fold — one
    # py4j call each instead of ~100 per-Column round-trips (see
    # index.query.score_postings); doubles via repr()+CAST, bit-exact
    from spcht_spark.index.query import SALT_MIN_DOCS, sql_esc, sql_str

    idf_map = sql_map(sorted(idfs.items()), sql_double)
    # Lucene per-term boost (term^2.5); 1.0 default
    contrib_expr = (
        f"CASE WHEN is_pos THEN boost * {idf_map}[term] * "
        f"((tf * {sql_double(K1 + 1.0)}) / (tf + {sql_double(K1)} * "
        f"({sql_double(1.0 - B)} + {sql_double(B)} * (dl / {sql_double(avgdl)})))) "
        "ELSE CAST(0.0 AS DOUBLE) END"
    )
    inner = (
        f"SELECT /*+ BROADCAST(q) */ *, {sql_esc(contrib_expr)} AS contrib "
        "FROM {postings} AS p JOIN {qt} AS q USING (term)"
    )
    if int(stats_row["n_docs"]) < SALT_MIN_DOCS:
        # proven-small corpus: partition by query_id alone so the
        # (query_id, doc_id) agg, the predicate filter and the caller's
        # top-k window share ONE exchange (see index.query.score_postings
        # — the same SALT_MIN_DOCS gate; large corpora keep the salted
        # two-exchange shape that prevents hot-query stragglers)
        n = int(postings.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        inner = f"SELECT /*+ REPARTITION({n}, query_id) */ * FROM ({inner})"
    g_sql = (
        "SELECT query_id, doc_id, "
        "aggregate(array_sort(collect_list(struct(term, contrib))), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.contrib) AS score, "
        f"collect_set(term) AS present FROM ({inner}) "
        "GROUP BY query_id, doc_id"
    )
    # one predicate for all queries (CASE WHEN query_id=... THEN ast_i),
    # rendered as a single SQL string — same nesting as the old
    # when/otherwise fold (later queries checked first)
    pred_sql = "false"
    for qid, ast, _ in parsed:
        pred_sql = (
            f"CASE WHEN query_id = {sql_str(qid)} THEN "
            f"({ast_to_spark_sql(ast)}) ELSE ({pred_sql}) END"
        )
    spark_s = postings.sparkSession
    if need_fields:
        # attr-clause queries join candidate rows against the attrs
        # projection before the predicate — the rare path keeps ops
        g = spark_s.sql(g_sql, postings=postings, qt=query_terms)
        g = g.join(attrs.selectExpr("doc_id", *need_fields), "doc_id", "left")
        admissible = g.where(pred_sql).selectExpr("query_id", "doc_id", "score")
    else:
        # hot path: scoring agg + predicate + projection in the SAME
        # statement — one plan analysis end to end
        admissible = spark_s.sql(
            "SELECT query_id, doc_id, score FROM "
            f"({g_sql}) WHERE {sql_esc(pred_sql)}",
            postings=postings,
            qt=query_terms,
        )
    if doc_filter is not None:
        # Solr fq semantics: restrict candidates AFTER scoring — the
        # filter never changes idf/avgdl. Semi-join on candidate rows
        # (query_id, doc_id, score), never postings.
        admissible = admissible.join(doc_filter.select("doc_id"), "doc_id", "semi")
    return admissible


def parse_filter_query(fq: str) -> Ast:
    """Parse a Solr ``fq`` string: attribute clauses (eq/range) and
    boolean operators ONLY — fq restricts by metadata; fulltext terms
    belong in ``q`` (a postings-side filter would need the index, not
    the doc store). Unlike ``q``, a pure-attribute expression is the
    NORMAL case here, so the answerability check does not apply."""
    toks = _lex(fq)
    # reuse the main parser by temporarily treating the string as a
    # query, but skip the postings-answerability validation
    ast = _parse_tokens(toks, fq)
    bad = sorted(ast_terms(ast))
    if bad:
        raise QueryParseError(
            f"fq {fq!r} contains fulltext terms {bad} — fq is "
            "metadata-only (field:value / field:[lo TO hi]); put terms in q"
        )
    return ast


def fq_filter(doc_store: DataFrame, fq: str, id_col: str = "doc_id") -> DataFrame:
    """``fq`` string → one-column (doc_id) admissible-docs frame, the
    shape every *_topk doc_filter parameter takes. Evaluates the
    attribute predicate as pure Catalyst over the doc store — at scale
    this is the metadata-table scan Solr's filterCache fronts."""
    ast = parse_filter_query(fq)
    pred = ast_predicate(ast, F.array().cast("array<string>"))
    return doc_store.filter(pred).select(F.col(id_col).alias("doc_id"))


def _flat_plain_terms(ast: Ast, op: str) -> list[str] | None:
    """Terms of a flat pure-positive boolean (``a OR b OR c`` /
    ``a AND b``) with no boosts, NOT, or attribute clauses — the shapes
    the pruned WAND/AND paths answer exactly. None otherwise."""

    def plain(a: Ast) -> bool:
        return a[0] == "term" and len(a) == 2

    if plain(ast):
        return [ast[1]]
    if ast[0] == op and all(plain(c) for c in ast[1]):
        return [c[1] for c in ast[1]]
    return None


def boolean_topk(
    spark: SparkSession,
    blocks: DataFrame,
    doclens: DataFrame,
    dictionary: DataFrame,
    stats: DataFrame,
    queries: list[tuple[str, str, int]],
    doc_filter: DataFrame | None = None,
    attrs: DataFrame | None = None,
    analyzer: str | None = None,
    shard_span: int | None = None,
    prune: bool = True,
    synonyms: dict[str, list[str]] | None = None,
    default_op: str = "OR",
) -> DataFrame:
    """Top-k for a batch of boolean query strings.

    Hits-only pruned execution (round-3 VERDICT "What's wrong" #2):
    queries whose AST is a flat pure-positive disjunction route to
    block-max WAND and flat conjunctions to the skipping AND path —
    both rank-identical to full-decode scoring (same idf, same
    term-ascending float64 summation) but skipping blocks a plain
    ``q="a OR b"`` page-of-10 on hot terms would otherwise decode in
    full. Everything else (NOT, attribute clauses, boosts, mixed
    nesting) keeps the full matching-set path, which those semantics
    genuinely need. ``shard_span`` (the build's doc-range width) lets
    the OR route stay pruned under ``doc_filter``; without it a
    filtered OR falls back to the full path. ``prune=False`` forces the
    full path for every query (the cross-check used in tests).

    When the batch routes to MORE THAN ONE sub-engine, all of them read
    from ONE shared term-pruned block scan (``term IN (every routed
    query's terms)``, localCheckpointed): round-4 VERDICT "What's
    wrong" #1 — the three sub-paths each re-scanned the blocks parquet,
    and at page-of-10 scale the tripled scan dominated. The checkpoint
    holds only the query terms' blocks (query-sized, not index-sized),
    so it is the right shape at 10^12 docs too. Fuzzy nodes across the
    whole batch expand in one dictionary pass (expand_fuzzy_asts)."""
    from spcht_spark.index.wand import and_topk, wand_topk

    asts = expand_fuzzy_asts(
        [expand_synonyms_ast(
            parse_query(qs, analyzer, default_op=default_op), synonyms or {})
         for _, qs, _ in queries],
        dictionary,
    )
    ors: list[tuple[str, list[str], int]] = []
    ands: list[tuple[str, list[str], int]] = []
    full: list[tuple[str, Ast, int]] = []
    for (qid, _qs, k), ast in zip(queries, asts):
        if prune:
            ts = _flat_plain_terms(ast, "or")
            if ts is not None and (doc_filter is None or shard_span is not None):
                ors.append((qid, ts, k))
                continue
            ts = _flat_plain_terms(ast, "and")
            if ts is not None:
                ands.append((qid, ts, k))
                continue
        full.append((qid, ast, k))

    terms = sorted(
        {t for _, ts, _ in ors for t in ts}
        | {t for _, ts, _ in ands for t in ts}
        | {t for _, ast, _ in full for t in ast_terms(ast)}
    )
    if sum(1 for route in (ors, ands, full) if route) > 1:
        # one pruned scan, shared by every sub-engine (their own
        # term-IN filters become in-memory subsetting of this frame)
        # lazy: the eager variant is its own driver barrier; the first
        # sub-engine stage that reads the scan materializes it and the
        # others read the persisted blocks (BlockManager locks per
        # block, so concurrent AQE stages of the one final action never
        # compute a partition twice)
        blocks = blocks.where(f"term IN ({sql_in(terms)})").localCheckpoint(
            eager=False
        )

    # ONE driver job for stats + dictionary idfs for the whole batch;
    # the sub-engines subset the map instead of re-collecting (round-4
    # regression: their serial driver jobs, not scoring, dominated;
    # round-6: the two remaining collects fused into one job)
    stats_row, idfs = stats_and_idfs(dictionary, stats, terms)

    parts: list[DataFrame] = []
    if ors:
        parts.append(
            wand_topk(
                spark, blocks, dictionary, stats, ors,
                doc_filter=doc_filter, shard_span=shard_span,
                stats_row=stats_row, idfs=idfs,
            )
        )
    if ands:
        parts.append(
            and_topk(
                spark, blocks, dictionary, stats, ands,
                doc_filter=doc_filter, stats_row=stats_row, idfs=idfs,
            )
        )
    if full:
        matches = boolean_matches_ast(
            spark, blocks, dictionary, stats, full,
            doc_filter=doc_filter, attrs=attrs,
            stats_row=stats_row, idfs=idfs,
        )
        parts.append(
            topk(matches, {qid: k for qid, _, k in full},
                 n_docs=int(stats_row["n_docs"]))
        )
    if not parts:
        from spcht_spark.index.query import TOPK_SCHEMA

        return spark.createDataFrame([], schema=TOPK_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)  # ranks are per-query — plain union
    return out
