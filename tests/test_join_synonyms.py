"""Solr join query parser ({!join from= to=}) and query-time synonym
expansion (SynonymGraphFilter) parity tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from spcht_spark.index.boolean import (
    boolean_topk,
    expand_synonyms_ast,
    parse_query,
)
from spcht_spark.index.join import join_docs


# ------------------------------------------------------------- {!join}

def test_join_docs_same_core(spark, small_corpus, small_corpus_pd):
    """{!join from=repo to=repo}lang:<L> — docs whose repo also contains
    a lang-L doc — vs a pandas recompute."""
    lang = small_corpus_pd["lang"].iloc[0]
    attrs = small_corpus.select("doc_id", "repo", "lang")
    got = {
        r["doc_id"]
        for r in join_docs(attrs, "repo", attrs, "repo", f"lang:{lang}").collect()
    }
    repos = set(
        small_corpus_pd.loc[small_corpus_pd["lang"] == lang, "repo"]
    )
    expected = {
        int(r.doc_id)
        for r in small_corpus_pd.itertuples()
        if r.repo in repos
    }
    assert got == expected


def test_join_docs_child_table(spark):
    """Cross-table join: child rows matching the fq project their from-
    values; main docs whose to-field hits one survive, exactly once."""
    child = spark.createDataFrame(
        [(1, "s1", "de"), (2, "s1", "de"), (3, "s2", "en"), (4, "s3", "de")],
        ["event_id", "src", "lang"],
    )
    docs = spark.createDataFrame(
        [(100, "s1"), (101, "s2"), (102, "s3"), (103, "s4")],
        ["doc_id", "source"],
    )
    got = sorted(
        r["doc_id"]
        for r in join_docs(child, "src", docs, "source", "lang:de").collect()
    )
    assert got == [100, 102]


def test_join_docs_boolean_fq(spark):
    child = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 50), (3, "c", 500)], ["k", "v", "n"]
    )
    docs = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["doc_id", "t"])
    got = sorted(
        r["doc_id"]
        for r in join_docs(
            child, "v", docs, "t", "n:[10 TO *] AND NOT n:[100 TO *]"
        ).collect()
    )
    assert got == [2]


# ------------------------------------------------------------ synonyms

def test_expand_synonyms_ast_shapes():
    syn = {"quick": ["fast", "rapid"]}
    assert expand_synonyms_ast(parse_query("quick"), syn) == (
        "or", [("term", "quick"), ("term", "fast"), ("term", "rapid")]
    )
    # boost propagates to every alternative
    assert expand_synonyms_ast(parse_query("quick^2"), syn) == (
        "or",
        [("term", "quick", 2.0), ("term", "fast", 2.0), ("term", "rapid", 2.0)],
    )
    # under NOT: -quick excludes docs containing any alternative
    assert expand_synonyms_ast(parse_query("a AND -quick"), syn) == (
        "and",
        [
            ("term", "a"),
            ("not", ("or", [("term", "quick"), ("term", "fast"),
                            ("term", "rapid")])),
        ],
    )
    # non-synonym terms and attr clauses untouched
    ast = parse_query("other AND lang:de")
    assert expand_synonyms_ast(ast, syn) == ast


def test_synonym_query_equals_rewritten_query(spark, small_index):
    """q='return' with return≡if must rank exactly like the hand-written
    'return OR if' — through BOTH the pruned (WAND) and full paths."""
    syn = {"return": ["if"]}
    for prune in (True, False):
        got = boolean_topk(
            spark, small_index.blocks, small_index.doclens,
            small_index.dictionary, small_index.stats,
            [("q", "return", 20)], synonyms=syn, prune=prune,
        )
        want = boolean_topk(
            spark, small_index.blocks, small_index.doclens,
            small_index.dictionary, small_index.stats,
            [("q", "return OR if", 20)], prune=prune,
        )
        g = [(r["rank"], r["doc_id"], round(r["score"], 9)) for r in got.collect()]
        w = [(r["rank"], r["doc_id"], round(r["score"], 9)) for r in want.collect()]
        assert sorted(g) == sorted(w) and g


def test_synonym_negated(spark, small_index):
    syn = {"return": ["if"]}
    got = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q", "def AND -return", 20)], synonyms=syn,
    )
    want = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q", "def AND NOT (return OR if)", 20)],
    )
    g = [(r["rank"], r["doc_id"], round(r["score"], 9)) for r in got.collect()]
    w = [(r["rank"], r["doc_id"], round(r["score"], 9)) for r in want.collect()]
    assert sorted(g) == sorted(w)
