"""Facet counts (Solr facet.field / facet.range parity) vs a pure-Python
oracle over the same corpus."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from spcht_spark.index.facets import facet_counts, matching_docs
from spcht_spark.oracle import tokenize_py

QUERIES = [
    ("fq_hot", ["return", "if"]),
    ("fq_tail", ["handler7"]),
    ("fq_missing", ["zz_no_such_term"]),
]


def _token_sets(pdf):
    return {int(r.doc_id): set(tokenize_py(r.content)) for r in pdf.itertuples()}


def _expected(pdf, queries, fields, allowed=None):
    toks = _token_sets(pdf)
    attrs = {int(r.doc_id): r for r in pdf.itertuples()}
    out = Counter()
    for qid, terms in queries:
        ts = set(terms)
        for doc, s in toks.items():
            if not (s & ts):
                continue
            if allowed is not None and doc not in allowed:
                continue
            for f in fields:
                out[(qid, f, str(getattr(attrs[doc], f)))] += 1
    return out


def test_matching_docs_distinct(spark, small_corpus_pd, small_index):
    """A doc containing BOTH query terms appears exactly once."""
    m = matching_docs(spark, small_index.blocks, [("q", ["return", "if"])])
    rows = m.collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    toks = _token_sets(small_corpus_pd)
    expected = {d for d, s in toks.items() if s & {"return", "if"}}
    assert set(ids) == expected


def test_facet_counts_match_python(spark, small_corpus_pd, small_corpus, small_index):
    got = facet_counts(
        spark,
        small_index.blocks,
        QUERIES,
        small_corpus.select("doc_id", "lang", "repo"),
        {"lang": F.col("lang"), "repo": F.col("repo")},
    ).collect()
    got_c = Counter()
    for r in got:
        got_c[(r["query_id"], r["field"], r["value"])] = r["n"]
    assert got_c == _expected(small_corpus_pd, QUERIES, ["lang", "repo"])
    # the term absent from the corpus contributes no rows at all
    assert not [r for r in got if r["query_id"] == "fq_missing"]


def test_facet_counts_with_doc_filter(spark, small_corpus_pd, small_corpus, small_index):
    """fq parity: the filter restricts the countable docs."""
    keep_lang = small_corpus_pd["lang"].iloc[0]
    allowed = {
        int(r.doc_id) for r in small_corpus_pd.itertuples() if r.lang == keep_lang
    }
    doc_filter = small_corpus.filter(F.col("lang") == keep_lang).select("doc_id")
    got = facet_counts(
        spark,
        small_index.blocks,
        QUERIES[:1],
        small_corpus.select("doc_id", "lang"),
        {"lang": F.col("lang")},
        doc_filter=doc_filter,
    ).collect()
    got_c = Counter()
    for r in got:
        got_c[(r["query_id"], r["field"], r["value"])] = r["n"]
    assert got_c == _expected(small_corpus_pd, QUERIES[:1], ["lang"], allowed=allowed)


def test_range_facet_bucket_expr(spark, small_corpus, small_corpus_pd, small_index):
    """facet.range ≙ a bucket Column: floor(len(content)/500)*500."""
    attrs = small_corpus.select(
        "doc_id", F.length("content").alias("n_chars")
    )
    got = facet_counts(
        spark,
        small_index.blocks,
        QUERIES[:1],
        attrs,
        {"b500": (F.floor(F.col("n_chars") / F.lit(500)) * 500).cast("long")},
    ).collect()
    toks = _token_sets(small_corpus_pd)
    exp = Counter()
    for r in small_corpus_pd.itertuples():
        if toks[int(r.doc_id)] & {"return", "if"}:
            exp[("fq_hot", "b500", str(len(r.content) // 500 * 500))] += 1
    got_c = Counter()
    for r in got:
        got_c[(r["query_id"], r["field"], r["value"])] = r["n"]
    assert got_c == exp
