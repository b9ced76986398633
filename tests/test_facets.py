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


def test_facet_limit_mincount_sort(spark, small_corpus_pd, small_corpus, small_index):
    """facet.limit/mincount/sort: top-N buckets per (query, facet)
    under both sort orders, identical to the pandas-ranked expectation
    (the salted two-stage window must not change results)."""
    exp_all = _expected(small_corpus_pd, QUERIES, ["lang", "repo"])
    attrs = small_corpus.select("doc_id", "lang", "repo")
    facets = {"lang": (F.col("lang"), ["lang"]), "repo": (F.col("repo"), ["repo"])}

    for sort in ("count", "index"):
        got = facet_counts(
            spark, small_index.blocks, QUERIES, attrs, facets,
            limit=2, mincount=2, sort=sort,
        ).collect()
        by_qf: dict[tuple, list] = {}
        for (qid, f, v), n in exp_all.items():
            if n >= 2:
                by_qf.setdefault((qid, f), []).append((v, n))
        exp_rows = set()
        for (qid, f), vs in by_qf.items():
            key = (lambda x: (-x[1], x[0])) if sort == "count" else (lambda x: x[0])
            for v, n in sorted(vs, key=key)[:2]:
                exp_rows.add((qid, f, v, n))
        assert {
            (r["query_id"], r["field"], r["value"], r["n"]) for r in got
        } == exp_rows, sort


def test_boosted_topk_null_attrs_neutral(spark, small_corpus, small_index):
    """Docs missing from the attrs table keep their raw BM25 score
    (boost→1, bf→0) and still rank — never dropped, never NULLed."""
    from spcht_spark.index.query import boosted_topk, exact_topk

    queries = [("q", ["return", "import"], 400)]
    empty_attrs = small_corpus.filter(F.lit(False)).select(
        "doc_id", F.length("content").cast("long").alias("n_chars")
    )
    got = boosted_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats, queries, empty_attrs,
        boost=(F.col("n_chars") / F.lit(100.0), ["n_chars"]),
        bf=(F.log(F.col("n_chars").cast("double")), ["n_chars"]),
    ).orderBy("rank").collect()
    plain = exact_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats, queries,
    ).orderBy("rank").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in plain
    ]
