"""Rank-identity gate: engine top-k vs pure-Python oracle
(BASELINE.md "Top-k BM25 correctness": ranks exact, scores bit-close)."""

from __future__ import annotations

import pytest

from spcht_spark.corpus import REFERENCE_QUERIES
from spcht_spark.index.query import exact_topk
from spcht_spark.oracle import Bm25Oracle


@pytest.fixture(scope="module")
def oracle(small_corpus_pd):
    return Bm25Oracle(small_corpus_pd)


def _compare(got_pdf, oracle, queries):
    got = {
        qid: [(int(r.doc_id), float(r.score)) for r in grp.sort_values("rank").itertuples()]
        for qid, grp in got_pdf.groupby("query_id")
    }
    for qid, terms, k in queries:
        want = oracle.query(terms, k)
        have = got.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], f"{qid}: doc ranks differ"
        for (d1, s1), (d2, s2) in zip(have, want):
            assert s1 == pytest.approx(s2, abs=1e-9), f"{qid} doc {d1}: {s1} != {s2}"


def test_exact_topk_rank_identity(spark, small_index, oracle):
    res = exact_topk(
        spark, small_index.blocks, small_index.doclens, small_index.dictionary,
        small_index.stats, REFERENCE_QUERIES
    ).toPandas()
    _compare(res, oracle, REFERENCE_QUERIES)


def test_stats_match_oracle(small_index, oracle):
    row = small_index.stats.collect()[0]
    assert int(row["n_docs"]) == oracle.n_docs
    assert float(row["avgdl"]) == oracle.avgdl
