"""Block-max WAND must be rank- AND score-identical to the exact path
(WAND is rank-safe for top-k; SURVEY.md §7 step 6)."""

from __future__ import annotations

import pytest

from spcht_spark.corpus import REFERENCE_QUERIES
from spcht_spark.index.query import exact_topk
from spcht_spark.index.wand import wand_topk
from spcht_spark.oracle import Bm25Oracle


def _as_map(pdf):
    return {
        qid: [(int(r.doc_id), float(r.score)) for r in grp.sort_values("rank").itertuples()]
        for qid, grp in pdf.groupby("query_id")
    }


def test_wand_matches_exact(spark, small_index):
    exact = _as_map(
        exact_topk(
            spark, small_index.blocks, small_index.doclens, small_index.dictionary, small_index.stats,
            REFERENCE_QUERIES,
        ).toPandas()
    )
    wand = _as_map(
        wand_topk(spark, small_index.blocks, small_index.dictionary, small_index.stats, REFERENCE_QUERIES).toPandas()
    )
    assert set(exact.keys()) == set(wand.keys())
    for qid in exact:
        assert [d for d, _ in exact[qid]] == [d for d, _ in wand[qid]], f"{qid} ranks"
        for (d, s1), (_, s2) in zip(exact[qid], wand[qid]):
            assert s1 == s2, f"{qid} doc {d}: {s1} != {s2} (must be bit-identical)"


def test_wand_matches_oracle(spark, small_index, small_corpus_pd):
    oracle = Bm25Oracle(small_corpus_pd)
    wand = _as_map(
        wand_topk(spark, small_index.blocks, small_index.dictionary, small_index.stats, REFERENCE_QUERIES).toPandas()
    )
    for qid, terms, k in REFERENCE_QUERIES:
        want = oracle.query(terms, k)
        have = wand.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], f"{qid} ranks vs oracle"
        for (d1, s1), (_d2, s2) in zip(have, want):
            assert s1 == pytest.approx(s2, abs=1e-9), f"{qid} doc {d1}"


def test_and_topk_matches_exact_and_oracle(spark, small_index, small_corpus_pd):
    """Conjunctive block-skipping path: rank- and score-identical to
    exact_topk(mode='and') and the pure-Python oracle (MUST semantics:
    a doc needs every term; an index-absent term empties the query)."""
    from spcht_spark.index.wand import and_topk

    multi = [q for q in REFERENCE_QUERIES if len(q[1]) >= 2]
    multi.append(("q_absent_and", ["return", "zzz_none"], 5))
    oracle = Bm25Oracle(small_corpus_pd)
    got = _as_map(
        and_topk(
            spark, small_index.blocks, small_index.dictionary, small_index.stats, multi
        ).toPandas()
    )
    exact = _as_map(
        exact_topk(
            spark, small_index.blocks, small_index.doclens, small_index.dictionary,
            small_index.stats, multi, mode="and",
        ).toPandas()
    )
    assert "q_absent_and" not in got
    assert set(got.keys()) == set(exact.keys())
    for qid, terms, k in multi:
        want = oracle.query(terms, k, mode="and")
        have = got.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], f"{qid} ranks vs oracle"
        for (d1, s1), (_d2, s2) in zip(have, want):
            assert s1 == pytest.approx(s2, abs=1e-9), f"{qid} doc {d1}"
        for (d1, s1), (d2, s2) in zip(have, exact.get(qid, [])):
            assert d1 == d2 and s1 == s2, f"{qid}: and_topk vs exact mode=and"


def test_wand_absent_terms(spark, small_index):
    out = wand_topk(
        spark, small_index.blocks, small_index.dictionary, small_index.stats, [("qa", ["zzz_none"], 5)]
    )
    assert out.count() == 0


def test_filtered_wand_matches_filtered_exact(spark, small_index):
    """Filtered retrieval (Solr fq parity): WAND with a doc_filter must
    be rank- and score-identical to exact_topk with the same filter —
    proving the in-loop mask keeps block-max pruning rank-safe when θ
    may only reflect admissible docs. Filter: doc_id % 3 == 0 (dense)
    and doc_id in a tiny explicit set (sparse shards / empty shards)."""
    from pyspark.sql import functions as F

    ids = spark.range(400).select(F.col("id").alias("doc_id"))
    for flt in [
        ids.filter(F.col("doc_id") % 3 == 0),
        ids.filter(F.col("doc_id").isin(5, 6, 7, 137, 290)),
    ]:
        exact = _as_map(
            exact_topk(
                spark, small_index.blocks, small_index.doclens,
                small_index.dictionary, small_index.stats,
                REFERENCE_QUERIES, doc_filter=flt,
            ).toPandas()
        )
        wand = _as_map(
            wand_topk(
                spark, small_index.blocks, small_index.dictionary,
                small_index.stats, REFERENCE_QUERIES,
                doc_filter=flt, shard_span=64,
            ).toPandas()
        )
        assert set(exact.keys()) == set(wand.keys())
        for qid in exact:
            assert [d for d, _ in exact[qid]] == [d for d, _ in wand[qid]], f"{qid} ranks"
            for (d, s1), (_, s2) in zip(exact[qid], wand[qid]):
                assert s1 == s2, f"{qid} doc {d}: filtered scores must be bit-identical"


def test_filtered_wand_only_admissible_docs(spark, small_index):
    """Every returned doc satisfies the filter; scoring stays corpus-wide
    (fq semantics): a doc's score under the filter equals its unfiltered
    score."""
    from pyspark.sql import functions as F

    flt = spark.range(400).select(F.col("id").alias("doc_id")).filter(
        F.col("doc_id") % 3 == 0
    )
    out = wand_topk(
        spark, small_index.blocks, small_index.dictionary, small_index.stats,
        REFERENCE_QUERIES, doc_filter=flt, shard_span=64,
    ).toPandas()
    assert len(out) and (out["doc_id"] % 3 == 0).all()
    unfiltered = wand_topk(
        spark, small_index.blocks, small_index.dictionary, small_index.stats,
        [("q14_hot4", ["{", "return", "if", "="], 10)],
    ).toPandas()
    merged = out[out.query_id == "q14_hot4"].merge(
        unfiltered, on="doc_id", suffixes=("_f", "_u")
    )
    assert len(merged) and (merged["score_f"] == merged["score_u"]).all()


def test_theta_cascade_rank_identical(spark, small_index, monkeypatch):
    """The θ-cascade is size-gated (it only pays past _CASCADE_MIN_BLOCKS);
    force it on a small index and pin rank identity vs the single-phase
    path — the cascade must never change results, only skip decodes."""
    import spcht_spark.index.wand as wand_mod

    qs = [(qid, terms, 10) for qid, terms, _ in REFERENCE_QUERIES[:3]]
    plain = wand_topk(
        spark, small_index.blocks, small_index.dictionary,
        small_index.stats, qs, theta_cascade=False,
    ).collect()
    monkeypatch.setattr(wand_mod, "_CASCADE_MIN_BLOCKS", 0)
    forced = wand_topk(
        spark, small_index.blocks, small_index.dictionary,
        small_index.stats, qs, theta_cascade=True,
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(plain, key=key) == sorted(forced, key=key)
    assert plain  # non-vacuous
