"""Multi-field boosted search vs a pure-Python per-field BM25 oracle."""

from __future__ import annotations

from collections import Counter

from spcht_spark.index.fielded import build_fielded_index, fielded_topk
from spcht_spark.oracle import idf as idf_py
from spcht_spark.oracle import term_score, tokenize_py

BOOSTS = {"content": 1.0, "lang": 3.0}
K = 12


def _py_fielded(pdf, queries, boosts, k):
    field_toks = {
        f: {int(r.doc_id): Counter(tokenize_py(str(getattr(r, f)))) for r in pdf.itertuples()}
        for f in boosts
    }
    out = {}
    stats = {}
    for f, toks in field_toks.items():
        dls = {d: sum(c.values()) for d, c in toks.items()}
        n = len(toks)
        avgdl = sum(dls.values()) / n
        dfs: Counter = Counter()
        for c in toks.values():
            dfs.update(c.keys())
        stats[f] = (dls, n, avgdl, dfs)
    for qid, terms, _ in queries:
        scores: dict[int, float] = {}
        for f in sorted(boosts):
            dls, n, avgdl, dfs = stats[f]
            toks = field_toks[f]
            for d, c in toks.items():
                present = sorted(t for t in set(terms) if t in c)
                if not present:
                    continue
                s = sum(
                    term_score(c[t], dls[d], avgdl, idf_py(n, dfs[t]))
                    for t in present
                )
                scores[d] = scores.get(d, 0.0) + boosts[f] * s
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        out[qid] = ranked[:k]
    return out


def test_fielded_topk_matches_python(spark, small_corpus_pd, small_corpus):
    queries = [
        ("fq_lang", ["return", small_corpus_pd["lang"].iloc[0]], K),
        ("fq_content", ["while", "import"], K),
    ]
    indexes = build_fielded_index(
        spark, small_corpus, ["content", "lang"], tokenizer="arrow", shard_span=64
    )
    got = fielded_topk(spark, indexes, BOOSTS, queries).collect()
    by_q: dict[str, list] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    exp = _py_fielded(small_corpus_pd, queries, BOOSTS, K)
    for qid, want in exp.items():
        have = by_q.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], qid
        for (_, a), (_, b) in zip(have, want):
            assert abs(a - b) < 1e-9, qid


def test_dismax_tie_matches_python(spark, small_corpus_pd, small_corpus):
    """tie<1: score = max_f + tie·(sum_f − max_f) per doc; tie=0 is
    pure best-field. Python oracle recomputes both from per-field
    scores."""
    tie = 0.3
    queries = [("dq", ["return", small_corpus_pd["lang"].iloc[0]], K)]
    indexes = build_fielded_index(
        spark, small_corpus, ["content", "lang"], tokenizer="arrow", shard_span=64
    )

    def py_dismax(t):
        per_field: dict[int, list[float]] = {}
        for f in sorted(BOOSTS):
            for qid, ws in _py_fielded(
                small_corpus_pd, queries, {f: BOOSTS[f]}, 10_000
            ).items():
                for d, w in ws:
                    per_field.setdefault(d, []).append(w)
        scores = {
            d: max(ws) + t * (sum(ws) - max(ws)) for d, ws in per_field.items()
        }
        return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:K]

    for t in (tie, 0.0):
        got = (
            fielded_topk(spark, indexes, BOOSTS, queries, tie=t)
            .orderBy("rank").collect()
        )
        want = py_dismax(t)
        assert [r["doc_id"] for r in got] == [d for d, _ in want], t
        for r, (_, w) in zip(got, want):
            assert abs(r["score"] - w) < 1e-9, t


def test_boost_changes_ranking(spark, small_corpus, small_corpus_pd):
    """With a large lang boost, docs in the queried language dominate."""
    lang = small_corpus_pd["lang"].iloc[0]
    queries = [("bq", ["return", lang], 10)]
    indexes = build_fielded_index(
        spark, small_corpus, ["content", "lang"], tokenizer="arrow", shard_span=64
    )
    heavy = fielded_topk(spark, indexes, {"content": 1.0, "lang": 50.0}, queries).collect()
    langs = dict(
        (int(r.doc_id), r.lang) for r in small_corpus_pd.itertuples()
    )
    assert all(langs[r["doc_id"]] == lang for r in heavy)
