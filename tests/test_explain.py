"""Score explanation + terms component vs the pure-Python oracle."""

from __future__ import annotations

from collections import Counter

from spcht_spark.index.explain import explain_scores, terms_component
from spcht_spark.index.query import exact_topk
from spcht_spark.oracle import idf as idf_py
from spcht_spark.oracle import term_score, tokenize_py


def test_explain_sums_to_engine_score(spark, small_corpus_pd, small_index):
    terms = ["return", "if", "while"]
    docs = [int(small_corpus_pd["doc_id"].iloc[i]) for i in (0, 5, 17)]
    rows = explain_scores(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        terms, docs, shard_span=64,
    ).collect()
    # per-row values match the oracle formula exactly
    toks = {
        int(r.doc_id): Counter(tokenize_py(r.content))
        for r in small_corpus_pd.itertuples()
    }
    dls = {d: sum(c.values()) for d, c in toks.items()}
    n = len(toks)
    avgdl = sum(dls.values()) / n
    dfs: Counter = Counter()
    for c in toks.values():
        dfs.update(c.keys())
    for r in rows:
        d, t = r["doc_id"], r["term"]
        assert r["tf"] == toks[d][t]
        assert r["dl"] == dls[d]
        assert r["df"] == dfs[t]
        assert abs(r["idf"] - idf_py(n, dfs[t])) < 1e-12
        assert abs(
            r["contrib"] - term_score(toks[d][t], dls[d], avgdl, idf_py(n, dfs[t]))
        ) < 1e-12
    # summed rows reproduce the engine's disjunctive score per doc
    got = exact_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q", terms, 10**6)],
    ).collect()
    engine = {r["doc_id"]: r["score"] for r in got}
    by_doc: dict[int, float] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["term"])):
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0.0) + r["contrib"]
    for d, s in by_doc.items():
        assert abs(engine[d] - s) < 1e-9, d


def test_terms_component_order_and_prefix(spark, small_corpus_pd, small_index):
    got = terms_component(small_index.dictionary, prefix="handler", limit=5).collect()
    dfs: Counter = Counter()
    cfs: Counter = Counter()
    for r in small_corpus_pd.itertuples():
        c = Counter(tokenize_py(r.content))
        dfs.update(c.keys())
        for t, n in c.items():
            cfs[t] += n
    want = sorted(
        ((t, dfs[t], cfs[t]) for t in dfs if t.startswith("handler")),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert [(r["term"], r["df"], r["cf"]) for r in sorted(got, key=lambda r: r["rank"])] == want
