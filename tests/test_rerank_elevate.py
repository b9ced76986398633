"""ReRankQParser and QueryElevationComponent semantics (Solr result
post-processors) on literal ranked frames plus one end-to-end pass over
the shared index."""

from __future__ import annotations

from pyspark.sql import functions as F

from spcht_spark.index.rerank import elevate_hits, rerank_topk

MAIN = [
    # query_id, rank, doc_id, score
    ("q1", 1, 10, 9.0),
    ("q1", 2, 11, 8.0),
    ("q1", 3, 12, 7.0),
    ("q1", 4, 13, 6.0),   # beyond rerank_docs=3
    ("q1", 5, 14, 5.0),
    ("q2", 1, 20, 3.0),
    ("q2", 2, 21, 2.0),
]
RERANK = [
    # query_id, doc_id, score — doc 12 gets a big rerank boost; doc 13
    # matches the rerank query too but sits beyond reRankDocs, so its
    # score must NOT change; doc 10 has no rerank match.
    ("q1", 11, 1.0),
    ("q1", 12, 5.0),
    ("q1", 13, 100.0),
    ("q2", 21, 0.25),
]


def _frames(spark):
    main = spark.createDataFrame(MAIN, ["query_id", "rank", "doc_id", "score"])
    rr = spark.createDataFrame(RERANK, ["query_id", "doc_id", "score"])
    return main, rr


def test_rerank_reorders_top_n_only(spark):
    main, rr = _frames(spark)
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in rerank_topk(main, rr, rerank_docs=3, weight=2.0).collect()
    }
    # q1 combined: 10 → 9.0, 11 → 8+2 = 10.0, 12 → 7+10 = 17.0
    # re-ranked section order: 12, 11, 10; tail keeps 13 (6.0!), 14
    assert got[("q1", 1)] == (12, 17.0)
    assert got[("q1", 2)] == (11, 10.0)
    assert got[("q1", 3)] == (10, 9.0)
    assert got[("q1", 4)] == (13, 6.0)  # untouched beyond reRankDocs
    assert got[("q1", 5)] == (14, 5.0)
    # q2: 20 → 3.0, 21 → 2+0.5 = 2.5 — order unchanged
    assert got[("q2", 1)] == (20, 3.0)
    assert got[("q2", 2)] == (21, 2.5)


def test_rerank_k_trims_after_reorder(spark):
    main, rr = _frames(spark)
    got = rerank_topk(main, rr, rerank_docs=3, weight=2.0, k=2).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    assert sorted(per_q["q1"]) == [(1, 12), (2, 11)]
    assert sorted(per_q["q2"]) == [(1, 20), (2, 21)]


def test_rerank_tie_breaks_on_doc_id(spark):
    main = spark.createDataFrame(
        [("q", 1, 5, 2.0), ("q", 2, 3, 2.0)],
        ["query_id", "rank", "doc_id", "score"],
    )
    rr = spark.createDataFrame([], "query_id string, doc_id long, score double")
    got = [
        r["doc_id"]
        for r in rerank_topk(main, rr, rerank_docs=10)
        .orderBy("rank")
        .collect()
    ]
    assert got == [3, 5]  # equal combined scores → doc_id asc


def test_elevate_pins_and_excludes(spark):
    hits = spark.createDataFrame(MAIN, ["query_id", "rank", "doc_id", "score"])
    got = elevate_hits(
        spark,
        hits,
        elevations={"q1": [13, 11]},   # configured order wins over score
        exclusions={"q1": [10], "q2": [20]},
    ).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    assert sorted(per_q["q1"]) == [
        (1, 13, 6.0),   # elevated, keeps its real score
        (2, 11, 8.0),
        (3, 12, 7.0),   # remaining docs follow by original rank
        (4, 14, 5.0),   # doc 10 excluded
    ]
    assert sorted(per_q["q2"]) == [(1, 21, 2.0)]


def test_elevate_only_matched_docs_move(spark):
    """forceElevation=false: an elevated id absent from the page is not
    inserted."""
    hits = spark.createDataFrame(
        [("q", 1, 1, 3.0), ("q", 2, 2, 2.0)],
        ["query_id", "rank", "doc_id", "score"],
    )
    got = elevate_hits(spark, hits, elevations={"q": [999, 2]}).collect()
    assert [(r["rank"], r["doc_id"]) for r in sorted(got, key=lambda r: r["rank"])] \
        == [(1, 2), (2, 1)]


def test_facade_rerank_elevate_synonyms(spark, small_corpus, small_index):
    """One request carrying rq + elevation + synonyms equals composing
    the standalone operators by hand."""
    from spcht_spark.index.boolean import boolean_matches, boolean_topk
    from spcht_spark.index.search import SearchRequest, search

    syn = {"return": ["if"]}
    resp = search(
        spark, small_index, small_corpus.select("doc_id", "content", "lang"),
        SearchRequest(
            q="return", k=8, synonyms=syn,
            rerank=("def", 15, 2.0),
        ),
        content_col="content",
    )
    got = [
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in resp.hits.orderBy("rank").collect()
    ]

    main = boolean_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q0", "return OR if", 15)],
    )
    rr = boolean_matches(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q0", "def", 1)],
        doc_filter=main.filter(F.col("rank") <= 15).select("doc_id"),
    ).select("query_id", "doc_id", "score")
    want = [
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in rerank_topk(main, rr, 15, 2.0, k=8).orderBy("rank").collect()
    ]
    assert got == want and len(got) == 8

    # elevation on top: pin the current rank-3 doc, drop the rank-1 doc
    pin = got[2][1]
    drop = got[0][1]
    resp2 = search(
        spark, small_index, small_corpus.select("doc_id", "content", "lang"),
        SearchRequest(
            q="return", k=8, synonyms=syn, rerank=("def", 15, 2.0),
            elevate_ids=[pin], exclude_ids=[drop],
        ),
        content_col="content",
    )
    got2 = [
        (r["rank"], r["doc_id"]) for r in resp2.hits.orderBy("rank").collect()
    ]
    assert got2[0] == (1, pin)
    assert drop not in {d for _, d in got2}
    assert len(got2) == 8  # the exclusion backfills from the overfetch


def test_rerank_end_to_end_index(spark, small_index):
    """Main query re-ranked by a second query over the real index equals
    a driver-side recompute from the two collected frames."""
    from spcht_spark.index.wand import wand_topk

    main = wand_topk(
        spark, small_index.blocks, small_index.dictionary, small_index.stats,
        [("q", ["return", "if"], 30)],
    )
    rr = wand_topk(
        spark, small_index.blocks, small_index.dictionary, small_index.stats,
        [("q", ["def"], 10_000)],
    ).select("query_id", "doc_id", "score")

    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in rerank_topk(main, rr, rerank_docs=10, weight=3.0)
        .orderBy("rank")
        .collect()
    ]

    m = sorted(
        [(r["rank"], r["doc_id"], r["score"]) for r in main.collect()]
    )
    rscores = {r["doc_id"]: r["score"] for r in rr.collect()}
    top = [
        (d, s + 3.0 * rscores.get(d, 0.0)) for rk, d, s in m if rk <= 10
    ]
    top.sort(key=lambda x: (-round(x[1], 6), x[0]))
    tail = [(d, s) for rk, d, s in m if rk > 10]
    expected = [(d, round(s, 6)) for d, s in top + tail]
    assert got == expected
