"""Round-4 request-surface additions: function queries (parse + three
backends), function sort, term vectors, spellcheck.collate, block-join
parent queries, stats.facet buckets, and the /export handler — each
pinned against an independent pandas / DuckDB / index-tokens oracle."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spcht_spark.index.funcquery import (
    FuncParseError,
    compile_func,
    func_fields,
    func_sql,
    function_sort_topk,
    parse_func,
)


# ------------------------------------------------------- function queries

def test_parse_fields_and_errors():
    node = parse_func("sum(div(n_chars,100), product(a, b, 2), ln(a))")
    assert func_fields(node) == ["a", "b", "n_chars"]
    for bad in ["frob(a)", "div(a)", "sum()", "a b", "log(a,b)", "div(a,b))"]:
        with pytest.raises(FuncParseError):
            parse_func(bad)


def test_func_column_matches_duckdb_sql(spark):
    pdf = pd.DataFrame({"a": [1.0, 4.0, 9.0, 2.5], "b": [2.0, 0.5, 3.0, 8.0]})
    exprs = [
        "sum(a, b, 1)",
        "div(sub(a, b), 2)",
        "product(a, b)",
        "max(a, b, 3)",
        "min(a, b)",
        "pow(a, 2)",
        "log(a)",
        "ln(b)",
        "sqrt(a)",
        "abs(sub(b, a))",
        "mul(a, 0.5)",
    ]
    sdf = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t", pdf)
    for src in exprs:
        node = parse_func(src)
        col, _ = compile_func(src)
        got = [r[0] for r in sdf.select(F.round(col, 6)).collect()]
        want = [
            r[0]
            for r in con.execute(
                f"SELECT round({func_sql(node)}, 6) FROM t"
            ).fetchall()
        ]
        assert got == pytest.approx(want), src


def test_function_sort_topk_vs_pandas(spark, small_index, small_corpus):
    attrs = small_corpus.select(
        "doc_id", F.length("content").alias("n_chars")
    )
    queries = [("fs_ret", ["return", "import"]), ("fs_def", ["def"])]
    out = function_sort_topk(
        spark, small_index.blocks, queries, attrs,
        "div(n_chars, 10)", k=7, descending=True,
    ).toPandas()

    from spcht_spark.index.facets import matching_docs

    match = matching_docs(spark, small_index.blocks, queries).toPandas()
    attrs_pd = attrs.toPandas()
    exp = match.merge(attrs_pd, on="doc_id")
    exp["sort_v"] = (exp["n_chars"] / 10).round(6)
    exp = exp.sort_values(
        ["query_id", "sort_v", "doc_id"], ascending=[True, False, True]
    )
    exp["rank"] = exp.groupby("query_id").cumcount() + 1
    exp = exp[exp["rank"] <= 7]
    got = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = exp[["query_id", "rank", "doc_id"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "doc_id"]], want, check_dtype=False
    )
    assert (got["sort_v"] == exp["sort_v"].round(4).values).all()


# ----------------------------------------------------------- term vectors

def test_term_vectors_match_index_tokens(spark, small_index, small_corpus):
    from spcht_spark.index.vectors import term_vectors

    ids = [3, 17, 42]
    tv = term_vectors(
        spark, small_corpus, small_index.dictionary, ids, tokenizer="arrow"
    ).toPandas()
    # tf must equal the index's own tokens stage for those docs; df the
    # dictionary's — and every term of the doc must be present.
    toks = (
        small_index.tokens.filter(F.col("doc_id").isin(ids))
        .select("doc_id", "term", "tf")
        .toPandas()
    )
    merged = toks.merge(
        tv, on=["doc_id", "term"], how="outer", suffixes=("_tok", "_tv")
    )
    assert not merged.isna().any().any(), "tv and tokens disagree on terms"
    assert (merged["tf_tok"] == merged["tf_tv"]).all()
    dic = small_index.dictionary.toPandas().set_index("term")["df"]
    assert (tv["df"].values == dic.loc[tv["term"]].values).all()
    assert tv["tf_idf"].equals(tv["tf"] / tv["df"])


# ------------------------------------------------------ spellcheck.collate

def test_spellcheck_collate(spark, small_index):
    from spcht_spark.index.suggest import spellcheck_collate

    dic = small_index.dictionary.toPandas()
    have = set(dic["term"])
    # pick a real term and misspell it by one edit
    real = "return" if "return" in have else sorted(have)[0]
    typo = real[:-1] + ("x" if real[-1] != "x" else "y")
    assert typo not in have
    queries = [
        ("c_ok", [real]),                 # nothing to correct
        ("c_fix", [typo]),                # corrected to a dictionary term
        ("c_none", ["zzzzqqqqzzzz"]),     # no suggestion in distance 2
    ]
    out = (
        spellcheck_collate(
            spark, small_index.dictionary, small_index.blocks, queries
        )
        .toPandas()
        .set_index("query_id")
    )
    assert out.loc["c_ok", "collation"] == real
    fixed = out.loc["c_fix", "collation"]
    assert fixed in have and fixed != typo
    # hits = conjunctive doc count of the collation, from the tokens table
    toks = small_index.tokens.select("doc_id", "term").toPandas()
    for qid in ["c_ok", "c_fix"]:
        terms = out.loc[qid, "collation"].split(" ")
        sets = [set(toks[toks["term"] == t]["doc_id"]) for t in terms]
        want = len(set.intersection(*sets)) if sets else 0
        assert out.loc[qid, "hits"] == want
    assert out.loc["c_none", "collation"] == "zzzzqqqqzzzz"
    assert out.loc["c_none", "hits"] == 0


# ------------------------------------------------- block-join parent query

def test_parent_topk_vs_pandas(spark, small_index, small_corpus):
    from spcht_spark.index.join import parent_topk
    from spcht_spark.index.query import exact_topk

    queries = [("p_ret", ["return", "import"]), ("p_def", ["def"])]
    qs = [(qid, ts, 10_000) for qid, ts in queries]
    scored = exact_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats, qs,
    ).select("query_id", "doc_id", "score")
    attrs = small_corpus.select("doc_id", "repo")
    out = parent_topk(scored, attrs, "repo", {qid: 4 for qid, _ in queries})
    got = out.toPandas().sort_values(["query_id", "rank"]).reset_index(
        drop=True
    )

    sp = scored.toPandas().merge(
        small_corpus.select("doc_id", "repo").toPandas(), on="doc_id"
    )
    sp["parent"] = sp["repo"].astype(str)
    agg = (
        sp.groupby(["query_id", "parent"])
        .agg(score=("score", "max"), n_children=("score", "size"))
        .reset_index()
    )
    agg["key6"] = agg["score"].round(6)
    agg = agg.sort_values(
        ["query_id", "key6", "parent"], ascending=[True, False, True]
    )
    agg["rank"] = agg.groupby("query_id").cumcount() + 1
    want = agg[agg["rank"] <= 4][
        ["query_id", "rank", "parent", "n_children"]
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "parent", "n_children"]], want,
        check_dtype=False,
    )


# ----------------------------------------------------------- stats.facet

def test_field_stats_bucketed(spark, small_index, small_corpus):
    from spcht_spark.index.facets import field_stats, matching_docs

    attrs = small_corpus.select(
        "doc_id", "lang", F.length("content").alias("n_chars")
    )
    queries = [("sb_ret", ["return"])]
    out = field_stats(
        spark, small_index.blocks, queries, attrs, "n_chars", by="lang"
    ).toPandas()
    match = matching_docs(spark, small_index.blocks, queries).toPandas()
    exp = match.merge(attrs.toPandas(), on="doc_id")
    exp["bucket"] = exp["lang"].astype(str)
    want = (
        exp.groupby(["query_id", "bucket"])["n_chars"]
        .agg(n="size", min_v="min", max_v="max", sum_v="sum", avg_v="mean")
        .reset_index()
    )
    got = out.sort_values(["query_id", "bucket"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "bucket"]).reset_index(drop=True)
    for c in ["n", "min_v", "max_v", "sum_v"]:
        assert (got[c].astype(int) == want[c].astype(int)).all(), c
    assert got["avg_v"].values == pytest.approx(want["avg_v"].values)


# --------------------------------------------------------------- /export

def test_export_matches_sorted_and_complete(spark, small_index, small_corpus):
    from spcht_spark.index.cursor import export_matches
    from spcht_spark.index.facets import matching_docs

    attrs = small_corpus.select(
        "doc_id", "lang", F.length("content").alias("n_chars")
    )
    queries = [("e_ret", ["return"]), ("e_imp", ["import"])]
    out = export_matches(
        spark, small_index.blocks, queries, attrs, "n_chars", fl=["lang"]
    ).toPandas()
    match = matching_docs(spark, small_index.blocks, queries).toPandas()
    # complete: exactly the matching docs, once each
    assert len(out) == len(match)
    assert (
        out.groupby("query_id")["doc_id"].apply(set).to_dict()
        == match.groupby("query_id")["doc_id"].apply(set).to_dict()
    )
    # sorted within each query by (sort asc, doc_id asc)
    for _, g in out.groupby("query_id"):
        keys = list(zip(g["sort_value"], g["doc_id"]))
        assert keys == sorted(keys)
    # fl columns come from the attrs row of that doc
    attrs_pd = attrs.toPandas().set_index("doc_id")
    assert (out["lang"].values == attrs_pd.loc[out["doc_id"], "lang"].values).all()


# ------------------------------------------- facade: new components

def test_facade_round4_components(spark, small_index, small_corpus):
    from spcht_spark.index.search import SearchRequest, search

    store = small_corpus.withColumn("n_chars", F.length("content"))
    resp = search(
        spark, small_index, store,
        SearchRequest(
            q="return AND import", k=5,
            sort=("div(n_chars, 10)", True),
            stats_field="n_chars", stats_facet="lang",
            tv=True, collate=True, parent_field="repo",
        ),
    )
    hits = resp.hits.toPandas()
    assert len(hits) <= 5 and (hits["rank"] == range(1, len(hits) + 1)).all()
    # sort order: n_chars/10 desc over the admissible set
    attrs = store.select("doc_id", "n_chars").toPandas().set_index("doc_id")
    sv = (attrs.loc[hits["doc_id"], "n_chars"] / 10).round(6).values
    assert list(sv) == sorted(sv, reverse=True)
    # stats.facet: one row per (query, lang bucket), n sums to match count
    stats = resp.stats.toPandas()
    assert "bucket" in stats.columns and stats["n"].sum() > 0
    # tv: only page docs, tf/df positive
    tv = resp.term_vectors.toPandas()
    assert set(tv["doc_id"]) <= set(hits["doc_id"])
    assert (tv["tf"] > 0).all() and (tv["df"] > 0).all()
    # collate: both terms exist in the dictionary → collation is the
    # ORIGINAL query string verbatim (operator-preserving, round 5);
    # hits == the conjunctive match count
    sc = resp.spellcheck.toPandas()
    assert sc.loc[0, "collation"] == "return AND import"
    # parents: grouped max-score roll-up of the same admissible set
    parents = resp.parents.toPandas()
    assert (parents["n_children"] > 0).all()
    assert parents["rank"].tolist() == list(range(1, len(parents) + 1))


# ------------------------------------------- multi-fragment highlighting

def test_highlight_fragments_vs_pandas(spark, small_index, small_corpus):
    from spcht_spark.index.highlight import highlight_fragments
    from spcht_spark.index.query import exact_topk

    queries = [("h_two", ["return", "import"]), ("h_one", ["def"])]
    qs = [(qid, ts, 6) for qid, ts in queries]
    hits = exact_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats, qs,
    )
    out = highlight_fragments(
        hits, small_corpus, queries, window=3, max_snippets=2
    ).toPandas()
    content = small_corpus.select("doc_id", "content").toPandas().set_index(
        "doc_id"
    )["content"]
    qmap = dict(queries)
    for _, row in out.iterrows():
        toks = content.loc[row["doc_id"]].split(" ")
        terms = sorted(set(qmap[row["query_id"]]))
        # expected anchors: first occurrence of each present term, by pos
        pos = sorted(
            toks.index(t) + 1 for t in terms if t in toks
        )[:2]
        want = []
        for p in pos:
            lo = max(1, p - 3)
            frag = toks[lo - 1: lo - 1 + 7]
            want.append(
                " ".join(
                    f"<em>{t}</em>" if t in terms else t for t in frag
                )
            )
        assert list(row["snippets"]) == want
    # every hit got a row (exact_topk docs contain >= 1 term)
    assert len(out) == hits.count()


def test_facade_hl_snippets(spark, small_index, small_corpus):
    from spcht_spark.index.search import SearchRequest, search

    resp = search(
        spark, small_index, small_corpus,
        SearchRequest(q="return OR import", k=4, hl=True, hl_snippets=2),
    )
    hits = resp.hits.toPandas()
    assert "snippets" in hits.columns
    assert (hits["snippets"].str.len() >= 1).all()
    assert hits["snippets"].apply(
        lambda s: any("<em>" in x for x in s)
    ).all()


# ------------------------------------------------- reproducible sampling

def test_stratified_sample_deterministic(spark, small_corpus):
    from spcht_spark.functions.sampling import hash_draw, stratified_sample

    rates = {"python": 0.5, "java": 0.2}
    out1 = stratified_sample(
        small_corpus.select("doc_id", "lang"), "doc_id", "lang",
        rates, salt="s1", default_rate=0.0,
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    out2 = stratified_sample(
        small_corpus.select("doc_id", "lang"), "doc_id", "lang",
        rates, salt="s1", default_rate=0.0,
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out1, out2)  # same salt -> same sample
    # python oracle: identical md5 draw
    import hashlib

    base = small_corpus.select("doc_id", "lang").toPandas()
    draws = base["doc_id"].map(
        lambda d: int(hashlib.md5(f"{d}s1".encode()).hexdigest()[:8], 16)
        / float(1 << 32)
    )
    keep = draws < base["lang"].map(rates).fillna(0.0)
    assert sorted(out1["doc_id"]) == sorted(base[keep]["doc_id"])
    # a different salt draws a different sample (overwhelmingly likely)
    out3 = stratified_sample(
        small_corpus.select("doc_id", "lang"), "doc_id", "lang",
        rates, salt="s2", default_rate=0.0,
    ).toPandas()
    assert set(out3["doc_id"]) != set(out1["doc_id"])
    # engine draw column == python md5 draw
    got = (
        small_corpus.select(
            "doc_id", hash_draw(F.col("doc_id"), "s1").alias("d")
        )
        .toPandas().set_index("doc_id")["d"]
    )
    assert got.loc[base["doc_id"]].values == pytest.approx(draws.values)


def test_stratum_quantiles_vs_pandas(spark, small_corpus):
    from spcht_spark.functions.sampling import stratum_quantiles

    docs = small_corpus.select(
        "doc_id", "lang", F.length("content").alias("n_chars")
    )
    out = stratum_quantiles(docs, "lang", "n_chars", [0.25, 0.5, 0.9])
    got = out.toPandas().sort_values(["stratum", "q"]).reset_index(drop=True)
    pdf = docs.toPandas()
    rows = []
    for lang, g in pdf.groupby("lang"):
        for q in [0.25, 0.5, 0.9]:
            rows.append((str(lang), q, g["n_chars"].quantile(q)))
    want = pd.DataFrame(rows, columns=["stratum", "q", "v"]).sort_values(
        ["stratum", "q"]
    ).reset_index(drop=True)
    assert got["v"].values == pytest.approx(want["v"].values)


def test_function_sort_nulls_last_both_directions(spark, small_index, small_corpus):
    """ADVICE r4: a NULL sort value must come AFTER every real value in
    BOTH directions (DuckDB's NULLS LAST default / Solr sortMissingLast)
    — Spark's bare F.asc would put NULLs first."""
    attrs = small_corpus.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, None)
        .otherwise(F.length("content"))
        .alias("n_chars"),
    )
    queries = [("fs_null", ["return"])]
    for descending in (True, False):
        out = function_sort_topk(
            spark, small_index.blocks, queries, attrs,
            "div(n_chars, 10)", k=10_000, descending=descending,
        ).toPandas().sort_values("rank")
        isnull = out["sort_v"].isna().tolist()
        assert any(isnull), "fixture must produce NULL sort values"
        first_null = isnull.index(True)
        assert all(isnull[first_null:]), (
            f"NULLs must be a contiguous tail (descending={descending})"
        )
        # NULL region itself ties by doc_id asc
        tail = out.iloc[first_null:]["doc_id"].tolist()
        assert tail == sorted(tail)
