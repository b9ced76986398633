"""Incremental index maintenance must be indistinguishable from a full
rebuild: on a planted delta (inserts + modifications + deletes),
``update_index(build_index(base), delta)`` equals ``build_index(final)``
on every table — including the varbyte binaries and bit-exact max_part
(the avgdl-refresh path). Reference flow: delta fetch → delete →
re-insert (/root/reference/Spcht/Core/WorkOrder.py:702-707, 875-942)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spcht_spark.index.build import build_index
from spcht_spark.index.update import update_index

SPAN = 64


def _canon(df, keys):
    pdf = df.toPandas()
    return pdf.sort_values(keys).reset_index(drop=True)[sorted(pdf.columns)]


def _assert_tables_equal(full, incr, skip=()):
    for name, keys in [
        ("tokens", ["doc_id", "term"]),
        ("doclens", ["doc_id"]),
        ("dictionary", ["term"]),
        ("stats", ["n_docs"]),
        ("blocks", ["term", "shard", "block_seq"]),
    ]:
        if name in skip:
            continue
        a = _canon(getattr(full, name), keys)
        b = _canon(getattr(incr, name), keys)
        assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
        for col in a.columns:
            av, bv = a[col], b[col]
            if av.dtype.kind == "f":
                # bit-exact contract (same int64 decode, same float expr)
                assert (av.to_numpy() == bv.to_numpy()).all(), f"{name}.{col}"
            else:
                assert av.equals(bv), f"{name}.{col}"


@pytest.fixture(scope="module")
def delta_setup(spark, small_corpus):
    """final = small_corpus (400 docs). base = final with docs 370-399
    missing (to be inserted), docs 0-19 truncated (to be modified), and
    10 doomed docs at ids 1000+ (to be deleted)."""
    doomed = spark.createDataFrame(
        [
            (1000 + i, "org0/doomed", f"tmp/doomed{i}.py", "c" * 40, "python",
             f"return doomed{i} {{ }} if else import node42 ;", "")
            for i in range(10)
        ],
        small_corpus.schema,
    )
    truncated = small_corpus.filter(F.col("doc_id") < 20).withColumn(
        "content", F.substring("content", 1, 25)
    )
    base = (
        small_corpus.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 370))
        .unionByName(truncated)
        .unionByName(doomed)
    )
    changed = small_corpus.filter(
        (F.col("doc_id") < 20) | (F.col("doc_id") >= 370)
    ).select("doc_id", "content")
    deleted = doomed.select("doc_id")
    return base.cache(), changed.cache(), deleted.cache()


def test_incremental_equals_full_rebuild(spark, small_corpus, delta_setup):
    base, changed, deleted = delta_setup
    base_idx = build_index(spark, base, shard_span=SPAN)
    incr = update_index(spark, base_idx, changed, deleted, shard_span=SPAN)
    full = build_index(spark, small_corpus, shard_span=SPAN)
    _assert_tables_equal(full, incr)


def test_incremental_without_tokens_stage(spark, small_corpus, delta_setup):
    """The tokens table is optional state: with it deleted, the update
    recovers the delta's old postings by decoding the touched shards'
    blocks — and every remaining table still matches the full rebuild
    bit-for-bit (round-3 VERDICT "Next round" #5)."""
    import dataclasses

    base, changed, deleted = delta_setup
    base_idx = dataclasses.replace(
        build_index(spark, base, shard_span=SPAN), tokens=None
    )
    incr = update_index(spark, base_idx, changed, deleted, shard_span=SPAN)
    assert incr.tokens is None
    full = build_index(spark, small_corpus, shard_span=SPAN)
    _assert_tables_equal(full, incr, skip=("tokens",))


def test_apply_update_without_tokens_dir(spark, small_corpus, delta_setup, tmp_path):
    """Committed-index update after the tokens stage dir was deleted:
    load → decode-fallback update → swap; reloaded index matches the
    full rebuild on every remaining table."""
    import shutil

    from spcht_spark.index.update import apply_update
    from spcht_spark.plans.indexer import index_order, run_index_order

    base, changed, deleted = delta_setup
    workdir = str(tmp_path / "idx_notok")
    order = index_order(
        workdir, "t-base", lambda s: base, shard_span=SPAN, verify_sha256=False
    )
    run_index_order(spark, order)
    shutil.rmtree(f"{workdir}/tokens")
    updated = apply_update(
        spark, workdir, changed, deleted, shard_span=SPAN, run_id="t-delta"
    )
    assert updated.tokens is None
    full = build_index(spark, small_corpus, shard_span=SPAN)
    _assert_tables_equal(full, updated, skip=("tokens",))


def test_update_is_idempotent(spark, small_corpus, delta_setup):
    """Delete-then-reinsert semantics: re-sending the same delta changes
    nothing (the reference re-sends whole Solr pages on resume)."""
    base, changed, deleted = delta_setup
    idx1 = update_index(
        spark, build_index(spark, base, shard_span=SPAN), changed, deleted,
        shard_span=SPAN,
    )
    # materialize once so the second update doesn't recompute the first
    for t in ("tokens", "doclens", "dictionary", "stats", "blocks"):
        setattr(idx1, t, getattr(idx1, t).localCheckpoint())
    idx2 = update_index(spark, idx1, changed, deleted, shard_span=SPAN)
    _assert_tables_equal(idx1, idx2)


def test_untouched_groups_not_rebuilt(spark, small_corpus, delta_setup):
    """The efficiency contract: posting binaries of (term, shard) groups
    the delta never touches are carried over unchanged (same object
    bytes), not re-encoded — only max_part may move with avgdl."""
    base, changed, deleted = delta_setup
    base_idx = build_index(spark, base, shard_span=SPAN)
    touched_ids = changed.select("doc_id").unionByName(deleted).distinct()
    # touched terms = old tokens of touched docs (base index: covers the
    # deleted doomed docs' vocabulary) ∪ new tokens of changed docs
    touched_terms = {
        r["term"]
        for r in base_idx.tokens.join(touched_ids, "doc_id", "semi")
        .select("term")
        .unionByName(
            build_index(spark, small_corpus, shard_span=SPAN)
            .tokens.join(touched_ids, "doc_id", "semi")
            .select("term")
        )
        .distinct()
        .collect()
    }
    incr = update_index(spark, base_idx, changed, deleted, shard_span=SPAN)
    old = base_idx.blocks.toPandas()
    new = incr.blocks.toPandas()
    untouched_old = old[~old.term.isin(touched_terms)]
    merged = untouched_old.merge(
        new, on=["term", "shard", "block_seq"], suffixes=("_o", "_n")
    )
    assert len(merged) == len(untouched_old)
    assert (merged["docs_bin_o"] == merged["docs_bin_n"]).all()
    assert (merged["tfs_bin_o"] == merged["tfs_bin_n"]).all()


def test_apply_update_persisted(spark, small_corpus, delta_setup, tmp_path):
    """Committed-index update: stage dirs swapped atomically, manifest
    records the update, reloaded index equals the full rebuild."""
    import json
    import os

    from spcht_spark.index.update import apply_update
    from spcht_spark.plans.indexer import index_order, run_index_order

    base, changed, deleted = delta_setup
    workdir = str(tmp_path / "idx")
    order = index_order(
        workdir, "t-base", lambda s: base, shard_span=SPAN, verify_sha256=False
    )
    run_index_order(spark, order)
    updated = apply_update(
        spark, workdir, changed, deleted, shard_span=SPAN, run_id="t-delta"
    )
    full = build_index(spark, small_corpus, shard_span=SPAN)
    _assert_tables_equal(full, updated)
    with open(os.path.join(workdir, "manifest.json")) as fh:
        m = json.load(fh)
    assert m["updates"][0]["run_id"] == "t-delta"
    assert m["updates"][0]["changed"] == 50
    assert m["updates"][0]["deleted"] == 10
    assert not any(p.endswith(".new") for p in os.listdir(workdir))


def test_delete_by_query_equals_rebuild(spark, small_corpus, small_index):
    """delete_by_query('return AND import') must leave every index
    table equal to a from-scratch build over the surviving docs —
    including varbyte binaries (same delta path as id-deletes)."""
    from spcht_spark.index.update import delete_by_query
    from spcht_spark.oracle import tokenize_py

    got = delete_by_query(
        spark, small_index, "return AND import",
        tokenizer="ws", shard_span=SPAN,
    )
    pdf = small_corpus.select("doc_id", "content").toPandas()
    doomed = {
        int(r.doc_id)
        for r in pdf.itertuples()
        if {"return", "import"} <= set(tokenize_py(r.content))
    }
    assert doomed, "probe query must match some docs"
    survivors = small_corpus.filter(~F.col("doc_id").isin(list(doomed)))
    full = build_index(spark, survivors, shard_span=SPAN)
    _assert_tables_equal(full, got, skip=("tokens",))


def test_child_topk_expands_top_parents(spark, small_index, small_corpus):
    """Children of the top parent carry the parent's (max) score; every
    returned doc belongs to a top-parent group; ranks are contiguous."""
    from spcht_spark.index.join import child_topk, parent_topk
    from spcht_spark.index.query import exact_topk

    attrs = small_corpus.select("doc_id", "repo")
    scored = exact_topk(
        spark, small_index.blocks, small_index.doclens,
        small_index.dictionary, small_index.stats,
        [("q", ["return", "import"], 1_000_000)],
    ).select("query_id", "doc_id", "score")
    parents = {
        r["parent"]: r["score"]
        for r in parent_topk(scored, attrs, "repo", {"q": 2}).collect()
    }
    kids = child_topk(
        scored, attrs, "repo", {"q": 50}, parent_ks={"q": 2}
    ).collect()
    assert kids
    by_doc = {r["doc_id"]: r for r in kids}
    members = {
        int(r.doc_id): str(r.repo)
        for r in small_corpus.select("doc_id", "repo").toPandas().itertuples()
    }
    for r in kids:
        assert r["parent"] in parents            # only top parents expand
        assert members[r["doc_id"]] == r["parent"]
        assert r["score"] == pytest.approx(parents[r["parent"]])
    ranks = sorted(r["rank"] for r in kids)
    assert ranks == list(range(1, len(ranks) + 1))
    assert len(by_doc) == len(kids)              # no doc twice


def test_realtime_get_order_and_absent(spark, small_corpus):
    """/get returns request order, omits absent ids, prunes to fl."""
    from spcht_spark.index.search import realtime_get

    out = realtime_get(
        small_corpus, [5, 99999, 2, 11], fl=["repo"]
    ).collect()
    assert [r["doc_id"] for r in out] == [5, 2, 11]
    assert out[0].asDict().keys() == {"doc_id", "repo"}
