"""Snippet highlighting for query results (Solr ``hl`` parity).

Solr returns, next to every hit, a fragment of the stored field with
the matching terms wrapped in ``<em>`` — part of the response surface
of the cores the reference queries (q/fq/fl/hl,
/root/reference/Spcht/Core/WorkOrder.py:693). Engine contract here:
for each (query, hit) the snippet is the ±``window`` token context
around the FIRST occurrence of any query term, matched terms wrapped
in ``<em>…</em>``.

Spark-first: highlighting touches only the k·|queries| result rows —
the hits are broadcast against the doc store (fetching stored fields
for a result page, never a corpus scan), and the snippet is computed
entirely in Catalyst higher-order functions (split → indexed transform
→ array_min for the first hit position → slice → transform-wrap →
array_join). No Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def highlight(
    hits: DataFrame,
    doc_store: DataFrame,
    queries: list[tuple[str, list[str]]],
    window: int = 4,
    id_col: str = "doc_id",
    content_col: str = "content",
    tag_pre: str = "<em>",
    tag_post: str = "</em>",
) -> DataFrame:
    """hits (query_id, rank, doc_id, …) → + ``snippet``.

    ``tag_pre``/``tag_post`` are Solr ``hl.tag.pre`` / ``hl.tag.post``
    (hl.simple.pre/post): the wrapper around each matched term.

    Tokens are the single-space split of the stored field (the
    SQL-oracle-portable token definition); position = 1-based index in
    that split. A hit whose content contains no query term (possible
    for phrase/filtered callers) gets a NULL snippet, like Solr
    returning no highlight for a field."""
    qt = _terms_map_sql(queries) + "[query_id]"
    # Tokenize AFTER the join: the broadcast-hash join streams the doc
    # store, so a split in the pre-join projection runs over EVERY
    # stored doc to serve a k-row page (a full corpus re-tokenization
    # at scale — guide §2.3 "project before the exchange", inverted:
    # compute after the filter). Post-join it touches k·|queries| rows.
    # All snippet math is single expr strings (a Column op costs ~2.5 ms
    # of driver time in classic mode; the per-Column build dominated).
    docs = doc_store.selectExpr(
        f"`{id_col}` AS doc_id", f"`{content_col}` AS _content"
    )
    j = (
        F.broadcast(hits)
        .join(docs, "doc_id")
        .selectExpr("*", "split(_content, ' ') AS _toks")
        # 1-based position of the first query-term occurrence
        # (array_min skips the NULLs left by non-matching positions)
        .selectExpr(
            "*",
            f"array_min(transform(_toks, (t, i) -> "
            f"CASE WHEN array_contains({qt}, t) THEN i + 1 END)) AS _pos",
        )
    )
    from spcht_spark.index.query import sql_str

    # greatest() skips NULLs, so a no-match pos would silently anchor the
    # window at 1 — gate explicitly: no occurrence → NULL snippet.
    snippet = (
        f"CASE WHEN _pos IS NOT NULL THEN array_join(transform("
        f"slice(_toks, greatest(1, _pos - {int(window)}), {2 * int(window) + 1}), "
        f"t -> CASE WHEN array_contains({qt}, t) "
        f"THEN concat({sql_str(tag_pre)}, t, {sql_str(tag_post)}) ELSE t END"
        f"), ' ') END"
    )
    return j.selectExpr("*", f"{snippet} AS snippet").drop(
        "_content", "_toks", "_pos"
    )


def _terms_map_sql(queries: list[tuple[str, list[str]]]) -> str:
    """``map('qid', array('t1', ...), ...)`` literal, sorted as the old
    create_map build was."""
    from spcht_spark.index.query import sql_str

    return "map(" + ", ".join(
        f"{sql_str(qid)}, array({', '.join(sql_str(t) for t in sorted(set(ts)))})"
        for qid, ts in sorted(queries)
    ) + ")"


def highlight_fragments(
    hits: DataFrame,
    doc_store: DataFrame,
    queries: list[tuple[str, list[str]]],
    window: int = 4,
    max_snippets: int = 3,
    id_col: str = "doc_id",
    content_col: str = "content",
    tag_pre: str = "<em>",
    tag_post: str = "</em>",
) -> DataFrame:
    """Solr ``hl.snippets=N``: up to N fragments per hit instead of
    one — + ``snippets array<string>``.

    Fragment selection follows Lucene's distinct-term heuristic in an
    SQL-portable form: the i-th fragment anchors at the FIRST
    occurrence of the i-th distinct matching query term, anchors
    ordered by position (so fragments cover different terms rather
    than re-showing the hottest one). Every query term inside any
    fragment is ``<em>``-wrapped. A hit containing no query term gets
    an empty array, like Solr returning no highlight.

    Same cost shape as :func:`highlight`: k·|queries| result rows
    broadcast against the doc store, all fragment work in Catalyst
    higher-order functions over the token split — ``array_position``
    per query term (|terms| probes, not |tokens| passes), never a
    corpus scan, no Python."""
    from spcht_spark.index.query import sql_str

    qt = _terms_map_sql(queries) + "[query_id]"
    # split after the join — page rows only, never the streamed corpus;
    # fragment math as one expr string (see highlight)
    docs = doc_store.selectExpr(
        f"`{id_col}` AS doc_id", f"`{content_col}` AS _content"
    )
    j = (
        F.broadcast(hits)
        .join(docs, "doc_id")
        .selectExpr("*", "split(_content, ' ') AS _toks")
    )
    # first occurrence of each query term (0 = absent), ordered by
    # position, capped at max_snippets anchors
    frags = (
        f"transform("
        f"slice(array_sort(filter(transform({qt}, "
        f"t -> array_position(_toks, t)), p -> p > 0)), 1, {int(max_snippets)}), "
        f"a -> array_join(transform("
        f"slice(_toks, CAST(greatest(1, a - {int(window)}) AS INT), "
        f"{2 * int(window) + 1}), "
        f"t -> CASE WHEN array_contains({qt}, t) "
        f"THEN concat({sql_str(tag_pre)}, t, {sql_str(tag_post)}) ELSE t END"
        f"), ' '))"
    )
    return j.selectExpr("*", f"{frags} AS snippets").drop("_content", "_toks")
