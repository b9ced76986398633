"""Re-ranking and query elevation — the last two standard Solr result
post-processors the facade lacked.

Reference parity: the reference delegates ALL retrieval to its Solr
core (`Spcht/Core/WorkOrder.py:693` builds requests; Solr executes).
Two standard request components operate on a ranked page after the
main query:

* **ReRankQParser** (`rq={!rerank reRankQuery=$rqq reRankDocs=N
  reRankWeight=W}`): the top N documents of the main query are
  re-scored as ``main_score + W * rerank_score`` (documents that do
  not match the rerank query keep their main score) and re-ordered
  *among themselves*; documents beyond N keep their original order
  below the re-ranked section.
* **QueryElevationComponent** (elevate.xml): per query, a curated
  ordered list of doc ids is pinned to the top of the page (in the
  configured order, regardless of score) and an exclusion list is
  removed entirely.  Default Solr behaviour (``forceElevation=false``)
  only moves documents that actually matched the query.

Scale notes (100 TB lens): both operators touch only the already-
ranked candidate page (≤ a few hundred rows per query), never the
postings.  The elevation/exclusion config is a curated hand-written
list — a literal broadcast frame, no shuffle.  The rerank combine is
one broadcast-joinable merge of two top-k frames keyed by
(query_id, doc_id): each side is ≤ rerank_docs rows per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["rerank_topk", "elevate_hits"]


def rerank_topk(
    main: DataFrame,
    rerank: DataFrame,
    rerank_docs: int,
    weight: float = 1.0,
    k: int | None = None,
) -> DataFrame:
    """Solr ReRankQParser over two ranked frames.

    ``main``: (query_id, rank, doc_id, score) — the main query's page,
    fetched with k ≥ the page size wanted after re-ranking.
    ``rerank``: (query_id, doc_id, score) (a ``rank`` column is
    ignored) — the re-rank query's scores; docs absent from it
    contribute 0.

    Docs with main ``rank <= rerank_docs`` get ``score + weight *
    rerank_score`` and are re-ordered among themselves by
    (round(combined, 6) desc, doc_id asc) — the engine's deterministic
    ranking contract; docs beyond keep their original relative order
    below the re-ranked section, original scores untouched.  Returns
    the same (query_id, rank, doc_id, score) shape, limited to ``k``
    rows per query when given.
    """
    rr = rerank.select(
        "query_id", F.col("doc_id").alias("rr_doc"),
        F.col("score").alias("rr_score"),
    )
    top = F.col("rank") <= F.lit(rerank_docs)
    combined = (
        main.join(
            rr,
            (main.query_id == rr.query_id) & (main.doc_id == rr.rr_doc) & top,
            "left",
        )
        .drop(rr.query_id)
        .drop("rr_doc")
        .withColumn(
            "new_score",
            F.when(
                top,
                F.col("score") + F.lit(weight) * F.coalesce("rr_score", F.lit(0.0)),
            ).otherwise(F.col("score")),
        )
    )
    # One window: re-ranked section first (ordered by combined score),
    # then the untouched tail in original rank order.
    sect = F.when(top, F.lit(0)).otherwise(F.lit(1))
    key = F.when(top, -F.round("new_score", 6)).otherwise(F.col("rank").cast("double"))
    w = Window.partitionBy("query_id").orderBy(sect.asc(), key.asc(), F.asc("doc_id"))
    out = combined.withColumn("new_rank", F.row_number().over(w)).select(
        "query_id",
        F.col("new_rank").alias("rank"),
        "doc_id",
        F.col("new_score").alias("score"),
    )
    if k is not None:
        out = out.filter(F.col("rank") <= k)
    return out


def _config_frame(
    spark: SparkSession, per_query: dict[str, list], value_name: str
) -> DataFrame:
    """(query_id, value, pos) literal frame from a curated per-query
    list — elevation configs are tiny by construction (hand-written),
    so this is always a broadcast side."""
    rows = [
        (qid, v, i)
        for qid, vals in sorted(per_query.items())
        for i, v in enumerate(vals)
    ]
    if not rows:
        return spark.createDataFrame(
            [], f"query_id string, {value_name} long, pos int"
        )
    from spcht_spark.index.query import values_df

    return values_df(spark, rows, ["query_id", value_name, "pos"])


def elevate_hits(
    spark: SparkSession,
    hits: DataFrame,
    elevations: dict[str, list],
    exclusions: dict[str, list] | None = None,
    k: int | None = None,
) -> DataFrame:
    """Solr QueryElevationComponent over a ranked page.

    ``elevations``: query_id → ordered doc ids pinned to the top (in
    that order, scores untouched — Solr keeps the doc's real score and
    only overrides the sort).  ``exclusions``: query_id → doc ids
    removed from the page.  Only matched docs move (forceElevation=
    false).  Ranks are recomputed; ``k`` re-trims the page.
    """
    elev = _config_frame(spark, elevations, "doc_id")
    out = hits.join(F.broadcast(elev), ["query_id", "doc_id"], "left")
    if exclusions:
        excl = _config_frame(spark, exclusions, "doc_id").select(
            "query_id", "doc_id", F.lit(True).alias("_drop")
        )
        out = out.join(F.broadcast(excl), ["query_id", "doc_id"], "left").filter(
            F.col("_drop").isNull()
        ).drop("_drop")
    sect = F.when(F.col("pos").isNotNull(), F.lit(0)).otherwise(F.lit(1))
    key = F.coalesce(F.col("pos").cast("double"), F.col("rank").cast("double"))
    w = Window.partitionBy("query_id").orderBy(sect.asc(), key.asc(), F.asc("doc_id"))
    out = out.withColumn("new_rank", F.row_number().over(w)).select(
        "query_id", F.col("new_rank").alias("rank"), "doc_id", "score"
    )
    if k is not None:
        out = out.filter(F.col("rank") <= k)
    return out
