"""Field collapsing (Solr ``collapse``/``group.field``).

Solr's collapsing post-filter keeps only each group's best-scoring doc
in the result page (one hit per ``source``/site/dedup-key — standard
search-result dedup on the same query surface the reference drives,
/root/reference/Spcht/Core/WorkOrder.py:693). Engine: full exact BM25
candidate scores → one narrow equi-join on doc_id for the collapse
key → per-(query, key) head selection → per-query top-k of the heads.

Scale shape: the head-selection window partitions by (query, key) —
group-sized partitions, millions of them, no hot reducer. The final
top-k over group heads uses the same two-stage salted pattern as the
plain score top-k. Both windows order by (round(score, 6) desc,
doc_id asc) — the cross-engine determinism contract used everywhere
else (float sums agree to well beyond 6 decimals; the rounding pins
boundary ties identically in Spark and the SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spcht_spark.index.query import (
    decode_blocks,
    query_idfs,
    score_postings,
    sql_in,
    stats_and_idfs,
    values_df,
)


def collapse_topk(
    spark: SparkSession,
    blocks: DataFrame,
    doclens: DataFrame,
    dictionary: DataFrame,
    stats: DataFrame,
    attrs: DataFrame,
    group_col: str,
    queries: list[tuple[str, list[str], int]],
) -> DataFrame:
    """(query_id, rank, doc_id, score, grp): top-k groups per query,
    each represented by its best (round(score,6) desc, doc_id asc)
    doc."""
    all_terms = sorted({t for _, ts, _ in queries for t in ts})
    stats_row, idfs = stats_and_idfs(dictionary, stats, all_terms)
    avgdl = float(stats_row["avgdl"])
    schema = "query_id string, rank int, doc_id long, score double, grp string"
    if not idfs:
        return spark.createDataFrame([], schema=schema)
    qrows = [
        (qid, t) for qid, ts, _ in queries for t in sorted(set(ts)) if t in idfs
    ]
    query_terms = values_df(spark, qrows, ["query_id", "term"])
    postings = decode_blocks(blocks.where(f"term IN ({sql_in(sorted(idfs))})"))
    scores = score_postings(postings, idfs, avgdl, query_terms)
    j = scores.join(
        attrs.select("doc_id", F.col(group_col).cast("string").alias("grp")),
        "doc_id",
    )
    order = (F.desc(F.round("score", 6)), F.asc("doc_id"))
    w_grp = Window.partitionBy("query_id", "grp").orderBy(*order)
    heads = (
        j.withColumn("g_rn", F.row_number().over(w_grp))
        .filter(F.col("g_rn") == 1)
        .drop("g_rn", "n_matched")
    )
    ks = {qid: k for qid, _, k in queries}
    k_map = F.create_map(
        *[x for q, k in sorted(ks.items()) for x in (F.lit(q), F.lit(k))]
    )
    w_salt = Window.partitionBy("query_id", "salt").orderBy(*order)
    pre = (
        heads.withColumn("salt", F.pmod(F.xxhash64("grp"), F.lit(64)))
        .withColumn("r1", F.row_number().over(w_salt))
        .filter(F.col("r1") <= k_map[F.col("query_id")])
        .drop("salt", "r1")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_map[F.col("query_id")])
        .select(
            "query_id", "rank", "doc_id", F.round("score", 4).alias("score"), "grp"
        )
    )
