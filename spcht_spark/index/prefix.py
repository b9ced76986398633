"""Prefix (wildcard ``term*``) queries via dictionary expansion.

Solr/Lucene answer ``handler*`` by expanding the pattern against the
term dictionary and rewriting to a boolean over the matching terms —
part of the free-form ``q`` surface the reference submits to its cores
(/root/reference/Spcht/Core/WorkOrder.py:693). This implements the
SCORING_BOOLEAN rewrite: the expanded terms score as a disjunctive
BM25 query through the unchanged exact path.

Scale shape:

* Expansion is a ``startswith`` filter on the dictionary — the
  dictionary is the SMALL index table (|vocab| rows, sorted by term in
  the persisted layout, so the prefix predicate prunes row groups via
  min/max stats like Lucene's FST seek).
* Like Lucene's ``maxExpansions`` (default 50 on fuzzy/wildcard
  rewrites), expansion is capped: the top ``max_expansions`` matching
  terms by (df desc, term asc) — deterministic, so a SQL oracle lands
  on the same expansion set.
* The expanded term list is query-sized metadata (collected like the
  query terms' dfs); execution stays the distributed block-scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spcht_spark.index.query import exact_topk


def expand_prefix(
    dictionary: DataFrame, prefix: str, max_expansions: int = 50
) -> list[str]:
    """Terms starting with ``prefix``, top ``max_expansions`` by
    (df desc, term asc)."""
    rows = (
        dictionary.filter(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
        .select("term")
        .collect()
    )
    return [r["term"] for r in rows]


def prefix_topk(
    spark: SparkSession,
    blocks: DataFrame,
    doclens: DataFrame,
    dictionary: DataFrame,
    stats: DataFrame,
    queries: list[tuple[str, str, int]],
    max_expansions: int = 50,
) -> DataFrame:
    """Top-k for ``(query_id, prefix, k)`` prefix queries."""
    expanded = [
        (qid, expand_prefix(dictionary, prefix, max_expansions), k)
        for qid, prefix, k in queries
    ]
    live = [(qid, ts, k) for qid, ts, k in expanded if ts]
    if not live:
        from spcht_spark.index.query import TOPK_SCHEMA

        return spark.createDataFrame([], schema=TOPK_SCHEMA)
    return exact_topk(spark, blocks, doclens, dictionary, stats, live)
