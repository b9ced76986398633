"""Spellcheck / fuzzy term suggestions from the dictionary.

Solr's spellcheck component suggests corrections for query terms from
the index's own term dictionary ranked by edit distance and frequency
— again surface of the cores the reference queries
(/root/reference/Spcht/Core/WorkOrder.py:693). Lucene walks an FST
with a Levenshtein automaton; the Spark-first equivalent is a pruned
scan of the dictionary table:

* Candidate pruning: ``abs(len(term) - len(q)) <= max_distance`` — a
  pure Catalyst predicate on the small dictionary table (and the
  length bound is a necessary condition for the edit distance, so no
  candidate is lost).
* ``levenshtein`` is a JVM built-in (no Python); the misspelled terms
  are a broadcast literal join.
* Ranking per query term: (distance asc, df desc, term asc) —
  deterministic, SQL-oracle-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def suggest(
    spark: SparkSession,
    dictionary: DataFrame,
    terms: list[str],
    max_distance: int = 2,
    top_n: int = 5,
) -> DataFrame:
    """(qterm, rank, suggestion, distance, df) — up to ``top_n``
    dictionary terms within ``max_distance`` edits of each input term.
    Exact hits (distance 0) are excluded: a correctly-spelled term
    needs no correction."""
    q = spark.createDataFrame([(t,) for t in sorted(set(terms))], ["qterm"])
    cand = (
        dictionary.select("term", "df")
        .crossJoin(F.broadcast(q))
        .filter(
            F.abs(F.length("term") - F.length("qterm")) <= max_distance
        )
        .withColumn("distance", F.levenshtein("term", "qterm"))
        .filter((F.col("distance") <= max_distance) & (F.col("distance") > 0))
    )
    w = Window.partitionBy("qterm").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("term")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            "qterm", "rank", F.col("term").alias("suggestion"), "distance", "df"
        )
    )
