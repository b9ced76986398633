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

from spcht_spark.index.query import decode_blocks


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


def spellcheck_collate(
    spark: SparkSession,
    dictionary: DataFrame,
    blocks: DataFrame,
    queries: list[tuple[str, list[str]]],
    max_distance: int = 2,
) -> DataFrame:
    """Solr ``spellcheck.collate`` (+ ``collateExtendedResults``):
    rewrite each query replacing terms ABSENT from the dictionary with
    their top suggestion, and report how many docs the collation would
    return as a conjunctive (MUST) query — Solr verifies collations
    with ``maxCollationTries`` internal queries; here one distributed
    pass counts every collation's hits at once.

    Returns (query_id, collation, hits). Terms present in the
    dictionary are kept verbatim (Solr only corrects misspelled terms);
    a missing term with no suggestion within ``max_distance`` stays and
    yields 0 hits, like a collation Solr would discard.

    Driver-side work is bounded by |query terms| (the known-term lookup
    and the top-1 suggestion per missing term); hit counting decodes
    only the collated terms' pruned blocks and partial-aggs per
    (query, doc) — no full-corpus structure ever reaches the driver."""
    all_terms = sorted({t for _, ts in queries for t in ts})
    known = {
        r["term"]
        for r in dictionary.filter(F.col("term").isin(all_terms))
        .select("term")
        .collect()
    }
    missing = sorted(set(all_terms) - known)
    best: dict[str, str] = {}
    if missing:
        top = suggest(
            spark, dictionary, missing, max_distance=max_distance, top_n=1
        ).collect()
        best = {r["qterm"]: r["suggestion"] for r in top}
    coll = {qid: [best.get(t, t) for t in ts] for qid, ts in queries}
    base = spark.createDataFrame(
        [(qid, " ".join(coll[qid])) for qid, _ in queries],
        ["query_id", "collation"],
    )
    qrows = [
        (qid, t) for qid, ts in coll.items() for t in sorted(set(ts))
    ]
    n_terms = {qid: len(set(ts)) for qid, ts in coll.items()}
    query_terms = spark.createDataFrame(qrows, ["query_id", "term"])
    need = sorted({t for _, t in qrows})
    postings = decode_blocks(blocks.filter(F.col("term").isin(need))).select(
        "term", "doc_id"
    )
    nt_map = F.create_map(
        *[x for q, n in sorted(n_terms.items()) for x in (F.lit(q), F.lit(n))]
    )
    hits = (
        postings.join(F.broadcast(query_terms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("nm"))  # (doc, term) unique in postings
        .filter(F.col("nm") == nt_map[F.col("query_id")])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            "collation",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
        )
    )
