"""Score explanation and the terms component.

Two small Solr/Lucene request-surface pieces:

* ``explain_scores`` — Lucene's ``Explanation`` / Solr ``debugQuery``:
  for chosen (query, doc) pairs, the per-term BM25 breakdown (tf, dl,
  df, idf, contribution) whose sum IS the engine score. Plan: the
  block scan pruned TWICE — ``term IN (query terms)`` and ``shard IN
  (shards of the requested docs)`` (doc-range sharding makes doc →
  shard a pure function), so explaining k docs decodes only the
  handful of blocks that can contain them.
* ``terms_component`` — Solr TermsComponent (``terms.prefix``): the
  dictionary rows under a prefix ordered by (df desc, term asc) — an
  index-metadata scan, no postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spcht_spark.index.query import decode_blocks, sql_in, stats_and_idfs
from spcht_spark.oracle import B, K1


def explain_scores(
    spark: SparkSession,
    blocks: DataFrame,
    doclens: DataFrame,
    dictionary: DataFrame,
    stats: DataFrame,
    terms: list[str],
    doc_ids: list[int],
    shard_span: int,
) -> DataFrame:
    """(doc_id, term, tf, dl, df, idf, contrib) for every requested doc
    that contains a requested term. sum(contrib) over a doc's rows is
    bit-identical to the engine's disjunctive score for these terms.
    ``doclens`` is accepted for API symmetry but unused — dl comes off
    the decoded blocks."""
    stats_row, idfs = stats_and_idfs(dictionary, stats, sorted(set(terms)))
    avgdl = float(stats_row["avgdl"])
    if not idfs:
        return spark.createDataFrame(
            [],
            schema="doc_id long, term string, tf long, dl long, "
                   "df long, idf double, contrib double",
        )
    ids = sorted({int(d) for d in doc_ids})
    shards = sorted({d // shard_span for d in ids})
    hit = blocks.where(
        f"term IN ({sql_in(sorted(idfs))}) AND "
        f"shard IN ({', '.join(str(s) for s in shards)})"
    )
    postings = decode_blocks(hit).where(
        f"doc_id IN ({', '.join(str(i) for i in ids)})"
    )
    idf_map = F.create_map(
        *[x for t, v in sorted(idfs.items()) for x in (F.lit(t), F.lit(v))]
    )
    return (
        postings.join(F.broadcast(dictionary.select("term", "df")), "term")
        .withColumn("idf", idf_map[F.col("term")])
        .withColumn(
            "contrib",
            F.col("idf")
            * (
                (F.col("tf") * F.lit(K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (F.lit(1.0 - B) + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
                )
            ),
        )
        .select("doc_id", "term", "tf", "dl", "df", "idf", "contrib")
    )


def terms_component(
    dictionary: DataFrame,
    prefix: str = "",
    limit: int = 10,
) -> DataFrame:
    """(rank, term, df, cf) — the dictionary under ``prefix`` ordered
    (df desc, term asc), Solr TermsComponent semantics."""
    d = dictionary
    if prefix:
        d = d.filter(F.col("term").startswith(prefix))
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
        .select("rank", "term", "df", "cf")
    )
