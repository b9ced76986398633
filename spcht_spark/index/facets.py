"""Facet counts over the matching-doc set of an index query.

Solr parity: the reference's upstream Solr exposes ``facet.field`` /
``facet.range`` alongside every query (the Solr request surface Spcht
talks to via ``q``/``fq``/``fl``, /root/reference/Spcht/Core/
WorkOrder.py:693-707); faceting is the canonical "what does the result
set look like" companion to top-k. Here a facet is computed over ALL
docs matching the query (disjunctive: contains ≥1 query term, Solr's
default OR op), not just the top-k page — exactly Solr semantics.

Spark-first shape (100 TB lens):

* The matching-doc set comes from the posting blocks (``term IN (...)``
  pruned scan → Arrow decode → distinct), never from a corpus scan —
  facets cost O(|postings of query terms|), not O(corpus).
* distinct on (query_id, doc_id) is one shuffle; the attrs join is an
  equi-join on doc_id (narrow ids vs the attrs table, broadcastable
  from the facet side when the match set is small); the final count is
  a partial-aggregating groupBy. No window, no driver collect.
* Range facets are just a bucket Column expression — computed JVM-side
  in the same pass, Solr ``facet.range`` ≙ floor((x-start)/gap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spcht_spark.index.query import decode_blocks

FACET_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("field", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("n", T.LongType(), False),
    ]
)


def matching_docs(
    spark: SparkSession,
    blocks: DataFrame,
    queries: list[tuple[str, list[str]]],
) -> DataFrame:
    """(query_id, doc_id) — distinct docs containing ≥1 query term.

    The block scan is pruned by ``term IN (...)`` (pushed to parquet
    row-group stats on the sorted term column, same path plan_audit.py
    checks for the top-k queries)."""
    all_terms = sorted({t for _, ts in queries for t in ts})
    if not all_terms:
        return spark.createDataFrame(
            [], schema="query_id string, doc_id long"
        )
    qrows = [(qid, t) for qid, ts in queries for t in sorted(set(ts))]
    query_terms = spark.createDataFrame(qrows, ["query_id", "term"])
    postings = decode_blocks(blocks.filter(F.col("term").isin(all_terms)))
    return (
        postings.join(F.broadcast(query_terms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )


def facet_counts(
    spark: SparkSession,
    blocks: DataFrame,
    queries: list[tuple[str, list[str]]],
    attrs: DataFrame,
    facets: dict[str, Column],
    doc_filter: DataFrame | None = None,
    match: DataFrame | None = None,
    limit: int | None = None,
    mincount: int = 0,
    sort: str = "count",
) -> DataFrame:
    """(query_id, field, value, n) — per-query facet counts.

    ``limit``/``mincount``/``sort`` are Solr's ``facet.limit`` /
    ``facet.mincount`` / ``facet.sort``: buckets with n < mincount are
    dropped, and with a limit only the top-``limit`` buckets per
    (query, facet) survive, ordered by ``sort`` — ``"count"`` (n desc,
    value asc — Solr's default) or ``"index"`` (value asc). At web
    scale a facet over a high-cardinality field (URLs, hosts) has
    billions of buckets; the limit applies via the same two-stage
    salted window as every ranked surface, so no reducer ever holds
    one (query, facet)'s full bucket list. ``limit=None`` returns all
    buckets (the unlimited legacy shape).

    ``facets`` maps a facet name to either a Column over ``attrs``
    producing the bucket value (a plain column for ``facet.field``, a
    bucket expression like ``F.floor(F.col("n_chars")/100)*100`` for
    ``facet.range``) or a ``(Column, [attr_col, ...])`` tuple naming
    the attrs columns the expression reads — the explicit form prunes
    the attrs join input without any plan-string introspection (prefer
    it; the bare-Column form falls back to a best-effort sniff).
    ``doc_filter`` is Solr fq: a (doc_id) DataFrame
    restricting the countable docs (semi-join on ids — narrow).
    ``match`` overrides the default disjunctive matching set with a
    caller-computed (query_id, doc_id) frame — e.g. the admissible set
    of a boolean query (spcht_spark.index.boolean.boolean_matches), so
    facets count docs matching the WHOLE q, Solr semantics.

    One matching-docs pass is shared by every facet (the attrs join
    happens once); per-facet counting is a partial-agg groupBy each.
    """
    if match is None:
        match = matching_docs(spark, blocks, queries)
    else:
        match = match.select("query_id", "doc_id")
    if doc_filter is not None:
        match = match.join(doc_filter.select("doc_id"), "doc_id", "semi")
    specs = {
        name: (v if isinstance(v, tuple) else (v, None))
        for name, v in facets.items()
    }
    need = ["doc_id"] + sorted(
        {
            c
            for col, cols in specs.values()
            for c in (cols if cols is not None else _referenced(attrs, col))
        }
    )
    joined = match.join(attrs.select(*[c for c in need]), "doc_id")

    if sort not in ("count", "index"):
        raise ValueError(f"facet sort must be 'count' or 'index', got {sort!r}")
    outs = []
    for name in sorted(specs):
        outs.append(
            joined.groupBy(
                "query_id", specs[name][0].cast("string").alias("value")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "query_id", F.lit(name).alias("field"), "value", "n"
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    if mincount > 0:
        res = res.filter(F.col("n") >= mincount)
    if limit is not None:
        from pyspark.sql import Window

        order = (
            (F.desc("n"), F.asc("value"))
            if sort == "count"
            else (F.asc("value"),)
        )
        w_salt = Window.partitionBy("query_id", "field", "salt").orderBy(*order)
        res = (
            res.withColumn("salt", F.pmod(F.xxhash64("value"), F.lit(64)))
            .withColumn("r1", F.row_number().over(w_salt))
            .filter(F.col("r1") <= limit)
            .drop("salt", "r1")
        )
        w = Window.partitionBy("query_id", "field").orderBy(*order)
        res = (
            res.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= limit)
            .drop("r")
        )
    return res


def field_stats(
    spark: SparkSession,
    blocks: DataFrame,
    queries: list[tuple[str, list[str]]],
    attrs: DataFrame,
    field: str,
    doc_filter: DataFrame | None = None,
    match: DataFrame | None = None,
) -> DataFrame:
    """Solr stats component: count/min/max/sum/mean of a numeric field
    over ALL docs matching each query — same matching-doc machinery as
    faceting (``match`` overrides it like in :func:`facet_counts`),
    one partial-agg groupBy. Returns (query_id, n, min_v, max_v,
    sum_v, avg_v)."""
    if match is None:
        match = matching_docs(spark, blocks, queries)
    else:
        match = match.select("query_id", "doc_id")
    if doc_filter is not None:
        match = match.join(doc_filter.select("doc_id"), "doc_id", "semi")
    j = match.join(attrs.select("doc_id", field), "doc_id")
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(field).cast("long").alias("min_v"),
        F.max(field).cast("long").alias("max_v"),
        F.sum(field).cast("long").alias("sum_v"),
        (F.sum(field).cast("double") / F.count(F.lit(1))).alias("avg_v"),
    )


def _referenced(attrs: DataFrame, col: Column) -> set[str]:
    """Columns of attrs a facet expression touches (for pruning the
    join input). Falls back to all columns when the expression string
    is opaque (e.g. no ``_jc`` under Spark Connect)."""
    try:
        expr = str(col._jc)  # e.g. "Column<'FLOOR((n_chars / 100))'>"
    except AttributeError:
        expr = str(col)
    hits = {c for c in attrs.columns if c != "doc_id" and c in expr}
    return hits or {c for c in attrs.columns if c != "doc_id"}
