"""Solr join query parser — ``{!join from=F to=T}<child query>``.

Reference parity: the reference's Solr core answers join filter
queries (standard JoinQParserPlugin; the reference submits raw `fq`
strings verbatim, `Spcht/Core/WorkOrder.py:702-707`, so any Solr
install it points at supports this surface).  Semantics: evaluate the
child query against the child table, project its ``from`` field
values, and keep main-query documents whose ``to`` field holds one of
those values — an EXISTS semi-join, never a fan-out (a doc matched by
ten child rows appears once).

Spark-first shape: child predicate → ``select(from).distinct()`` →
``leftsemi`` join against the doc attributes on ``to``.  The distinct
collapses the child side to its value domain BEFORE the shuffle — at
100 TB the child query may match billions of rows but the value
domain (e.g. crawl sources) is orders smaller, and AQE broadcasts it
when it fits.  The result is a (doc_id) frame, pluggable as
``doc_filter`` into every ranked path (WAND stays pruned through its
shard-span bitmap path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spcht_spark.index.boolean import ast_predicate, parse_filter_query

__all__ = ["join_docs"]


def join_docs(
    child: DataFrame,
    from_col: str,
    to: DataFrame,
    to_col: str,
    child_fq: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """``{!join from=from_col to=to_col}child_fq`` → (doc_id) filter.

    ``child``: the child table (may be the doc attributes themselves —
    Solr same-core join).  ``child_fq``: a metadata filter-query
    string in the engine's fq language (``lang:de``, ranges, AND/OR/
    NOT).  ``to``: the doc attribute table carrying ``to_col`` and
    ``id_col``.
    """
    ast = parse_filter_query(child_fq)
    values = (
        child.filter(ast_predicate(ast, F.array().cast("array<string>")))
        .select(F.col(from_col).alias("_jv"))
        .distinct()
    )
    # ``to`` is a doc-attribute table: unique on id_col by contract
    # (same assumption as fq_filter), and leftsemi preserves that — no
    # distinct, no extra shuffle.
    return to.join(values, to[to_col] == values._jv, "leftsemi").select(
        F.col(id_col).alias("doc_id")
    )
