"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship BM25 query; queries()/oracle_sql() expose one
entry per implemented operator (SURVEY.md §2 + training-data ops),
DuckDB-checked at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spcht_spark import demo_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return demo_queries.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(demo_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(demo_queries.ORACLES)
