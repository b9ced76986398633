"""Solr JSON envelope source (S2 parity).

The reference strips the Solr response envelope and maps status codes
to errors per chunk file (solr_handle_return,
/root/reference/Spcht/Utils/local_tools.py:60-89; slice_header_json
:47-57). Here the envelope is parsed by spark.read.json and the docs
array exploded — one scan, no driver-side pagination (the cursorMark
loop of FetchWorkOrderSolr, WorkOrder.py:693-750, is replaced by
partitioned file reads)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SolrStatusError(RuntimeError):
    """Non-zero Solr status (reference raises per status family:
    local_tools.py:69-87)."""


def read_solr_envelope(
    spark: SparkSession, path: str, multiLine: bool = True
) -> DataFrame:
    """Envelope JSON file(s) → docs DataFrame.

    Raises SolrStatusError if any envelope's responseHeader.status != 0
    (checked distributively — one tiny aggregate, no full collect)."""
    raw = spark.read.option("multiLine", multiLine).json(path)
    if "responseHeader" in raw.columns:
        bad = (
            raw.select(F.col("responseHeader.status").alias("status"))
            .filter(F.col("status") != 0)
            .limit(1)
            .collect()
        )
        if bad:
            raise SolrStatusError(f"solr status {bad[0]['status']}")
    if "response" not in raw.columns:
        raise SolrStatusError("no response key in envelope")
    return raw.select(F.explode("response.docs").alias("doc")).select("doc.*")
