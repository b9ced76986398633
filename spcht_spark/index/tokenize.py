"""Content tokenization.

Two equivalent implementations (tested for equality):

* :func:`tokens_arrow` — vectorized pandas/Arrow UDF (`mapInPandas`), the
  north-rule canonical path ("tokenizes content via vectorized
  pandas/Arrow UDFs, no per-row Python"). Regex runs inside pandas
  ``str`` ops; tf aggregation is a pandas groupby, so each input
  partition emits pre-aggregated ``(doc_id, term, tf)`` — this is the
  map-side half of SPIMI (in-memory per-partition inversion).
* :func:`tokens_jvm` — pure Catalyst (`regexp_extract_all` + `explode`),
  whole-stage-codegen'd, zero Python. Kept as a cross-check and a
  fallback fast path.

The reference's model for "parse binary payload once in a batch UDF,
then pure column ops" is its MARC21 parse
(/root/reference/Spcht/Core/SpchtUtility.py:404-475).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Identifiers, integers, and single-char code punctuation.  Must stay in
# sync with spcht_spark.oracle.tokenize_py (rank-identity contract).
TOKEN_REGEX = r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[{}()\[\];:=,.<>+\-*/]"

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.LongType(), False),
    ]
)


def tokens_arrow(corpus: DataFrame) -> DataFrame:
    """(doc_id, term, tf) via Arrow-batched pandas — SPIMI map side."""
    pat = re.compile(TOKEN_REGEX)

    def invert(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            s = pdf.set_index("doc_id")["content"].str.findall(pat)
            ex = s.explode().dropna()
            if len(ex) == 0:
                continue
            tf = (
                ex.groupby(level=0)
                .value_counts()
                .rename("tf")
                .reset_index()
                .rename(columns={"content": "term"})
            )
            yield tf[["doc_id", "term", "tf"]]

    return corpus.select("doc_id", "content").mapInPandas(invert, schema=TOKENS_SCHEMA)


def tokens_jvm(corpus: DataFrame) -> DataFrame:
    """Same output, pure Catalyst expressions (no Python at all)."""
    # regexp_extract_all needs the pattern escaped into a SQL literal.
    pat = TOKEN_REGEX.replace("\\", "\\\\")
    return (
        corpus.select(
            "doc_id",
            F.explode(F.expr(f"regexp_extract_all(content, '{pat}', 0)")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
