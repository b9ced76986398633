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
    """(doc_id, term, tf) via Arrow-batched UDF — SPIMI map side.

    The whole inversion stays off the Python heap: tokenization is three
    RE2 passes + a split in pyarrow C++ (normalize → pad punctuation →
    digit/identifier boundary), counting is a composite-key
    numpy.unique over dictionary-encoded token codes. Only the per-batch
    UNIQUE terms ever become strings. (A pandas str.findall version of
    this UDF spent 6+ kernel-CPUs on page faults — millions of transient
    PyObjects per batch; this one is ~10× cheaper and allocation-flat.)

    Token definition is TOKEN_REGEX, verified equivalent in tests
    against both the JVM regexp path and the pure-Python oracle."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    punct = r"[{}()\[\];:=,.<>+\-*/]"

    def tokenize_lists(content: pa.Array) -> pa.Array:
        # 1. anything that is not word-char / whitespace / code punct → space
        s = pc.replace_substring_regex(
            content, pattern=rf"[^A-Za-z0-9_\s{{}}()\[\];:=,.<>+\-*/]", replacement=" "
        )
        # 2. pad code punctuation into standalone tokens
        s = pc.replace_substring_regex(s, pattern=f"({punct})", replacement=r" \1 ")
        # 3. '9abc' → '9 abc' (identifiers cannot start with a digit);
        #    RE2 has no lookbehind, so anchor on (start | non-word-char)
        s = pc.replace_substring_regex(
            s, pattern=r"(^|[^A-Za-z0-9_])([0-9]+)([A-Za-z_])", replacement=r"\1\2 \3"
        )
        return pc.split_pattern_regex(s, pattern=r"\s+")

    def invert(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lists = tokenize_lists(pa.array(pdf["content"], type=pa.string()))
            flat = pc.list_flatten(lists)
            if len(flat) == 0:
                continue
            parents = pc.list_parent_indices(lists).to_numpy()
            denc = flat.dictionary_encode()
            codes = denc.indices.to_numpy().astype(np.int64)
            vocab = denc.dictionary
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)[parents]
            k = np.int64(len(vocab))
            key = doc_ids * k + codes  # doc_id < 2^62 / |batch vocab|
            uk, counts = np.unique(key, return_counts=True)
            term_codes = (uk % k).astype(np.int64)
            out = pd.DataFrame(
                {
                    "doc_id": uk // k,
                    "term": vocab.take(pa.array(term_codes)).to_pandas(),
                    "tf": counts.astype(np.int64),
                }
            )
            # split leaves "" tokens at string boundaries — drop them
            yield out[out["term"] != ""]

    return corpus.select("doc_id", "content").mapInPandas(invert, schema=TOKENS_SCHEMA)


def tokens_ws(corpus: DataFrame) -> DataFrame:
    """Whitespace tokens (single-space split), pure Catalyst.

    Exists so the full index engine (build → compress → exact/WAND query)
    can be DuckDB-oracled by the driver: ``split(content, ' ')`` filtered
    non-empty is exactly ``string_split(text, ' ') ... WHERE term <> ''``
    in ANSI SQL, whereas TOKEN_REGEX is not SQL-portable."""
    return (
        corpus.select(
            "doc_id", F.explode(F.split("content", " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


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
