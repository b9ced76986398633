"""Index build: SPIMI-style posting construction with explicit skew
handling (BASELINE.json ``north_rule``: "partitioning / shuffle / skew
handled explicitly").

Stages (each a checkpointable parquet table, see spcht_spark.plans):

  tokens      (doc_id, term, tf, dl)   — Arrow-UDF SPIMI map side (dl
                                         computed in the same batch)
  doclens     (doc_id, dl)             — dedup of the carried dl
  dictionary  (term, term_hash, df, cf)— groupBy(term)         [shuffle on term]
  stats       (n_docs, avgdl, total_tokens) — global agg
  blocks      (term, term_hash, shard, block_seq, first_doc, last_doc,
               n_docs, docs_bin, tfs_bin, dls_bin, max_part)

Skew strategy — doc-range sharding. Zipfian code tokens ('{', 'return',
…) hold a huge share of all postings; a plain groupBy(term) would give
one straggler task per hot term. Instead every posting is keyed by
(term, shard) where ``shard = doc_id // shard_span`` is a fixed-width
document range. Properties:

* bounded groups: a (term, shard) group holds at most shard_span docs,
  independent of term heat — hot terms fan out over many tasks;
* no merge pass: shards are contiguous doc ranges, so per-term global
  block order is (shard asc, block_seq asc) with no interleaving;
* parallel queries with exact merge: docs are disjoint across shards,
  so per-(query, shard) top-k results merge exactly (union → top-k) —
  the classic document-sharded search-engine layout (what the
  reference's upstream Solr does across its shards; Spcht queries it
  at /root/reference/Spcht/Core/WorkOrder.py:693 but never builds it).

Blocks additionally carry varbyte doc lengths (``dls_bin``) so the WAND
scorer computes exact BM25 inside the UDF without a doclens join, and
``max_part`` — the idf-free upper bound
max(tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))) over the block; multiplied by
query-time idf it is the block-max score that WAND prunes with.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spcht_spark.index.compress import (
    BLOCK_SIZE,
    varbyte_encode_segments,
)
from spcht_spark.index.tokenize import tokens_arrow, tokens_jvm, tokens_ws
from spcht_spark.oracle import B, K1

DEFAULT_SHARD_SPAN = 1 << 17  # 131072 docs / shard; override per scale

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("term_hash", T.LongType(), False),
        T.StructField("shard", T.LongType(), False),
        T.StructField("block_seq", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("docs_bin", T.BinaryType(), False),
        T.StructField("tfs_bin", T.BinaryType(), False),
        T.StructField("dls_bin", T.BinaryType(), False),
        T.StructField("max_part", T.DoubleType(), False),
        # per-block Σtf — lets the dictionary (df = Σ n_docs, cf = Σ cf)
        # aggregate the tiny blocks table instead of re-shuffling every
        # token row a second time (SPIMI: the posting write pass already
        # sees each token once; guide §2.4 "remove shuffles outright")
        T.StructField("cf", T.LongType(), False),
    ]
)


@dataclass
class IndexTables:
    tokens: DataFrame | None  # optional stage — queries never read it
    doclens: DataFrame
    dictionary: DataFrame
    stats: DataFrame
    blocks: DataFrame
    # Build metadata carried with the handle so query paths need no
    # out-of-band knowledge: shard_span is the doc-range width (doc →
    # shard is a pure function — filtered WAND and explain need it);
    # analyzer is the content normalization applied at build time, and
    # query-time parsing MUST fold with the SAME analyzer.
    shard_span: int | None = None
    analyzer: str | None = None
    # tokenizer spec ('arrow' | 'jvm' | 'ws') — term vectors re-analyze
    # stored content and must tokenize exactly as the build did
    tokenizer: str | None = None


def apply_analyzer(corpus: DataFrame, analyzer: str | None) -> DataFrame:
    """Apply the CONTENT-level analyzer steps, JVM-side (one
    whole-stage-codegen projection, no Python). ``None`` keeps content
    verbatim (case-preserving — right for source code, where ``Return``
    and ``return`` are different identifiers); ``"lowercase"`` folds
    case like Solr's LowerCaseFilter. Token-level steps (``stop``,
    ``sstem`` — spcht_spark.index.analyze) run inside the tokenizers.
    The SAME spec must be given to parse_query/search at query time
    (Solr runs one analyzer chain at index and query time)."""
    from spcht_spark.index.analyze import content_steps

    if "lowercase" in content_steps(analyzer):  # validates the full spec
        corpus = corpus.withColumn("content", F.lower("content"))
    return corpus


def build_tokens(
    corpus: DataFrame, tokenizer: str = "arrow", analyzer: str | None = None
) -> DataFrame:
    # Underpartitioned input starves the tokenize stage of tasks: a
    # small-but-dense corpus parquet (few files / under
    # maxPartitionBytes splits) yields fewer input partitions than
    # cores, and NOTHING downstream recovers the lost parallelism
    # (mapInPandas preserves partitioning). At 100 TB the scan always
    # has >> cores splits and this guard never fires; the repartition
    # only pays (one corpus shuffle) when the input would otherwise
    # idle most of the cluster.
    try:
        par = corpus.sparkSession.sparkContext.defaultParallelism
        n_in = corpus.rdd.getNumPartitions()
    except Exception:  # Spark Connect: no sparkContext/rdd — skip the guard
        par = n_in = None
    if n_in is not None and n_in < par:
        corpus = corpus.repartition(par * 2)
    corpus = apply_analyzer(corpus, analyzer)
    if tokenizer == "arrow":
        return tokens_arrow(corpus, analyzer)
    if tokenizer == "jvm":
        return tokens_jvm(corpus, analyzer)
    if tokenizer == "ws":
        return tokens_ws(corpus, analyzer)
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def build_doclens(tokens: DataFrame) -> DataFrame:
    # tokens already carry dl (computed in the tokenize pass); dedup to
    # one row per doc. max == the single distinct value, deterministic.
    return tokens.groupBy("doc_id").agg(F.max("dl").alias("dl"))


def build_dictionary(tokens: DataFrame) -> DataFrame:
    return tokens.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    ).withColumn("term_hash", F.xxhash64("term"))


def dictionary_from_blocks(blocks: DataFrame) -> DataFrame:
    """(term, df, cf, term_hash) aggregated from the posting blocks.

    Value-identical to :func:`build_dictionary` (exact integer sums:
    every doc appears in exactly one (term, shard) group, so Σ n_docs
    over a term's blocks IS its df, and the cf lane sums the same tfs),
    but the input is the blocks table — |postings|/128 rows — instead
    of a second full shuffle of every token row."""
    return blocks.groupBy("term").agg(
        F.sum("n_docs").cast("long").alias("df"), F.sum("cf").alias("cf")
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
    avgdl: float,
    shard_span: int = DEFAULT_SHARD_SPAN,
    block_size: int = BLOCK_SIZE,
) -> DataFrame:
    """Compressed posting blocks keyed by (term, doc-range shard).

    ONE wide shuffle on (term, shard) and nothing else: tokens carry dl
    from the tokenize pass, so the former doclens equi-join (the build's
    second-largest exchange at scale) no longer exists."""
    with_dl = tokens.withColumn(
        "shard", (F.col("doc_id") / F.lit(shard_span)).cast("long")
    )

    k1, b = K1, B
    bs = block_size

    def encode_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        # One numpy pass over a run of COMPLETE (term, shard) groups,
        # sorted by (term, shard, doc_id): group bounds via flatnonzero,
        # block bounds derived, one varbyte pass per lane sliced at
        # block starts (varbyte_encode_segments). Bit-identical to the
        # former per-group encode: same doc order, same per-group block
        # boundaries, same delta reset at block starts (pinned by
        # tests/test_index_update's byte-equality contract).
        n = len(pdf)
        terms = pdf["term"].to_numpy()
        shards = pdf["shard"].to_numpy(np.int64)
        docs = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["dl"].to_numpy(np.int64)

        g_change = np.flatnonzero(
            (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
        ) + 1
        g_starts = np.concatenate(([0], g_change))
        g_ends = np.concatenate((g_change, [n]))
        # block starts: per group, every bs-th posting
        blk_starts = np.concatenate(
            [np.arange(s, e, bs) for s, e in zip(g_starts, g_ends)]
        )
        blk_group = np.repeat(
            np.arange(len(g_starts)),
            [(e - s + bs - 1) // bs for s, e in zip(g_starts, g_ends)],
        )
        blk_ends = np.minimum(blk_starts + bs, g_ends[blk_group])

        parts = (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * (dls / avgdl)))
        gaps = np.diff(docs.astype(np.uint64), prepend=np.uint64(0))
        gaps[blk_starts] = docs[blk_starts]  # delta chain resets per block
        docs_bins = varbyte_encode_segments(gaps, blk_starts)
        tfs_bins = varbyte_encode_segments(tfs.astype(np.uint64), blk_starts)
        dls_bins = varbyte_encode_segments(dls.astype(np.uint64), blk_starts)
        seq = np.arange(len(blk_starts), dtype=np.int64)
        first_blk = np.concatenate(([0], np.cumsum(np.bincount(blk_group))))
        return pd.DataFrame(
            {
                "term": terms[blk_starts],
                "term_hash": np.int64(0),
                "shard": shards[blk_starts],
                "block_seq": (seq - first_blk[blk_group]).astype(np.int32),
                "first_doc": docs[blk_starts],
                "last_doc": docs[blk_ends - 1],
                "n_docs": (blk_ends - blk_starts).astype(np.int32),
                "docs_bin": docs_bins,
                "tfs_bin": tfs_bins,
                "dls_bin": dls_bins,
                "max_part": np.maximum.reduceat(parts, blk_starts),
                "cf": np.add.reduceat(tfs, blk_starts),
            }
        )

    def encode_partition(batches):
        # Arrow hands a partition over as MANY small record batches
        # (spark.sql.execution.arrow.maxRecordsPerBatch); a
        # (term, shard) group may span them, and encoding per tiny
        # batch would pay the numpy/pandas call overhead ~per 2k rows.
        # Buffer to ~64k rows, then encode all COMPLETE groups in one
        # pass and carry the trailing (possibly incomplete) group.
        # Memory stays bounded by the buffer + one group (≤ shard_span
        # postings) — the same order as the applyInPandas shape had.
        buf: list[pd.DataFrame] = []
        buffered = 0
        target = 1 << 16

        def drain(final: bool):
            nonlocal buf, buffered
            pdf = buf[0] if len(buf) == 1 else pd.concat(buf, ignore_index=True)
            n = len(pdf)
            if n == 0:
                buf, buffered = [], 0
                return None
            if final:
                buf, buffered = [], 0
                return encode_rows(pdf)
            terms = pdf["term"].to_numpy()
            shards = pdf["shard"].to_numpy(np.int64)
            g_change = np.flatnonzero(
                (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
            ) + 1
            if len(g_change) == 0:
                buf, buffered = [pdf], n  # one (possibly continuing) group
                return None
            cut = int(g_change[-1])  # first row of the final group
            carry = pdf.iloc[cut:].reset_index(drop=True)
            buf, buffered = [carry], len(carry)
            return encode_rows(pdf.iloc[:cut])

        for pdf in batches:
            if len(pdf) == 0:
                continue
            buf.append(pdf)
            buffered += len(pdf)
            if buffered >= target:
                out = drain(final=False)
                if out is not None:
                    yield out
        if buffered:
            out = drain(final=True)
            if out is not None:
                yield out

    # Keyed repartition pinned to the configured shuffle parallelism:
    # AQE coalesces by bytes, but this stage's cost is the Python
    # varbyte encode — on a small-byte token shuffle AQE would collapse
    # it to one task and serialize the encode (same fix as
    # index.wand._pin_groups; guide §2.5). The sort clusters each
    # partition by (term, shard, doc) so the map pass sees every group
    # contiguous and doc-ordered — the same grouping the applyInPandas
    # exchange provided, minus the per-group Python dispatch.
    n_shuffle = int(tokens.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    blocks = (
        with_dl.repartition(n_shuffle, "term", "shard")
        .sortWithinPartitions("term", "shard", "doc_id")
        .mapInPandas(encode_partition, schema=BLOCKS_SCHEMA)
    )
    # term_hash recomputed column-side (cheap, avoids carrying it through
    # the pandas group).
    return blocks.withColumn("term_hash", F.xxhash64("term"))


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    tokenizer: str = "arrow",
    shard_span: int = DEFAULT_SHARD_SPAN,
    analyzer: str | None = None,
) -> IndexTables:
    """In-memory (un-checkpointed) build — the checkpointed, resumable
    variant lives in spcht_spark.plans.indexer.

    Tokens are materialized once (localCheckpoint): doclens, dictionary
    and blocks all branch from them, and without materialization each
    branch would re-run the tokenizer over the full corpus.

    All three checkpoints are LAZY (``eager=False``): an eager
    localCheckpoint is its own driver barrier (a job + scheduling gap,
    ~0.1-0.2 s each at bench scale), while a lazy one materializes as
    part of the FIRST action that needs it — the ``stats.collect()``
    below runs tokenize + doclens + checkpoint-store + the stats agg as
    one job chain, and the blocks checkpoint rides the caller's first
    blocks action. Same passes, same materialized tables, three fewer
    serial barriers per build (event-log audit, OPTIMIZATION_r06.md)."""
    tokens = build_tokens(corpus, tokenizer, analyzer=analyzer).localCheckpoint(
        eager=False
    )
    # doclens is read twice on every build (stats here, and the caller
    # materializes/queries it) — each read otherwise re-aggregates the
    # full token table (a corpus-wide pass, measured ~0.6 s at bench
    # scale). Materialize the narrow (doc_id, dl) table once.
    doclens = build_doclens(tokens).localCheckpoint(eager=False)
    # stats stays a lazy agg over the CHECKPOINTED doclens: every later
    # stats.collect()/count() (each query path does one) is then a tiny
    # agg over the materialized (doc_id, dl) table, not a corpus-wide
    # token re-aggregation. (A createDataFrame([row]) local relation
    # was tried here and measurably REGRESSED the build ~2x on this VM
    # — the per-call python->JVM parallelize path is storm-amplified —
    # interleaved A/B in OPTIMIZATION_r06.md.)
    stats = build_stats(doclens)
    srow = stats.collect()[0]
    # blocks materialize once too: they ARE the index (compressed
    # postings), every query decodes them, and without materialization
    # each downstream action re-runs the whole encode shuffle. The
    # dictionary then aggregates the tiny blocks table (its df/cf ride
    # the cf lane) instead of re-shuffling every token row a second
    # time — one full token pass per build, SPIMI-style.
    blocks = build_blocks(
        tokens, float(srow["avgdl"]), shard_span=shard_span
    ).localCheckpoint(eager=False)
    dictionary = dictionary_from_blocks(blocks)
    return IndexTables(
        tokens, doclens, dictionary, stats, blocks,
        shard_span=shard_span, analyzer=analyzer, tokenizer=tokenizer,
    )
