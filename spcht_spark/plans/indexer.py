"""The index-build work order: ingest → tokens → doclens → dictionary →
stats → blocks, each a checkpointed parquet stage with lineage/metrics
(the rebuild of the reference's --FullOrder ladder, SURVEY.md §3.1, over
the new engine's stages §3.4)."""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spcht_spark.corpus import check_sha256_invariant
from spcht_spark.index.build import (
    DEFAULT_SHARD_SPAN,
    IndexTables,
    build_blocks,
    build_dictionary,
    build_doclens,
    build_stats,
    build_tokens,
)
from spcht_spark.plans.workorder import Stage, WorkOrder, create_order, run_order

FINAL_STAGES = {"doclens", "dictionary", "stats", "blocks"}


def index_order(
    workdir: str,
    run_id: str,
    corpus_source: Callable[[SparkSession], DataFrame],
    tokenizer: str = "arrow",
    shard_span: int = DEFAULT_SHARD_SPAN,
    blocks_partitions: int | None = None,
    clock: Callable[[], float] = time.time,
    verify_sha256: bool = True,
) -> WorkOrder:
    def ingest(spark: SparkSession, outs) -> DataFrame:
        df = corpus_source(spark)
        if verify_sha256:
            bad = check_sha256_invariant(df)
            if bad:
                raise ValueError(f"sha256 invariant violated on {bad} rows")
        return df

    def tokens(spark, outs):
        return build_tokens(outs["ingest"], tokenizer)

    def doclens(spark, outs):
        return build_doclens(outs["tokens"])

    def dictionary(spark, outs):
        return build_dictionary(outs["tokens"])

    def stats(spark, outs):
        return build_stats(outs["doclens"])

    def blocks(spark, outs):
        avgdl = float(outs["stats"].collect()[0]["avgdl"])
        return build_blocks(outs["tokens"], outs["doclens"], avgdl, shard_span=shard_span)

    stages = [
        Stage("ingest", ingest),
        Stage("tokens", tokens),
        Stage("doclens", doclens),
        Stage("dictionary", dictionary, sort_cols=["term"]),
        Stage("stats", stats),
        # blocks sorted by term within partitions → parquet row-group
        # min/max stats prune the per-query `term IN (...)` scan.
        Stage(
            "blocks", blocks, sort_cols=["term", "shard", "block_seq"],
            repartition=blocks_partitions,
        ),
    ]
    return create_order(workdir, run_id, stages, clock)


def run_index_order(spark: SparkSession, order: WorkOrder) -> IndexTables:
    outs = run_order(spark, order)
    return IndexTables(
        tokens=outs["tokens"],
        doclens=outs["doclens"],
        dictionary=outs["dictionary"],
        stats=outs["stats"],
        blocks=outs["blocks"],
    )


def load_index(spark: SparkSession, workdir: str) -> IndexTables:
    """Open a committed index (resume-free read path)."""
    rd = lambda s: spark.read.parquet(f"{workdir}/{s}")
    return IndexTables(
        tokens=rd("tokens"),
        doclens=rd("doclens"),
        dictionary=rd("dictionary"),
        stats=rd("stats"),
        blocks=rd("blocks"),
    )
