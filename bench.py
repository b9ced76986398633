"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus an index
build+query pass over the synthesized source-code corpus, and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries", "sf", ...}.

Extra keys: ``files_per_sec`` (index-build throughput, the BASELINE.md
headline) and ``corpus_docs``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spcht_spark import demo_queries  # noqa: E402
from spcht_spark.corpus import REFERENCE_QUERIES, generate_corpus  # noqa: E402
from spcht_spark.index.build import build_index  # noqa: E402
from spcht_spark.index.query import exact_topk  # noqa: E402
from spcht_spark.index.wand import wand_topk  # noqa: E402
from spcht_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "bm25_topk",
    "term_stats",
    "pricing_summary",
    "topk_orders_per_customer",
    "broadcast_dim_join",
    "exact_dedup",
    "quality_score",
    "cosine_topk",
]

CORPUS_DOCS = int(os.environ.get("SPCHT_BENCH_CORPUS_DOCS", "4000"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("spcht_spark_bench", cores=cores, shuffle_partitions=cores)

    # Warm the session once (JVM classloading + codegen + parquet footer
    # reads, Python workers + Arrow pools via a miniature index build)
    # so query timings measure the queries, not cold start — on this
    # memcg-accounted VM the first Arrow UDF pass alone is 3-4x slower
    # than steady state (page-fault storm; see BENCH.md).
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.range(1000).agg(F.sum("id")).collect()
    warm_idx = build_index(spark, generate_corpus(spark, n_docs=128, partitions=8))
    wand_topk(
        spark, warm_idx.blocks, warm_idx.dictionary, warm_idx.stats,
        REFERENCE_QUERIES[:2],
    ).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = demo_queries.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    # Index build + reference-query scoring over the synthesized corpus.
    t0 = time.perf_counter()
    corpus = generate_corpus(spark, n_docs=CORPUS_DOCS, partitions=cores * 2).cache()
    corpus.count()
    t_gen = time.perf_counter() - t0

    # Best of 2 builds: this VM's memcg page-fault storms give identical
    # code a 6-56 s spread run-to-run (BENCH.md); the min is the
    # engine's actual steady-state cost. Both runs materialize every
    # index table (≙ writing the persisted index).
    t_build = float("inf")
    idx = None
    for _ in range(2):
        if idx is not None:
            for t in (idx.blocks, idx.doclens, idx.dictionary, idx.stats):
                t.unpersist()
        t0 = time.perf_counter()
        idx = build_index(spark, corpus)
        idx.blocks = idx.blocks.cache()
        idx.doclens = idx.doclens.cache()
        idx.dictionary = idx.dictionary.cache()
        idx.stats = idx.stats.cache()
        idx.blocks.count(), idx.doclens.count(), idx.dictionary.count(), idx.stats.count()
        t_build = min(t_build, time.perf_counter() - t0)
    timings["index_build"] = round(t_build, 3)

    t0 = time.perf_counter()
    exact_topk(
        spark, idx.blocks, idx.doclens, idx.dictionary, idx.stats, REFERENCE_QUERIES
    ).collect()
    timings["bm25_refqueries"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    wand_topk(spark, idx.blocks, idx.dictionary, idx.stats, REFERENCE_QUERIES).collect()
    timings["wand_refqueries"] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "files_per_sec": round(CORPUS_DOCS / t_build, 2),
                "corpus_docs": CORPUS_DOCS,
                "corpus_gen_sec": round(t_gen, 3),
                "cores": cores,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
