"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus an index
build+query pass over the synthesized source-code corpus, and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries", "sf", ...}.

Extra keys: ``files_per_sec`` (index-build throughput, the BASELINE.md
headline) and ``corpus_docs``.

Methodology (round-2 VERDICT next-round #6 — this VM's memcg page-fault
storms give identical code a multi-x run-to-run spread, which burned a
round adjudicating a phantom regression): every timing is the MEDIAN of
``SPCHT_BENCH_RUNS`` (default 3) interleaved rounds — q1..qn, q1..qn,
… so a storm hits one whole round, not one query — and the JSON carries
{median, min, max, n} per query in ``queries_spread``. ``queries``
stays name→seconds (the median) for the driver contract; ``value`` is
the sum of medians.
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
    # Solr request-surface over the shared persisted index (SURVEY §2.11).
    # First call per process pays the committed-index open (or, on a cold
    # cache, one build shared by all of them); the warmup below absorbs it.
    "index_boolean_topk",
    "index_facets",
    "index_search_request",
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
    # warm the shared persisted driver index (build once on a cold cache)
    demo_queries._persisted_index(spark, sf_dir)

    n_runs = int(os.environ.get("SPCHT_BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}

    # Index build + reference-query scoring over the synthesized corpus.
    t0 = time.perf_counter()
    corpus = generate_corpus(spark, n_docs=CORPUS_DOCS, partitions=cores * 2).cache()
    corpus.count()
    t_gen = time.perf_counter() - t0

    samples["index_build"] = []
    samples["bm25_refqueries"] = []
    samples["wand_refqueries"] = []
    idx = None
    for _ in range(n_runs):
        # headline queries, one full round (interleaved across rounds)
        for name in HEADLINE:
            fn = demo_queries.QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples[name].append(time.perf_counter() - t0)

        # full index build, every table materialized (≙ committed index)
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
        samples["index_build"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        exact_topk(
            spark, idx.blocks, idx.doclens, idx.dictionary, idx.stats, REFERENCE_QUERIES
        ).collect()
        samples["bm25_refqueries"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        wand_topk(spark, idx.blocks, idx.dictionary, idx.stats, REFERENCE_QUERIES).collect()
        samples["wand_refqueries"].append(time.perf_counter() - t0)

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    timings = {name: round(med(xs), 3) for name, xs in samples.items()}
    spread = {
        name: {
            "median": round(med(xs), 3),
            "min": round(min(xs), 3),
            "max": round(max(xs), 3),
            "n": len(xs),
        }
        for name, xs in samples.items()
    }
    t_build = med(samples["index_build"])

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_spread": spread,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "files_per_sec": round(CORPUS_DOCS / t_build, 2),
                "corpus_docs": CORPUS_DOCS,
                "corpus_gen_sec": round(t_gen, 3),
                "cores": cores,
                "runs": n_runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
