"""Reproducible sampling for training-data pipelines.

Web-scale corpus curation samples per-source ("temperature" mixing,
e.g. upweight code, downweight boilerplate crawl) and MUST be
reproducible run-to-run and machine-to-machine — RNG-state sampling
(``df.sample``/``sampleBy``) depends on partitioning and Spark
version, so pipelines standardize on CONTENT-KEYED hash sampling: a
doc is in the sample iff h(key, salt) < rate, independent of
partition layout, cluster size, or execution order.

Spark-first: the hash is ``md5`` (a JVM builtin with a bit-identical
DuckDB twin, so the op is oracle-able end-to-end) — the first 8 hex
chars as a uniform 32-bit draw. Everything is one whole-stage-codegen
projection + filter; no shuffle, no RNG state, trivially correct
under retries/speculative execution (the same row always draws the
same number).

Reference scope: the reference delegates sampling to its Solr `rows`
cap (Spcht/Core/WorkOrder.py:693 fetches pages, never samples);
corpus-curation sampling is part of the training-data op set this
engine adds on top (SURVEY.md training-data ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^8 — the draw is the first 8 md5 hex chars as an integer
_DRAW_SPACE = float(1 << 32)


def hash_draw(key: Column, salt: str = "") -> Column:
    """Uniform [0,1) draw keyed on (key, salt) — md5-based, identical
    in Spark and ANSI SQL (``conv(substr(md5(..),1,8),16,10)``)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
        _DRAW_SPACE
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's rate: row survives iff
    ``hash_draw(key, salt) < rates[stratum]``. Strata absent from
    ``rates`` get ``default_rate`` (0 = drop, Solr-less sources
    excluded by default). Deterministic: same (key, salt) → same
    decision forever, so incremental re-runs and resumed pipelines
    sample consistently.

    The rate lookup is a literal map (broadcast-free); the whole op is
    a single projection+filter — at 10^12 rows it is exactly one scan.
    """
    rate_map = F.create_map(
        *[
            x
            for k, v in sorted(rates.items())
            for x in (F.lit(k), F.lit(float(v)))
        ]
    )
    rate = F.coalesce(
        rate_map[F.col(strata_col).cast("string")], F.lit(float(default_rate))
    )
    return df.filter(hash_draw(F.col(key_col), salt) < rate)


def stratum_quantiles(
    df: DataFrame,
    strata_col: str,
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """Exact continuous quantiles of ``value_col`` per stratum —
    (stratum, q, v). Corpus curation gates on per-source length/quality
    distributions (e.g. drop sources whose p50 doc length collapses);
    ``percentile`` is Spark's exact interpolated quantile, identical to
    DuckDB/Postgres ``quantile_cont``/``percentile_cont``, so the op
    is value-oracle-able. One partial-agg shuffle on the stratum key;
    for an approximate single-pass variant at extreme cardinality use
    ``percentile_approx`` (not oracle-able bit-exactly, by design)."""
    aggs = [
        F.expr(f"percentile({value_col}, {q})").alias(f"_q{i}")
        for i, q in enumerate(qs)
    ]
    wide = df.groupBy(F.col(strata_col).cast("string").alias("stratum")).agg(
        *aggs
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("q"), F.col(f"_q{i}").alias("v")
            )
            for i, q in enumerate(qs)
        ]
    )
    return (
        wide.select("stratum", F.explode(pairs).alias("p"))
        .select("stratum", F.col("p.q").alias("q"), F.col("p.v").alias("v"))
    )
