"""Incremental ingest patterns.

I1 — max_age delta fetch: the reference rewrites update orders into a
Solr range query ``last_indexed:[now-max_age TO *]``
(/root/reference/Spcht/Core/WorkOrder.py:702-707). Batch equivalent:
timestamp-watermark filter pushed into the scan; streaming equivalent:
Structured Streaming file source + event-time watermark.

I2 — poll-diff-update (CDC): the reference re-crawls and compares a
sha1 per entity to decide changed/new/deleted
(/root/reference/Spcht/foliotools/foliotools.py:167-201, hashing
:67-96). Columnar: sha2 row-hash + full-outer join of snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def max_age_filter(df: DataFrame, ts_col: str, now: str, max_age_minutes: int) -> DataFrame:
    """I1 batch: rows newer than now - max_age (predicate pushes to the
    scan; with a partitioned table this is partition pruning)."""
    cutoff = F.to_timestamp(F.lit(now)) - F.expr(f"INTERVAL {max_age_minutes} MINUTES")
    return df.filter(F.col(ts_col) >= cutoff)


def row_digest(df: DataFrame, cols: list[str]) -> DataFrame:
    """sha2 over the concatenated business columns (sha1-per-entity
    parity; sha2 chosen per BASELINE input_hint)."""
    return df.withColumn(
        "_digest", F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]), 256)
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, cols: list[str]
) -> DataFrame:
    """I2 CDC: (key, change ∈ added|changed|removed|unchanged).
    One full-outer join on the key — the columnar replacement for the
    reference's per-entity hash compare loop."""
    o = row_digest(old, cols).select(F.col(key).alias("k"), F.col("_digest").alias("od"))
    n = row_digest(new, cols).select(F.col(key).alias("k"), F.col("_digest").alias("nd"))
    joined = o.join(n, "k", "full_outer")
    return joined.select(
        F.col("k").alias(key),
        F.when(F.col("od").isNull(), F.lit("added"))
        .when(F.col("nd").isNull(), F.lit("removed"))
        .when(F.col("od") != F.col("nd"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )


def apply_cdc(
    current: DataFrame, new: DataFrame, key: str, cols: list[str]
) -> DataFrame:
    """Merge semantics over parquet-backed tables (Iceberg MERGE INTO
    equivalent): upsert new/changed, drop removed — expressed as an
    anti-join + union (J3 delete-purge parity: the reference deletes
    every incoming subject then reinserts, WorkOrder.py:875-942)."""
    kept = current.join(new.select(key), key, "left_anti")
    return kept.unionByName(new)


def stream_events_windowed(
    spark: SparkSession,
    source_dir: str,
    schema,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
):
    """I1 streaming: file-source readStream → event-time tumbling-window
    counts with late-data watermark. Returns the streaming DataFrame —
    caller attaches a sink (tests use availableNow + memory sink)."""
    stream = spark.readStream.schema(schema).json(source_dir)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n"),
        )
    )
