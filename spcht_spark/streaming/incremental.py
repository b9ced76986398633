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


SESSION_OUT_SCHEMA = "user_id BIGINT, session_start BIGINT, session_end BIGINT, n_events BIGINT"
_SESSION_STATE_SCHEMA = "start BIGINT, last BIGINT, n BIGINT"


def stream_sessionize(
    events,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    timeout: str = "processing",
):
    """Custom STATEFUL streaming operator (applyInPandasWithState): gap
    sessionization over an event stream. Per-key state carries the open
    session (start, last_ts, n_events); a batch's events merge into it
    vectorized (one sort + one diff per key-batch, no per-row Python
    conditionals), closed sessions are emitted as soon as a gap proves
    them closed, and a ProcessingTimeTimeout flushes a key's open
    session when the stream goes quiet. This is the streaming twin of
    the batch q_sessionize_events (same gap rule), covering the
    SURVEY §2.8 custom-stateful row — the shape Spark's built-in
    session_window cannot express once per-session logic grows state
    beyond counts.

    ``timeout="processing"`` (default, long-running streams) flushes
    idle keys; pass ``timeout="none"`` for bounded availableNow /
    catch-up runs — with a timeout registered, availableNow keeps
    scheduling empty micro-batches waiting for timers and never
    terminates (measured: 60+ empty epochs on a 2-file source)."""
    import pandas as pd  # local: keep the module import-light for driver-only use
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    use_timeout = timeout == "processing"
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if use_timeout
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        (user_id,) = key
        out: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                out.append((user_id, start, last, n))
            state.remove()
        else:
            parts = [pdf[ts_col] for pdf in pdfs]
            ts = (
                pd.concat(parts).astype("int64").sort_values().to_numpy()
                if parts
                else np.array([], dtype="int64")
            )
            if len(ts) and state.exists:
                # Late-data policy (a watermark in state form): events
                # older than the carried session's last ts are dropped,
                # exactly as a withWatermark would have dropped them —
                # otherwise a late event could regress session_end or
                # re-open an already-emitted closed session, diverging
                # from the batch twin (which sees all events in order).
                ts = ts[ts >= state.get[1]]
            if len(ts):
                # split the batch into gap-delimited segments
                breaks = np.flatnonzero(np.diff(ts) > gap_seconds) + 1
                bounds = [0, *breaks.tolist(), len(ts)]
                segs = [
                    (int(ts[s]), int(ts[e - 1]), e - s)
                    for s, e in zip(bounds[:-1], bounds[1:])
                    if e > s
                ]
                # merge the carried open session with the first segment,
                # or close it if the batch starts past the gap
                if state.exists:
                    cs, cl, cn = state.get
                    if segs and segs[0][0] - cl <= gap_seconds:
                        segs[0] = (cs, segs[0][1], cn + segs[0][2])
                    else:
                        out.append((user_id, cs, cl, cn))
                # every segment but the last is proven closed by a gap
                out.extend((user_id, *sg) for sg in segs[:-1])
                state.update(tuple(int(x) for x in segs[-1]))
            if use_timeout:
                state.setTimeoutDuration(gap_seconds * 1000)

        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_start", "session_end", "n_events"]
            )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )


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
