"""Table catalog adapter: Iceberg when the runtime ships it, partitioned
parquet otherwise.

The north-rule source is "an Iceberg table of source-code repositories"
(BASELINE.json). Iceberg is a *format provider*, not a query model — the
DataFrame plan (scan → filter/prune → shuffle) is identical either way,
which is why everything downstream takes a plain DataFrame. This module
is the one place that knows which provider to use:

* with the Iceberg runtime on the classpath (a real cluster):
  ``read_table``/``write_table`` target ``format("iceberg")`` table
  identifiers, keeping hidden-partition pruning and snapshot reads;
* in this sandbox (no Iceberg jar, documented in TESTDATA.md): the same
  calls fall back to partitioned parquet paths — the scan properties the
  engine relies on (column pruning, predicate pushdown, partition
  pruning on the partition_by columns) hold identically.

Nothing else in the repo imports Spark's format strings directly, so
swapping providers is this module only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Memo keyed per JVM (SparkContext id): a process may run several
# sessions with different classpaths, and a call before any session
# exists must not pin the answer forever (the round-2 lru_cache bug).
_ICEBERG_MEMO: dict[int, bool] = {}


def iceberg_available() -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    key = id(spark.sparkContext)
    hit = _ICEBERG_MEMO.get(key)
    if hit is not None:
        return hit
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        found = True
    except Exception:  # noqa: BLE001 — Py4J wraps ClassNotFound opaquely
        found = False
    _ICEBERG_MEMO[key] = found
    return found


def table_format(fmt: str | None = None) -> str:
    """Resolve the provider: explicit > iceberg-if-available > parquet."""
    if fmt:
        return fmt
    return "iceberg" if iceberg_available() else "parquet"


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    fmt: str | None = None,
) -> None:
    """Write ``df`` as a table. ``target`` is an Iceberg identifier
    (catalog.db.table) under Iceberg, a directory path under parquet."""
    fmt = table_format(fmt)
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "iceberg":
        w.saveAsTable(target)
    else:
        w.save(target)


def read_table(spark: SparkSession, target: str, fmt: str | None = None) -> DataFrame:
    """Read a table written by :func:`write_table` (scan shape identical
    across providers; only pruning metadata differs)."""
    fmt = table_format(fmt)
    if fmt == "iceberg":
        return spark.read.format("iceberg").table(target)
    return spark.read.format(fmt).load(target)
