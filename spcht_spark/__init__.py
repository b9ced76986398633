"""spcht_spark — a PySpark-native analytics engine with the capabilities of
jpkanter/Spcht (reference at /root/reference, read-only).

Two halves, mirroring the reference's architecture split (SURVEY.md):

1. ``spcht_spark.index`` — a from-scratch PySpark fulltext index + BM25
   query engine replacing Spcht's upstream Apache Solr dependency
   (reference issues queries at Spcht/Core/WorkOrder.py:693 and never
   implements retrieval itself).  SPIMI-style posting construction,
   salted term-hash shuffle for Zipfian skew, delta+varbyte compressed
   posting blocks with block-max scores, top-k BM25 via block-max WAND.

2. ``spcht_spark.descriptor`` — the Spcht Descriptor Format (per-record
   field→triple mapping engine, reference Spcht/Core/SpchtCore.py)
   re-expressed as a compile-once DataFrame select/explode pipeline:
   descriptor JSON → Column expression tree → Catalyst.

Plus ``spcht_spark.functions`` (large-scale training-data ops: dedup,
similarity search, text analysis), ``spcht_spark.sources`` (Solr-JSON
envelope parity, parquet/"Iceberg-style" catalog), ``spcht_spark.plans``
(work-order ladder: checkpointed stages, lineage + metrics, resume) and
``spcht_spark.streaming`` (incremental/watermark ingest).
"""

__version__ = "0.1.0"
