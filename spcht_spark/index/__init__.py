"""PySpark-native fulltext index + BM25 query engine.

Replaces the reference's upstream Apache Solr (queried, never implemented,
at /root/reference/Spcht/Core/WorkOrder.py:635-780) with a from-scratch
Spark pipeline:

    ingest → tokenize (Arrow UDF) → (doc,term) tf → salted posting build
    → delta+varbyte blocks with block-max scores → dictionary + stats
    → top-k BM25 (exact or block-max WAND)
"""
