"""Input connectors: Solr-JSON envelope (S2), MARC21 binary records
(S5), and parquet/"Iceberg-style" catalog helpers (S1)."""
