"""Incremental / streaming ingest (SURVEY.md §2.8 patterns I1, I2)."""
