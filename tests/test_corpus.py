"""Corpus determinism + sha256 per-row invariant (BASELINE.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spcht_spark.corpus import check_sha256_invariant, generate_corpus


def test_distributed_matches_local(spark, small_corpus, small_corpus_pd):
    got = small_corpus.orderBy("doc_id").toPandas()
    assert got["content"].tolist() == small_corpus_pd["content"].tolist()
    assert got["content_sha256"].tolist() == small_corpus_pd["content_sha256"].tolist()
    assert got["repo"].tolist() == small_corpus_pd["repo"].tolist()


def test_partition_invariance(spark):
    a = generate_corpus(spark, n_docs=50, max_lines=20, partitions=1).orderBy("doc_id").toPandas()
    b = generate_corpus(spark, n_docs=50, max_lines=20, partitions=7).orderBy("doc_id").toPandas()
    assert a["content_sha256"].tolist() == b["content_sha256"].tolist()


def test_sha256_invariant(small_corpus):
    assert check_sha256_invariant(small_corpus) == 0


def test_shape(small_corpus):
    row = small_corpus.filter(F.col("doc_id") == 3).collect()[0]
    assert len(row["commit"]) == 40
    assert row["lang"] in {"python", "java", "js", "go", "rust", "c", "md"}
    assert row["path"].startswith("src/")
