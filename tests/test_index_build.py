"""Index build: tokenizer equivalence, codec round-trip, block layout."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spcht_spark.index.build import build_index
from spcht_spark.index.compress import (
    decode_postings_block,
    encode_postings_block,
    varbyte_decode,
    varbyte_encode,
)
from spcht_spark.index.query import decode_blocks
from spcht_spark.index.tokenize import tokens_arrow, tokens_jvm
from spcht_spark.oracle import Bm25Oracle


def test_varbyte_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(5):
        arr = rng.integers(0, 2**45, size=500).astype(np.uint64)
        assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)
    assert np.array_equal(varbyte_decode(varbyte_encode(np.array([0], dtype=np.uint64))), [0])
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""


def test_postings_block_roundtrip():
    docs = np.array([3, 17, 18, 900, 12345], dtype=np.int64)
    tfs = np.array([1, 5, 2, 1, 9], dtype=np.int64)
    db, tb = encode_postings_block(docs, tfs)
    d2, t2 = decode_postings_block(db, tb)
    assert np.array_equal(d2.astype(np.int64), docs)
    assert np.array_equal(t2.astype(np.int64), tfs)


def test_tokenizers_agree(spark, small_corpus):
    a = tokens_arrow(small_corpus).orderBy("doc_id", "term").toPandas()
    j = tokens_jvm(small_corpus).orderBy("doc_id", "term").toPandas()
    assert a.equals(j)


def test_tokens_match_oracle(spark, small_corpus, small_corpus_pd):
    oracle = Bm25Oracle(small_corpus_pd)
    got = tokens_arrow(small_corpus).toPandas()
    tf_map = {(int(r.doc_id), r.term): int(r.tf) for r in got.itertuples()}
    want = {
        (doc, t): tf for doc, c in oracle.tf.items() for t, tf in c.items()
    }
    assert tf_map == want


def test_blocks_cover_all_postings(spark, small_index, small_corpus_pd):
    # Tiny shard_span forces hot terms across many shards — decoded blocks
    # must equal the token table exactly, with disjoint ordered doc ranges.
    idx = small_index
    dec = decode_blocks(idx.blocks).orderBy("term", "doc_id").toPandas()
    tok = idx.tokens.orderBy("term", "doc_id").toPandas()
    assert dec[["term", "doc_id", "tf"]].reset_index(drop=True).equals(
        tok[["term", "doc_id", "tf"]].reset_index(drop=True)
    )
    sharded = idx.blocks.groupBy("term").agg(F.countDistinct("shard").alias("s")).toPandas()
    assert (sharded["s"] > 1).any(), "expected hot terms to span multiple shards"
    # doc-range sharding: per term, (shard, block_seq) order == doc order
    b = idx.blocks.orderBy("term", "shard", "block_seq").toPandas()
    for term, grp in b.groupby("term"):
        lasts = grp["last_doc"].to_numpy()
        firsts = grp["first_doc"].to_numpy()
        assert (firsts[1:] > lasts[:-1]).all(), f"overlapping blocks for {term}"
