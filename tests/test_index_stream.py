"""Streaming index maintenance: a file-source stream of doc deltas
drives the committed index through foreachBatch incremental merges, and
the result equals a full rebuild regardless of micro-batch boundaries
(the update engine's byte-identity contract, batch-split-independent).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spcht_spark.index.build import build_index

SPAN = 64

DELTA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("op", T.StringType(), False),
    ]
)


def _canon(df, keys):
    pdf = df.toPandas()
    return pdf.sort_values(keys).reset_index(drop=True)[sorted(pdf.columns)]


def _assert_index_equal(full, got):
    for name, keys in [
        ("doclens", ["doc_id"]),
        ("dictionary", ["term"]),
        ("stats", ["n_docs"]),
        ("blocks", ["term", "shard", "block_seq"]),
    ]:
        a = _canon(getattr(full, name), keys)
        b = _canon(getattr(got, name), keys)
        assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
        for col in a.columns:
            av, bv = a[col], b[col]
            if av.dtype.kind == "f":
                assert (av.to_numpy() == bv.to_numpy()).all(), f"{name}.{col}"
            else:
                assert av.equals(bv), f"{name}.{col}"


def test_stream_index_updates_equals_full_rebuild(spark, small_corpus, tmp_path):
    from spcht_spark.plans.indexer import index_order, load_index, run_index_order
    from spcht_spark.streaming.index_stream import stream_index_updates

    final = small_corpus.filter(F.col("doc_id") < 120)
    # base: docs 100-119 missing (inserts), 0-9 truncated (updates),
    # plus 5 doomed docs to be deleted by the stream
    doomed = spark.createDataFrame(
        [
            (2000 + i, "org0/doomed", f"tmp/d{i}.py", "c" * 40, "python",
             f"return doomed{i} {{ }} import ;", "")
            for i in range(5)
        ],
        small_corpus.schema,
    )
    base = (
        final.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 100))
        .unionByName(
            final.filter(F.col("doc_id") < 10).withColumn(
                "content", F.substring("content", 1, 20)
            )
        )
        .unionByName(doomed)
    )
    workdir = str(tmp_path / "idx")
    run_index_order(
        spark,
        index_order(workdir, "s-base", lambda s: base, shard_span=SPAN,
                    verify_sha256=False),
    )

    # the delta FEED: two files → two micro-batches (maxFilesPerTrigger=1)
    feed = tmp_path / "feed"
    feed.mkdir()
    upserts = [
        {"doc_id": int(r["doc_id"]), "content": r["content"], "op": "upsert"}
        for r in final.filter(
            (F.col("doc_id") < 10) | (F.col("doc_id") >= 100)
        ).select("doc_id", "content").collect()
    ]
    deletes = [{"doc_id": 2000 + i, "content": None, "op": "delete"} for i in range(5)]
    with open(feed / "batch0.json", "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in upserts))
    with open(feed / "batch1.json", "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in deletes))

    deltas = (
        spark.readStream.schema(DELTA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q = stream_index_updates(
        deltas, workdir, str(tmp_path / "ckpt"), shard_span=SPAN,
    )
    q.awaitTermination(300)

    got = load_index(spark, workdir)
    fullb = build_index(spark, final, shard_span=SPAN)
    _assert_index_equal(fullb, got)

    with open(os.path.join(workdir, "manifest.json")) as fh:
        m = json.load(fh)
    runs = [u["run_id"] for u in m["updates"]]
    assert runs == ["stream-batch-0", "stream-batch-1"]


PERC_QS = [
    ("sq_ri", "return AND import"),
    ("sq_not", "NOT return"),
    ("sq_mix", "(if OR else) AND -while"),
]


def test_percolate_stream_equals_batch(spark, small_corpus, tmp_path):
    """Percolation is a stateless projection: the same standing-query
    set over a file stream (2 micro-batches) emits exactly the batch
    percolate's (doc_id, query_id) set."""
    from spcht_spark.index.percolate import percolate, percolate_stream

    docs = small_corpus.filter(F.col("doc_id") < 80).select("doc_id", "content")
    want = {
        (r["doc_id"], r["query_id"])
        for r in percolate(docs, PERC_QS).collect()
    }
    assert want and any(q == "sq_not" for _, q in want)  # negatives legal

    feed = tmp_path / "pfeed"
    feed.mkdir()
    rows = docs.collect()
    for i, half in enumerate((rows[:40], rows[40:])):
        with open(feed / f"b{i}.json", "w") as fh:
            fh.write("\n".join(
                json.dumps({"doc_id": r["doc_id"], "content": r["content"]})
                for r in half
            ))
    stream = (
        spark.readStream.schema("doc_id long, content string")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    out = percolate_stream(stream, PERC_QS)
    q = (
        out.writeStream.format("memory")
        .queryName("perc_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.sql("SELECT * FROM perc_out").collect()
    }
    assert got == want


def test_percolate_analyzer_folds_both_sides(spark):
    """With the lowercase,stop,sstem chain, doc tokens and query terms
    fold through ONE chain: 'Spark' matches query 'sparks' (s-stem),
    stopwords match nothing."""
    from spcht_spark.index.percolate import percolate

    docs = spark.createDataFrame(
        [(1, "Spark Joins THE pipeline"), (2, "nothing relevant")],
        ["doc_id", "content"],
    )
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(
            docs, [("a", "sparks"), ("b", "JOIN"), ("c", "the")],
            analyzer="lowercase,stop,sstem",
        ).collect()
    }
    assert (1, "a") in got and (1, "b") in got
    assert all(q != "c" for _, q in got)  # stopword clause matches nothing
