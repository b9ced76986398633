"""Solr-envelope source, MARC21 parser, incremental/streaming patterns."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spcht_spark.descriptor import compile_descriptor
from spcht_spark.sources.marc import FS, RS, SS, parse_marc_record, with_parsed_marc
from spcht_spark.sources.solr_json import SolrStatusError, read_solr_envelope
from spcht_spark.streaming.incremental import (
    apply_cdc,
    max_age_filter,
    snapshot_diff,
    stream_events_windowed,
)


# ---------------------------------------------------------------- MARC21

def build_marc(fields) -> str:
    """Minimal valid ISO-2709/MARC21 record for tests.

    fields: [(tag, value)] for control fields (tag < '010'),
            [(tag, ind1, ind2, [(code, val), ...])] for data fields."""
    datas, entries, pos = [], [], 0
    for f in fields:
        if len(f) == 2:
            tag, value = f
            data = value + FS
        else:
            tag, i1, i2, subs = f
            data = i1 + i2 + "".join(SS + c + v for c, v in subs) + FS
        entries.append(f"{int(tag):03d}{len(data):04d}{pos:05d}")
        datas.append(data)
        pos += len(data)
    directory = "".join(entries) + FS
    base = 24 + len(directory)
    total = base + pos + 1
    leader = f"{total:05d}nam a22{base:05d}   4500"
    assert len(leader) == 24
    return leader + directory + "".join(datas) + RS


MARC_FIELDS = [
    ("001", "0-123456789"),
    ("100", "1", " ", [("a", "Some Author"), ("d", "1901-1980")]),
    ("951", " ", " ", [("a", "BO")]),
    ("951", " ", " ", [("a", "MV")]),
]


def test_parse_marc_record():
    rec = build_marc(MARC_FIELDS)
    rows = parse_marc_record(rec)
    vals = {}
    for tag, _i1, _i2, sub, val in rows:
        vals.setdefault((tag, sub), []).append(val)
    assert vals[(1, "none")] == ["0-123456789"]
    assert vals[(100, "a")] == ["Some Author"]
    assert vals[(100, "d")] == ["1901-1980"]
    assert vals[(951, "a")] == ["BO", "MV"]  # repeatable field
    assert vals[(100, "i1")] == ["1"]


def test_catalog_parquet_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from spcht_spark.sources.catalog import read_table, table_format, write_table

    assert table_format() == "parquet"  # sandbox ships no Iceberg jar
    assert table_format("iceberg") == "iceberg"  # explicit override wins
    df = spark.range(10).withColumn("p", (F.col("id") % 2).cast("int"))
    write_table(df, str(tmp_path / "t"), partition_by=["p"])
    back = read_table(spark, str(tmp_path / "t"))
    assert back.count() == 10
    pruned = back.filter(F.col("p") == 1)
    assert pruned.count() == 5
    # the partition predicate must prune at the scan, not post-filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "(p" in plan


def test_parse_marc_record_non_ascii():
    # ISO 2709 lengths/offsets are BYTE counts: umlauts in one field must
    # not shift the slicing of every later field (module build_marc_record
    # emits byte-correct directories; parse must consume them as bytes).
    from spcht_spark.sources.marc import build_marc_record

    rec = build_marc_record([
        ("001", "0-ïd"),
        ("100", "1", " ", [("a", "Müller, Jürgen"), ("d", "1901–1980")]),
        ("245", "0", "0", [("a", "Straße über Köln"), ("b", "中文テスト")]),
        ("951", " ", " ", [("a", "BO")]),
    ])
    vals = {}
    for tag, _i1, _i2, sub, val in parse_marc_record(rec):
        vals.setdefault((tag, sub), []).append(val)
    assert vals[(1, "none")] == ["0-ïd"]
    assert vals[(100, "a")] == ["Müller, Jürgen"]
    assert vals[(100, "d")] == ["1901–1980"]
    assert vals[(245, "a")] == ["Straße über Köln"]
    assert vals[(245, "b")] == ["中文テスト"]
    assert vals[(951, "a")] == ["BO"]  # field AFTER the multi-byte ones


def test_marc_fix_escaped_controls():
    rec = build_marc(MARC_FIELDS)
    escaped = rec.replace(FS, "#30;").replace(SS, "#31;").replace(RS, "#29;")
    assert parse_marc_record(escaped) == parse_marc_record(rec)


def test_descriptor_marc_source(spark):
    rec = build_marc(MARC_FIELDS)
    df = spark.createDataFrame([("r1", rec)], ["id", "fullrecord"])
    desc = {
        "id_source": "dict", "id_field": "id",
        "nodes": [
            {"field": "951:a", "source": "marc", "predicate": "has:951a",
             "required": "optional"},
            {"field": "100:a", "source": "marc", "predicate": "has:author",
             "required": "optional"},
            {"field": "001:none", "source": "marc", "predicate": "has:cnum",
             "required": "optional"},
        ],
    }
    out = compile_descriptor(desc, df, subject_prefix="s:")
    got = [(r["predicate"], r["object"]) for r in out.collect()]
    assert got == [
        ("has:951a", "BO"), ("has:951a", "MV"),
        ("has:author", "Some Author"),
        ("has:cnum", "0-123456789"),
    ]


def test_with_parsed_marc_batch(spark):
    recs = [(i, build_marc(MARC_FIELDS)) for i in range(10)] + [(99, None)]
    df = spark.createDataFrame(recs, ["id", "fullrecord"])
    parsed = with_parsed_marc(df)
    assert parsed.filter(F.size("_marc") > 0).count() == 10
    assert parsed.filter(F.col("id") == 99).select(F.size("_marc")).collect()[0][0] == 0


# ------------------------------------------------------------- Solr JSON

def test_solr_envelope(spark, tmp_path):
    env = {
        "responseHeader": {"status": 0, "QTime": 3},
        "response": {
            "numFound": 2, "start": 0,
            "docs": [{"id": "a", "title": "t1"}, {"id": "b", "title": "t2"}],
        },
    }
    p = tmp_path / "chunk.json"
    p.write_text(json.dumps(env))
    docs = read_solr_envelope(spark, str(p))
    assert sorted(r["id"] for r in docs.collect()) == ["a", "b"]

    bad = dict(env, responseHeader={"status": 400})
    p2 = tmp_path / "bad.json"
    p2.write_text(json.dumps(bad))
    with pytest.raises(SolrStatusError):
        read_solr_envelope(spark, str(p2))


# ------------------------------------------------------------ incremental

def test_max_age_filter(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    hi = ev.agg(F.max("ts")).collect()[0][0]
    recent = max_age_filter(ev, "ts", str(hi), 60)
    assert 0 < recent.count() < ev.count()


def test_snapshot_diff_and_apply(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)], ["k", "name", "v"]
    )
    diff = {r["k"]: r["change"] for r in snapshot_diff(old, new, "k", ["name", "v"]).collect()}
    assert diff == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}

    merged = apply_cdc(old, new, "k", ["name", "v"]).orderBy("k").collect()
    assert [(r["k"], r["v"]) for r in merged] == [(1, 10.0), (2, 20.0), (3, 99.0), (4, 40.0)]
    # note: apply_cdc alone upserts; dropping 'removed' keys would chain
    # a join against snapshot_diff(change='removed') — exercised above.


# --------------------------------------------------- structured streaming

def test_stream_sessionize_stateful(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): gap sessions
    must merge across micro-batches through the per-key state, and each
    closed session must match the batch gap rule exactly."""
    from spcht_spark.streaming.incremental import stream_sessionize

    src = tmp_path / "sess_src"
    src.mkdir()
    # session A for user 1 spans the two files → carried-state merge
    f1 = [{"user_id": 1, "ts": 0}, {"user_id": 1, "ts": 100},
          {"user_id": 2, "ts": 50}]
    f2 = [{"user_id": 1, "ts": 200}, {"user_id": 1, "ts": 5000},
          {"user_id": 1, "ts": 5100}, {"user_id": 1, "ts": 20000},
          {"user_id": 2, "ts": 10000}]
    import os

    (src / "a_batch1.json").write_text("\n".join(json.dumps(r) for r in f1))
    (src / "b_batch2.json").write_text("\n".join(json.dumps(r) for r in f2))
    # the file source orders batches by MODIFICATION TIME — pin it
    os.utime(src / "a_batch1.json", (1_000_000, 1_000_000))
    os.utime(src / "b_batch2.json", (2_000_000, 2_000_000))
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("ts", T.LongType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force 2 micro-batches
        .json(str(src))
    )
    # timeout="none": with a processing-time timer registered,
    # availableNow keeps scheduling empty micro-batches and never ends
    sessions = stream_sessionize(stream, gap_seconds=1800, timeout="none")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
    )
    # closed sessions only (the trailing session per user stays open in
    # state until the processing-time timeout, which availableNow ends
    # before); session A merged 0,100 (batch 1) with 200 (batch 2)
    assert got == [(1, 0, 200, 3), (1, 5000, 5100, 2), (2, 50, 50, 1)]


def test_stream_windowed_counts(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    rows = [
        {"ts": "2026-01-01T10:00:05", "event_type": "click"},
        {"ts": "2026-01-01T10:00:30", "event_type": "click"},
        {"ts": "2026-01-01T10:01:10", "event_type": "view"},
    ]
    (src / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("event_type", T.StringType())]
    )
    agg = stream_events_windowed(spark, str(src), schema, "1 minute", "2 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (str(r["window_start"]), r["event_type"]): r["n"]
        for r in spark.sql("select * from wincounts").collect()
    }
    assert got[("2026-01-01 10:00:00", "click")] == 2
    assert got[("2026-01-01 10:01:00", "view")] == 1
