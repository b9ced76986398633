"""Feature-complete descriptor × multi-record table, end-to-end golden
run — the rebuild of tests/demo_spcht_processing.py +
tests/featuretest.spcht.json (SURVEY.md §5): every descriptor feature
in ONE compiled pipeline over a Solr-record-shaped table (FIXTURES.md
§F2), with $ref translation maps loaded from disk and MARC blobs."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from spcht_spark.descriptor import compile_descriptor, load_descriptor
from spcht_spark.sources.marc import build_marc_record

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("title_short", T.StringType()),
        T.StructField("author2", T.ArrayType(T.StringType())),
        T.StructField("author2_role", T.ArrayType(T.StringType())),
        T.StructField("author_role", T.ArrayType(T.StringType())),
        T.StructField("ctrlnum", T.ArrayType(T.StringType())),
        T.StructField("institution", T.ArrayType(T.StringType())),
        T.StructField("publishDateSort", T.StringType()),
        T.StructField("format_finc", T.ArrayType(T.StringType())),
        T.StructField("language", T.ArrayType(T.StringType())),
        T.StructField("topic_facet", T.ArrayType(T.StringType())),
        T.StructField("fullrecord", T.StringType()),
    ]
)

MARC_A = build_marc_record(
    [("001", "0-1001"), ("100", "1", " ", [("a", "Author One")]),
     ("951", " ", " ", [("a", "BO")]), ("951", " ", " ", [("a", "MV")])]
)
MARC_B = build_marc_record(
    [("001", "0-1002"), ("100", "1", " ", [("a", "Author Two")])]
)

RECORDS = [
    {
        "id": "rec1", "title": "Full Title One", "title_short": "T1",
        "author2": ["Alice", "Bob"], "author2_role": ["aut", "edt"],
        "author_role": ["aut"], "ctrlnum": ["(DE-627)1234", "(OTHER)999"],
        "institution": ["DE-15"], "publishDateSort": "2001",
        "format_finc": ["Book"], "language": ["ger"],
        "topic_facet": ["spark", "query"], "fullrecord": MARC_A,
    },
    {
        "id": "rec2", "title": None, "title_short": "T2-short",
        "author2": ["Carol"], "author2_role": ["ill"],
        "author_role": ["unknownrole"], "ctrlnum": ["(DE-627)5678"],
        "institution": ["DE-14"], "publishDateSort": "1999",
        "format_finc": ["Weirdformat"], "language": ["eng"],
        "topic_facet": ["engine"], "fullrecord": MARC_B,
    },
]

ROLES_MAP = {"aut": "http://id.loc/author", "edt": "http://id.loc/editor"}
LANGS_MAP = {"ger": "german", "eng": "english"}


@pytest.fixture(scope="module")
def descriptor_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("desc")
    (d / "roles.json").write_text(json.dumps(ROLES_MAP))
    (d / "languages.json").write_text(json.dumps(LANGS_MAP))
    desc = {
        "id_source": "dict",
        "id_field": "id",
        "nodes": [
            # alternatives + fallback chain
            {"name": "title", "source": "dict", "field": "title",
             "predicate": "dc:title", "required": "optional",
             "alternatives": ["title_sub"],
             "fallback": {"source": "dict", "field": "title_short",
                          "prepend": "short:"}},
            # match + cut + replace
            {"name": "ctrl", "source": "dict", "field": "ctrlnum",
             "predicate": "dc:identifier", "required": "optional",
             "match": "^\\(DE-627\\)", "cut": "^\\(DE-627\\)", "replace": "",
             "prepend": "de627:"},
            # mapping via $ref with $inherit
            {"name": "lang", "source": "dict", "field": "language",
             "predicate": "dc:language", "required": "optional",
             "mapping_settings": {"$ref": "languages.json", "$inherit": True}},
            # mapping with $default
            {"name": "format", "source": "dict", "field": "format_finc",
             "predicate": "dc:format", "required": "optional",
             "mapping": {"Book": "printed-book"},
             "mapping_settings": {"$default": "other-format"}},
            # joined_map (parallel + broadcast across rows) via $ref
            {"name": "authors", "source": "dict", "field": "author2",
             "predicate": "dc:contributor", "required": "optional",
             "joined_field": "author2_role", "joined_map_ref": "roles.json"},
            # if gate with numeric coercion
            {"name": "modern", "source": "dict", "field": "id",
             "predicate": "is:modern", "required": "optional",
             "static_field": "yes",
             "if_field": "publishDateSort", "if_condition": ">=",
             "if_value": 2000},
            # insert_into cartesian
            {"name": "topics", "source": "dict", "field": "topic_facet",
             "predicate": "dc:subject", "required": "optional",
             "insert_into": "topic:{}/inst:{}",
             "insert_add_fields": [{"field": "institution"}]},
            # marc control + repeatable field
            {"name": "marc_author", "source": "marc", "field": "100:a",
             "predicate": "marc:author", "required": "optional"},
            {"name": "marc_locations", "source": "marc", "field": "951:a",
             "predicate": "marc:location", "required": "optional",
             "fallback": {"source": "dict", "field": "institution"}},
        ],
    }
    p = d / "featureset.spcht.json"
    p.write_text(json.dumps(desc))
    return str(p)


def test_featureset_end_to_end(spark, descriptor_path):
    desc = load_descriptor(descriptor_path)
    # $ref maps inlined at load (compile-time constant folding)
    assert desc["nodes"][2]["mapping"] == LANGS_MAP
    assert desc["nodes"][4]["joined_map"] == ROLES_MAP

    df = spark.createDataFrame(RECORDS, schema=SCHEMA)
    out = compile_descriptor(desc, df, subject_prefix="https://d/")
    got = {
        (r["subject"], r["predicate"], r["object"])
        for r in out.collect()
    }
    want = {
        # title: rec1 direct, rec2 via fallback prepend
        ("https://d/rec1", "dc:title", "Full Title One"),
        ("https://d/rec2", "dc:title", "short:T2-short"),
        # ctrlnum: only DE-627, cut+prepend
        ("https://d/rec1", "dc:identifier", "de627:1234"),
        ("https://d/rec2", "dc:identifier", "de627:5678"),
        # language via $ref map
        ("https://d/rec1", "dc:language", "german"),
        ("https://d/rec2", "dc:language", "english"),
        # format: mapped vs $default
        ("https://d/rec1", "dc:format", "printed-book"),
        ("https://d/rec2", "dc:format", "other-format"),
        # joined_map: role-mapped predicates, static fallback predicate
        ("https://d/rec1", "http://id.loc/author", "Alice"),
        ("https://d/rec1", "http://id.loc/editor", "Bob"),
        ("https://d/rec2", "dc:contributor", "Carol"),  # 'ill' unmapped → static
        # if >= 2000: only rec1
        ("https://d/rec1", "is:modern", "yes"),
        # insert_into cartesian (1 institution each)
        ("https://d/rec1", "dc:subject", "topic:spark/inst:DE-15"),
        ("https://d/rec1", "dc:subject", "topic:query/inst:DE-15"),
        ("https://d/rec2", "dc:subject", "topic:engine/inst:DE-14"),
        # marc
        ("https://d/rec1", "marc:author", "Author One"),
        ("https://d/rec2", "marc:author", "Author Two"),
        ("https://d/rec1", "marc:location", "BO"),
        ("https://d/rec1", "marc:location", "MV"),
        # rec2 has no 951 → fallback to institution
        ("https://d/rec2", "marc:location", "DE-14"),
    }
    assert got == want
