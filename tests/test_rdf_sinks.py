"""RDF serialization sinks: turtle golden parity with the reference's
rdflib output (tests/test_spcht_utilities.py:237-251 in the reference),
nt escaping, nquads, xml well-formedness, and the distributed
write_rdf/CLI path."""

from __future__ import annotations

import glob

import pytest

from spcht_spark.descriptor.compiler import TRIPLES_SCHEMA
from spcht_spark.descriptor.rdf import (
    serialize_rdf,
    triples_to_ntriples,
    write_rdf,
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)


@pytest.fixture(scope="module")
def golden(spark):
    # SpchtTriple(adress, cat, "english"@en) + (adress, cat, "Miau")
    # — the reference's test_spcht_triple_serialize input (the
    # tag="xsd:integer" literal serializes PLAIN there because import_tag
    # only honors @/^^ prefixes).
    return _triples(spark, [
        ("https://schema.org/adress", "https://schema.org/cat", "english",
         False, "en", None),
        ("https://schema.org/adress", "https://schema.org/cat", "Miau",
         False, None, None),
    ])


def test_turtle_golden_rdflib_parity(golden):
    expected = """@prefix ns1: <https://schema.org/> .

ns1:adress ns1:cat "Miau",
        "english"@en .

"""
    assert serialize_rdf(golden, "ttl") == expected


def test_turtle_multi_subject_and_uri_fallback(spark):
    t = _triples(spark, [
        ("https://a.org/s1", "https://a.org/p", "https://a.org/o1", True, None, None),
        ("https://a.org/s1", "https://b.org/q", "lit", False, None, None),
        ("urn:weird subject", "https://a.org/p", "x", False, None, None),
    ])
    out = serialize_rdf(t, "ttl")
    assert "@prefix ns1: <https://a.org/> ." in out
    assert "@prefix ns2: <https://b.org/> ." in out
    assert "ns1:s1 ns1:p ns1:o1 ;\n    ns2:q \"lit\" ." in out
    assert "<urn:weird subject> ns1:p \"x\" ." in out  # non-splittable → full uri


def test_ntriples_escaping(spark):
    t = _triples(spark, [
        ("https://x/s", "https://x/p", 'he said "hi"\nback\\slash', False, None, None),
        ("https://x/s", "https://x/p", "42", False, None, "http://www.w3.org/2001/XMLSchema#integer"),
    ])
    lines = sorted(r["line"] for r in triples_to_ntriples(t).collect())
    assert lines[0] == '<https://x/s> <https://x/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .'
    assert lines[1] == '<https://x/s> <https://x/p> "he said \\"hi\\"\\nback\\\\slash" .'


def test_nquads_and_xml(spark, golden):
    nq = serialize_rdf(golden, "nquads", graph="https://g.example/g1")
    assert '"Miau" <https://g.example/g1> .' in nq
    xml = serialize_rdf(golden, "xml")
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml)
    assert root.tag.endswith("RDF")
    desc = root[0]
    assert desc.attrib["{http://www.w3.org/1999/02/22-rdf-syntax-ns#}about"] == (
        "https://schema.org/adress"
    )
    texts = sorted(el.text for el in desc)
    assert texts == ["Miau", "english"]


def test_write_rdf_part_order(spark, golden, tmp_path):
    """Concatenating part files in name order must yield a valid doc
    (header lands in partition 0)."""
    out = str(tmp_path / "g.ttl")
    write_rdf(golden.repartition(4), out, fmt="ttl")
    text = ""
    for f in sorted(glob.glob(f"{out}/part-*")):
        with open(f) as fh:
            text += fh.read()
    assert text.startswith("@prefix ns1: <https://schema.org/> .")
    assert 'ns1:adress ns1:cat "Miau",\n        "english"@en .' in text

    out_nt = str(tmp_path / "g.nt")
    write_rdf(golden, out_nt, fmt="nt")
    got = spark.read.text(out_nt).count()
    assert got == 2


def test_cli_write_triples_and_table(spark, tmp_path):
    import json

    from spcht_spark.cli import main

    recs = spark.createDataFrame(
        [("r1", "Alpha"), ("r2", "Beta")], ["id", "title"]
    )
    src = str(tmp_path / "recs.parquet")
    recs.write.parquet(src)
    desc = {
        "id_source": "dict", "id_field": "id",
        "nodes": [{"source": "dict", "field": "title",
                   "predicate": "https://x.org/title", "required": "optional"}],
    }
    dpath = tmp_path / "d.json"
    dpath.write_text(json.dumps(desc))

    out_nt = str(tmp_path / "out.nt")
    rc = main(["write-triples", str(dpath), src, out_nt,
               "--subject-prefix", "https://x.org/res/", "--format", "nt"])
    assert rc == 0
    lines = sorted(r["value"] for r in spark.read.text(out_nt).collect())
    assert lines == [
        '<https://x.org/res/r1> <https://x.org/title> "Alpha" .',
        '<https://x.org/res/r2> <https://x.org/title> "Beta" .',
    ]

    out_tbl = str(tmp_path / "triples_tbl")
    rc = main(["write-table", str(dpath), src, out_tbl])
    assert rc == 0
    back = spark.read.parquet(out_tbl)
    assert back.count() == 2
    assert set(back.columns) == {
        "subject", "predicate", "object", "object_is_uri", "lang", "datatype"
    }


def test_trig_golden(golden):
    from spcht_spark.descriptor.rdf import serialize_rdf

    got = serialize_rdf(golden, "trig", graph="urn:g1")
    expected = """@prefix ns1: <https://schema.org/> .

<urn:g1> {
ns1:adress ns1:cat "Miau",
        "english"@en .

}
"""
    assert got == expected


def test_trix_golden_and_shape(golden):
    from spcht_spark.descriptor.rdf import serialize_rdf, triples_to_trix

    got = serialize_rdf(golden, "trix", graph="urn:g1")
    assert got.startswith('<?xml version="1.0" encoding="utf-8"?>\n<TriX ')
    assert got.rstrip().endswith("</TriX>")
    assert "<uri>urn:g1</uri>" in got
    assert '<plainLiteral xml:lang="en">english</plainLiteral>' in got
    assert "<plainLiteral>Miau</plainLiteral>" in got
    assert got.count("<triple>") == got.count("</triple>") == 2
    # zero-shuffle contract: per-triple serialization, no groupBy
    _h, body, _f = triples_to_trix(golden, "urn:g1")
    assert "Exchange" not in body._jdf.queryExecution().executedPlan().toString()


def test_trig_trix_write_roundtrip(spark, golden, tmp_path):
    from spcht_spark.descriptor.rdf import write_rdf

    for fmt in ("trig", "trix"):
        out = str(tmp_path / fmt)
        write_rdf(golden, out, fmt=fmt, graph="urn:g1")
        parts = sorted(glob.glob(f"{out}/part-*"))
        text = "".join(open(p).read() for p in parts)
        if fmt == "trig":
            assert text.startswith("@prefix")
            assert text.rstrip().endswith("}")
        else:
            assert text.startswith('<?xml')
            assert text.rstrip().endswith("</TriX>")
