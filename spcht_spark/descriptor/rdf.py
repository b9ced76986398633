"""RDF serialization sinks (S6/S7/S8 parity).

The reference hands its triple list to rdflib
(process2RDF, /root/reference/Spcht/Core/SpchtUtility.py:506-535:
turtle, n3, nquads, nt, xml, …) and its insert paths POST sparql /
bulk-load via isql (WorkOrder.py:1009-1106, :1109-1190). Here every
serializer is a pure Column expression over the TRIPLES_SCHEMA
DataFrame, so the sink is an embarrassingly parallel ``df.write.text``:

* nt / nquads — one line per triple, no cross-row state: the true
  100 TB path (each task writes its own part file; no shuffle at all).
* turtle — prefix compression + subject grouping needs (a) a global
  prefix table (small: distinct namespaces, collected + broadcast) and
  (b) one shuffle on subject; each subject block is one output line
  group. Byte-parity with rdflib's serializer on the reference's golden
  case is pinned in tests/test_rdf_sinks.py.
* xml — rdf:RDF with one rdf:Description per subject (same grouping
  shuffle); attribute-escaped, not rdflib's "pretty-xml".

``write_rdf`` routes a format to its writer; the single-header formats
(ttl, xml) prepend the header as partition 0 via a 1-row union, so the
part-file concatenation order (what ``cat part-*``, Spark text reads,
and HDFS getmerge all produce) is a valid document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# n3: Turtle output is valid N3 (Turtle is an N3 subset), matching
# rdflib's behavior for format="n3" on triple-only graphs
# (/root/reference/Spcht/Core/SpchtUtility.py:513 accepts both names).
# trig/trix: the remaining formats rdflib's process2RDF accepts
# (SpchtUtility.py:513) — TriG wraps the Turtle blocks in a named-graph
# section; TriX is the per-triple XML syntax (zero-shuffle like nt).
FORMATS = ("nt", "nquads", "ttl", "turtle", "n3", "xml", "trig", "trix")

# PN_LOCAL we are willing to prefix-compress (conservative subset of the
# Turtle grammar; anything else falls back to a full <uri>).
_LOCAL_RE = r"^[A-Za-z_][A-Za-z0-9_\-]*$"


def _escape_literal(col: Column) -> Column:
    """N-Triples/Turtle string escaping (backslash first)."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', r'\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    out = F.regexp_replace(out, "\t", r"\\t")
    return out


def _nt_object(uri_fmt: str = "<%s>") -> Column:
    lit = _escape_literal(F.col("object"))
    return F.when(
        F.col("object_is_uri"), F.format_string(uri_fmt, F.col("object"))
    ).otherwise(
        F.when(
            F.col("lang").isNotNull(),
            F.format_string('"%s"@%s', lit, F.col("lang")),
        )
        .when(
            F.col("datatype").isNotNull(),
            F.format_string('"%s"^^<%s>', lit, F.col("datatype")),
        )
        .otherwise(F.format_string('"%s"', lit))
    )


def triples_to_ntriples(triples: DataFrame) -> DataFrame:
    """One N-Triples line per row — zero-shuffle sink."""
    return triples.select(
        F.format_string(
            "<%s> <%s> %s .", F.col("subject"), F.col("predicate"), _nt_object()
        ).alias("line")
    )


def triples_to_nquads(triples: DataFrame, graph: str) -> DataFrame:
    """N-Quads: N-Triples + a constant graph IRI — zero-shuffle sink."""
    return triples.select(
        F.format_string(
            "<%s> <%s> %s <%s> .",
            F.col("subject"), F.col("predicate"), _nt_object(), F.lit(graph),
        ).alias("line")
    )


def _namespaces(triples: DataFrame) -> list[str]:
    """Distinct prefix-compressible namespaces across s/p/uri-objects,
    sorted (deterministic ns1..nsN numbering, like rdflib's ns1 for a
    single namespace). Collected driver-side — the namespace vocabulary
    of a dataset is small by construction (predicates/ontologies), not
    proportional to rows."""
    def ns(col: str, gate: Column | None = None) -> DataFrame:
        c = F.regexp_extract(F.col(col), r"^(.*[/#])[^/#]+$", 1)
        local = F.regexp_extract(F.col(col), r"^.*[/#]([^/#]+)$", 1)
        d = triples if gate is None else triples.filter(gate)
        return d.select(c.alias("ns")).filter(
            (c != "") & local.rlike(_LOCAL_RE)
        )

    parts = ns("subject").unionAll(ns("predicate")).unionAll(
        ns("object", F.col("object_is_uri"))
    )
    return sorted(r["ns"] for r in parts.distinct().collect())


def _prefixed(col: Column, ns_map: dict[str, str]) -> Column:
    """URI → prefixed name when its namespace is in the table AND the
    local part is compressible, else <uri>."""
    space = F.regexp_extract(col, r"^(.*[/#])[^/#]+$", 1)
    local = F.regexp_extract(col, r"^.*[/#]([^/#]+)$", 1)
    m = F.create_map(
        *[x for k, v in sorted(ns_map.items()) for x in (F.lit(k), F.lit(v))]
    )
    pref = m[space]
    ok = pref.isNotNull() & local.rlike(_LOCAL_RE)
    return F.when(ok, F.concat(pref, F.lit(":"), local)).otherwise(
        F.format_string("<%s>", col)
    )


def triples_to_turtle(triples: DataFrame) -> tuple[str, DataFrame]:
    """(header, body) — header is the @prefix block; body has one row
    per subject: predicates sorted and joined with " ;\\n    ", objects
    per predicate sorted and joined with ",\\n        " (rdflib's
    layout; golden-pinned). One shuffle on subject."""
    ns_list = _namespaces(triples)
    ns_map = {ns: f"ns{i + 1}" for i, ns in enumerate(ns_list)}
    header = "".join(f"@prefix {p}: <{ns}> .\n" for ns, p in sorted(ns_map.items()))

    obj = F.when(F.col("object_is_uri"), _prefixed(F.col("object"), ns_map)).otherwise(
        _nt_object()
    )
    po = triples.select(
        _prefixed(F.col("subject"), ns_map).alias("s"),
        _prefixed(F.col("predicate"), ns_map).alias("p"),
        obj.alias("o"),
    )
    per_pred = po.groupBy("s", "p").agg(
        F.array_join(F.array_sort(F.collect_list("o")), ",\n        ").alias("objs")
    )
    body = (
        per_pred.groupBy("s")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.format_string("%s %s", F.col("p"), F.col("objs")))
                ),
                " ;\n    ",
            ).alias("block")
        )
        .select(F.format_string("%s %s .\n", F.col("s"), F.col("block")).alias("line"))
    )
    return header, body


def _xml_escape(col: Column) -> Column:
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    out = F.regexp_replace(out, '"', "&quot;")
    return out


_XML_HEADER = (
    '<?xml version="1.0" encoding="utf-8"?>\n'
    '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
)
_XML_FOOTER = "</rdf:RDF>"


def triples_to_xml(triples: DataFrame) -> tuple[str, DataFrame, str]:
    """(header, body, footer): one rdf:Description per subject.
    Predicates are emitted as full-URI elements via the spcht: dummy
    namespace trick only when they don't split — here we always split
    namespace/local (predicates that can't split are dropped with the
    same tolerance the reference shows for invalid URIs)."""
    p_ns = F.regexp_extract(F.col("predicate"), r"^(.*[/#])[^/#]+$", 1)
    p_local = F.regexp_extract(F.col("predicate"), r"^.*[/#]([^/#]+)$", 1)
    obj_el = F.when(
        F.col("object_is_uri"),
        F.format_string(
            '    <%s xmlns="%s" rdf:resource="%s"/>',
            p_local, _xml_escape(p_ns), _xml_escape(F.col("object")),
        ),
    ).otherwise(
        F.format_string(
            "    <%s xmlns=\"%s\"%s>%s</%s>",
            p_local,
            _xml_escape(p_ns),
            F.when(
                F.col("lang").isNotNull(),
                F.format_string(' xml:lang="%s"', F.col("lang")),
            )
            .when(
                F.col("datatype").isNotNull(),
                F.format_string(' rdf:datatype="%s"', _xml_escape(F.col("datatype"))),
            )
            .otherwise(F.lit("")),
            _xml_escape(F.col("object")),
            p_local,
        )
    )
    body = (
        triples.filter((p_ns != "") & p_local.rlike(_LOCAL_RE))
        .groupBy("subject")
        .agg(F.array_join(F.array_sort(F.collect_list(obj_el)), "\n").alias("els"))
        .select(
            F.format_string(
                '  <rdf:Description rdf:about="%s">\n%s\n  </rdf:Description>',
                _xml_escape(F.col("subject")),
                F.col("els"),
            ).alias("line")
        )
    )
    return _XML_HEADER, body, _XML_FOOTER


def triples_to_trig(
    triples: DataFrame, graph: str
) -> tuple[str, DataFrame, str]:
    """(header, body, footer): the Turtle prefix block + subject blocks
    wrapped in ONE named-graph section ``<graph> { ... }`` — the
    single-graph TriG a triple table with a constant graph IRI
    serializes to. Same one-shuffle subject grouping as Turtle."""
    header, body = triples_to_turtle(triples)
    return header + f"\n<{graph}> {{\n", body, "}\n"


_TRIX_NS = "http://www.w3.org/2004/03/trix/trix-1/"


def triples_to_trix(
    triples: DataFrame, graph: str
) -> tuple[str, DataFrame, str]:
    """(header, body, footer): TriX — one ``<triple>`` element per row,
    no cross-row state, so like nt/nquads it is a zero-shuffle sink."""
    obj_el = F.when(
        F.col("object_is_uri"),
        F.format_string("      <uri>%s</uri>", _xml_escape(F.col("object"))),
    ).otherwise(
        F.when(
            F.col("lang").isNotNull(),
            F.format_string(
                '      <plainLiteral xml:lang="%s">%s</plainLiteral>',
                F.col("lang"), _xml_escape(F.col("object")),
            ),
        )
        .when(
            F.col("datatype").isNotNull(),
            F.format_string(
                '      <typedLiteral datatype="%s">%s</typedLiteral>',
                _xml_escape(F.col("datatype")), _xml_escape(F.col("object")),
            ),
        )
        .otherwise(
            F.format_string(
                "      <plainLiteral>%s</plainLiteral>",
                _xml_escape(F.col("object")),
            )
        )
    )
    body = triples.select(
        F.format_string(
            "    <triple>\n      <uri>%s</uri>\n      <uri>%s</uri>\n%s\n    </triple>",
            _xml_escape(F.col("subject")),
            _xml_escape(F.col("predicate")),
            obj_el,
        ).alias("line")
    )
    header = (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        f'<TriX xmlns="{_TRIX_NS}">\n'
        f"  <graph>\n    <uri>{graph}</uri>"
    )
    footer = "  </graph>\n</TriX>"
    return header, body, footer


def write_rdf(
    triples: DataFrame, path: str, fmt: str = "nt", graph: str | None = None
) -> None:
    """Serialize + write as text part files.

    nt/nquads stream straight out of the map tasks. ttl/xml prepend the
    header as partition 0 (1-row DataFrame union keeps partition order),
    so concatenating part files in name order yields a valid document."""
    spark = triples.sparkSession
    if fmt == "nt":
        triples_to_ntriples(triples).write.mode("overwrite").text(path)
    elif fmt == "nquads":
        triples_to_nquads(triples, graph or "urn:spcht:default").write.mode(
            "overwrite"
        ).text(path)
    elif fmt in ("ttl", "turtle", "n3"):
        header, body = triples_to_turtle(triples)
        head_df = spark.createDataFrame([(header,)], ["line"]).coalesce(1)
        head_df.unionAll(body).write.mode("overwrite").text(path)
    elif fmt in ("xml", "trig", "trix"):
        if fmt == "xml":
            header, body, footer = triples_to_xml(triples)
        elif fmt == "trig":
            header, body, footer = triples_to_trig(
                triples, graph or "urn:spcht:default"
            )
        else:
            header, body, footer = triples_to_trix(
                triples, graph or "urn:spcht:default"
            )
        head_df = spark.createDataFrame([(header,)], ["line"]).coalesce(1)
        foot_df = spark.createDataFrame([(footer,)], ["line"]).coalesce(1)
        head_df.unionAll(body).unionAll(foot_df).write.mode("overwrite").text(path)
    else:
        raise ValueError(f"unknown rdf format {fmt!r} (choose from {FORMATS})")


def serialize_rdf(triples: DataFrame, fmt: str = "ttl", graph: str | None = None) -> str:
    """Driver-side string render (small exports / golden tests — the
    reference's process2RDF is fully in-memory too)."""
    if fmt == "nt":
        rows = triples_to_ntriples(triples).collect()
        return "".join(r["line"] + "\n" for r in rows)
    if fmt == "nquads":
        rows = triples_to_nquads(triples, graph or "urn:spcht:default").collect()
        return "".join(r["line"] + "\n" for r in rows)
    if fmt in ("ttl", "turtle", "n3"):
        header, body = triples_to_turtle(triples)
        blocks = sorted(r["line"] for r in body.collect())
        # blocks end ".\n"; joining/closing with "\n" leaves one blank
        # line between blocks and after the last — rdflib's layout
        return header + "\n" + "\n".join(blocks) + "\n"
    if fmt == "xml":
        header, body, footer = triples_to_xml(triples)
        blocks = sorted(r["line"] for r in body.collect())
        return header + "\n" + "\n".join(blocks) + "\n" + footer + "\n"
    if fmt == "trig":
        header, body, footer = triples_to_trig(triples, graph or "urn:spcht:default")
        blocks = sorted(r["line"] for r in body.collect())
        return header + "\n".join(blocks) + "\n" + footer
    if fmt == "trix":
        header, body, footer = triples_to_trix(triples, graph or "urn:spcht:default")
        blocks = sorted(r["line"] for r in body.collect())
        return header + "\n" + "\n".join(blocks) + "\n" + footer + "\n"
    raise ValueError(f"unknown rdf format {fmt!r} (choose from {FORMATS})")
