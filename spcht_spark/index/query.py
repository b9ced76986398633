"""Top-k BM25 query engine over the compressed block index.

Two paths, both rank-identical to the pure-Python oracle:

* :func:`exact_topk` — decode every matching block, score everything.
  Plan shape: dictionary lookup driver-side (the ≤ handful of query
  terms; idf computed in Python so it is bit-identical to the oracle) →
  block scan with ``term IN (...)`` pushed to parquet → Arrow decode UDF
  (docs/tfs/dls lanes — dl rides the block, no doclens join) → per-term
  contribution (pure Catalyst doubles) →
  deterministic term-ordered summation → per-query top-k window.
* :func:`wand_topk` (spcht_spark.index.wand) — block-max WAND: skips
  decoding blocks whose upper bound cannot reach the current kth score.

Determinism contract (SURVEY.md §7 "rank identity"): contributions are
summed in ascending-term order via sort_array(collect_list(struct)) +
aggregate-fold, tie-break (score desc, doc_id asc).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spcht_spark.oracle import B, K1, idf as idf_py

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("dl", T.LongType(), False),
    ]
)

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def values_df(spark: SparkSession, rows: list[tuple], cols: list[str]) -> DataFrame:
    """Tiny literal DataFrame as a pure-JVM inline table (``VALUES``).

    ``spark.createDataFrame(list)`` is parallelize-backed: every scan /
    broadcast build of it is a stage of PYTHON tasks (deserializing the
    pickled rows), measured 0.2-0.5 s per query batch on this VM and
    storm-amplified. An inline VALUES table resolves to a LocalRelation
    — the broadcast build reads it driver-side with zero tasks (guide
    §4: keep the JVM↔Python boundary out of paths that carry no data).
    Strings are SQL-escaped; bool/int/float map to
    BOOLEAN/BIGINT/DOUBLE (the same types createDataFrame inferred)."""

    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, int):
            return f"CAST({v} AS BIGINT)"
        if isinstance(v, float):
            return f"CAST('{v!r}' AS DOUBLE)"
        s = str(v).replace("'", "''")
        return f"'{s}'"

    if not rows:
        raise ValueError("values_df needs at least one row")
    body = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return spark.sql(f"SELECT * FROM VALUES {body} AS t({', '.join(cols)})")


def _decode_batches(batches):
    """The decode function behind :func:`decode_blocks` — module-level
    and closure-free so its pandas UDF can be built (pickled +
    registered over py4j) ONCE per session instead of per call.

    One numpy pass per Arrow batch instead of a Python loop per BLOCK
    (the former shape paid 3 varbyte calls + a small DataFrame build
    per block — ~1,600 Python-level calls per 528-block batch): the
    per-block buffers are concatenated and decoded once per lane
    (varbyte values are self-delimiting and every buffer ends on a
    terminator byte, so the concatenated decode IS the concatenation
    of the per-block decodes), per-block value counts are recovered
    from the terminator positions, and the delta chains — which reset
    at every block start — resolve through the codec's vectorized
    segmented cumsum. Row-identical to the per-block decode."""
    import numpy as np

    from spcht_spark.index.compress import segmented_positions, varbyte_decode

    for pdf in batches:
        if len(pdf) == 0:
            continue
        dbins = pdf["docs_bin"].tolist()
        dbuf = np.frombuffer(b"".join(dbins), dtype=np.uint8)
        if len(dbuf) == 0:
            continue
        # value count per block = terminator bytes (<0x80) per buffer
        ends = np.nonzero(dbuf < 0x80)[0]
        byte_starts = np.cumsum([0] + [len(b) for b in dbins[:-1]])
        counts = np.diff(
            np.concatenate((np.searchsorted(ends, byte_starts), [len(ends)]))
        )
        gaps = varbyte_decode(dbuf.tobytes())
        docs = segmented_positions(gaps, counts)
        tfs = varbyte_decode(b"".join(pdf["tfs_bin"])).astype("int64")
        dls = varbyte_decode(b"".join(pdf["dls_bin"])).astype("int64")
        yield pd.DataFrame(
            {
                "term": np.repeat(pdf["term"].to_numpy(), counts),
                "doc_id": docs,
                "tf": tfs,
                "dl": dls,
            }
        )


# app_id → the one registered decode UDF (see decode_blocks)
_DECODE_UDF_MEMO: dict[str, object] = {}

# (app_id, name) → registered grouped-map UDF (see apply_grouped_cached)
_GROUPED_UDF_MEMO: dict[tuple[str, str], object] = {}


def apply_grouped_cached(
    df: DataFrame, group_cols: list[str], func, schema, name: str
) -> DataFrame:
    """``df.groupBy(*group_cols).applyInPandas(func, schema)`` with the
    pandas UDF built once per (session, name) instead of per call.

    ``GroupedData.applyInPandas`` re-pickles ``func`` and re-registers
    a fresh UDF on every invocation (~65 py4j round-trips per call,
    measured). ``func`` MUST be module-level and closure-free — any
    per-call parameters have to ride the data as columns, because the
    function bytes are serialized exactly once per session. The JVM
    entry point (``flatMapGroupsInPandas``) and eval type are the same
    ones the mixin uses — identical plan."""
    spark = df.sparkSession
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:  # Spark Connect: no sparkContext — mixin path
        return df.groupBy(*group_cols).applyInPandas(func, schema)
    memo_key = (app_id, name)
    udf = _GROUPED_UDF_MEMO.get(memo_key)
    if udf is None:
        from pyspark.sql.pandas.functions import pandas_udf
        from pyspark.util import PythonEvalType

        udf = pandas_udf(
            func,
            returnType=schema,
            functionType=PythonEvalType.SQL_GROUPED_MAP_PANDAS_UDF,
        )
        for k in [k for k in _GROUPED_UDF_MEMO if k[0] != app_id]:
            del _GROUPED_UDF_MEMO[k]  # dead sessions' judf refs
        _GROUPED_UDF_MEMO[memo_key] = udf
    gd = df.groupBy(*group_cols)
    udf_column = udf(*[df[c] for c in df.columns])
    jdf = gd._jgd.flatMapGroupsInPandas(udf_column._jc)
    return df.__class__(jdf, spark)


def apply_cogrouped_cached(
    left: DataFrame,
    right: DataFrame,
    group_cols: list[str],
    func,
    schema,
    name: str,
) -> DataFrame:
    """``left.groupBy(...).cogroup(right.groupBy(...)).applyInPandas``
    with the pandas UDF built once per (session, name) — the cogrouped
    twin of :func:`apply_grouped_cached`. Same JVM entry point
    (``flatMapCoGroupsInPandas``), identical plan; ``func`` must be
    module-level and closure-free."""
    spark = left.sparkSession
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:  # Spark Connect — mixin path
        return (
            left.groupBy(*group_cols)
            .cogroup(right.groupBy(*group_cols))
            .applyInPandas(func, schema)
        )
    memo_key = (app_id, name)
    udf = _GROUPED_UDF_MEMO.get(memo_key)
    if udf is None:
        from pyspark.sql.pandas.functions import pandas_udf
        from pyspark.util import PythonEvalType

        udf = pandas_udf(
            func,
            returnType=schema,
            functionType=PythonEvalType.SQL_COGROUPED_MAP_PANDAS_UDF,
        )
        for k in [k for k in _GROUPED_UDF_MEMO if k[0] != app_id]:
            del _GROUPED_UDF_MEMO[k]
        _GROUPED_UDF_MEMO[memo_key] = udf
    gd1 = left.groupBy(*group_cols)
    gd2 = right.groupBy(*group_cols)
    udf_column = udf(
        *[left[c] for c in left.columns], *[right[c] for c in right.columns]
    )
    jdf = gd1._jgd.flatMapCoGroupsInPandas(gd2._jgd, udf_column._jc)
    return left.__class__(jdf, spark)


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """blocks → flat (term, doc_id, tf, dl) via Arrow-batched numpy decode.

    The doc-length lane (``dls_bin``, carried in every block since the
    build computes dl map-side) is decoded alongside docs/tfs, so every
    consumer scores WITHOUT a postings⋈doclens equi-join — at 10^12 docs
    that join was an Exchange of the full decoded posting stream
    (round-3 VERDICT "What's wrong" #3).

    ``DataFrame.mapInPandas`` builds a fresh pandas UDF per call —
    ~55 py4j round-trips plus a re-pickle of the function (~40 ms of
    driver wall at this host's round-trip latency) on EVERY query.
    The decode function is static, so the UDF object (whose ``_judf``
    caches the JVM registration) is memoized per session and applied
    through the same ``mapInPandas`` JVM entry point the mixin uses —
    identical plan, one-time setup."""
    df = blocks.selectExpr("term", "docs_bin", "tfs_bin", "dls_bin")
    spark = df.sparkSession
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:  # Spark Connect: no sparkContext — use the mixin path
        return df.mapInPandas(_decode_batches, schema=POSTINGS_SCHEMA)
    udf = _DECODE_UDF_MEMO.get(app_id)
    if udf is None:
        from pyspark.sql.pandas.functions import pandas_udf
        from pyspark.util import PythonEvalType

        udf = pandas_udf(
            _decode_batches,
            returnType=POSTINGS_SCHEMA,
            functionType=PythonEvalType.SQL_MAP_PANDAS_ITER_UDF,
        )
        _DECODE_UDF_MEMO.clear()  # a dead session's judf is useless
        _DECODE_UDF_MEMO[app_id] = udf
    udf_column = udf(*[df[c] for c in df.columns])
    jdf = df._jdf.mapInPandas(
        udf_column._jc, False, df._build_java_profile(None)
    )
    return df.__class__(jdf, spark)


def query_idfs(
    dictionary: DataFrame, stats_row, terms: list[str]
) -> dict[str, float]:
    """Driver-side idf for the query terms — bit-identical to the oracle
    (math.log in Python; N and df are exact ints)."""
    n_docs = int(stats_row["n_docs"])
    dfs = {
        r["term"]: int(r["df"])
        for r in dictionary.where(f"term IN ({sql_in(terms)})")
        .select("term", "df")
        .collect()
    } if terms else {}
    return {t: idf_py(n_docs, dfs[t]) for t in terms if t in dfs}


def stats_and_idfs(
    dictionary: DataFrame, stats: DataFrame, terms: list[str]
) -> tuple[dict, dict[str, float]]:
    """(stats_row, idfs) in ONE driver job.

    Every query batch needs the corpus stats row and the query terms'
    dfs; collecting them separately is two serial driver barriers per
    batch (each a job + an AQE/py4j gap — at page-of-10 scale the
    barriers, not the scoring, dominate). A union of the two tiny
    projections collects both in one job. Values are identical to
    ``stats.collect()[0]`` + :func:`query_idfs` (exact ints in, same
    math.log); the returned stats row is a plain dict supporting the
    same ``row["n_docs"]`` subscripting."""
    # where/selectExpr SQL strings, not per-Column ops: the Column build
    # of this same plan was ~280 py4j round-trips per batch (isin alone
    # pays one trip per literal; measured via a send_command counter),
    # ~0.2 s of driver wall at this host's ~0.75 ms per round-trip.
    s = stats.selectExpr(
        "CAST(NULL AS STRING) AS term",
        "CAST(NULL AS BIGINT) AS df",
        "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(avgdl AS DOUBLE) AS avgdl",
    )
    if terms:
        d = dictionary.where(f"term IN ({sql_in(terms)})").selectExpr(
            "term",
            "CAST(df AS BIGINT) AS df",
            "CAST(NULL AS BIGINT) AS n_docs",
            "CAST(NULL AS DOUBLE) AS avgdl",
        )
        s = s.unionByName(d)
    stats_row: dict = {}
    dfs: dict[str, int] = {}
    for r in s.collect():
        if r["term"] is None:
            stats_row = {"n_docs": int(r["n_docs"]), "avgdl": float(r["avgdl"])}
        else:
            dfs[r["term"]] = int(r["df"])
    n_docs = stats_row["n_docs"]
    return stats_row, {t: idf_py(n_docs, dfs[t]) for t in terms if t in dfs}


def sql_str(s: str) -> str:
    """SQL string literal (single-quote escaped)."""
    return "'" + str(s).replace("'", "''") + "'"


def sql_esc(s: str) -> str:
    """Escape literal braces for ``spark.sql``'s arg templating (a
    string.Formatter — '{{' renders '{'). Needed wherever code tokens
    like '{' can appear inside an embedded SQL literal."""
    return s.replace("{", "{{").replace("}", "}}")


def sql_in(values) -> str:
    """Comma-joined string literals for a ``term IN (...)`` predicate.

    ``F.col(c).isin(lst)`` costs one py4j round-trip PER LITERAL (each
    element becomes a java object via _to_seq); a rendered IN-list is
    part of one ``where`` string — same Catalyst predicate, one trip."""
    return ", ".join(sql_str(v) for v in values)


def sql_double(v: float) -> str:
    """SQL expression producing EXACTLY this float64: repr() round-trips
    and CAST(string AS DOUBLE) parses it exactly."""
    return f"CAST({sql_str(repr(float(v)))} AS DOUBLE)"


def sql_map(items, val) -> str:
    """``map('k', v, ...)`` literal from sorted (key, value) pairs."""
    return "map(" + ", ".join(
        f"{sql_str(k)}, {val(v)}" for k, v in items
    ) + ")"


def score_postings(
    postings: DataFrame,
    idfs: dict[str, float],
    avgdl: float,
    query_terms: DataFrame,
    pre_partition: bool = False,
) -> DataFrame:
    """(query_id, doc_id, score): contribution expression mirrors
    spcht_spark.oracle.term_score verbatim; summation is term-ordered.
    ``postings`` must carry dl (decode_blocks does) — no doclens join.

    The idf map, BM25 expression and term-ordered fold are built as ONE
    SQL expression string each: the per-Column py4j construction of the
    same plan cost ~0.2-0.5 s of driver round-trips per query batch
    (measured via cProfile — ~2300 py4j calls for one boolean batch;
    guide §1.2 "per-task work" applies to the driver too). Float
    literals go through repr()+CAST so the doubles are bit-identical to
    the F.lit path."""
    if not idfs:
        raise ValueError("score_postings requires at least one known term")
    idf_map = sql_map(sorted(idfs.items()), sql_double)
    contrib_expr = (
        f"{idf_map}[term] * ((tf * {sql_double(K1 + 1.0)}) / "
        f"(tf + {sql_double(K1)} * ({sql_double(1.0 - B)} + "
        f"{sql_double(B)} * (dl / {sql_double(avgdl)}))))"
    )
    # join + contrib projection + (optional) repartition + aggregation
    # as ONE df-parametrized sql statement — one JVM plan analysis
    # instead of four (each DataFrame op re-analyzes the whole tree,
    # ~8-12 ms/op on this host). sql_esc doubles literal braces (code
    # tokens like '{' appear in the idf map) for the arg formatter.
    inner = (
        f"SELECT *, {sql_esc(contrib_expr)} AS contrib "
        "FROM {postings} JOIN {qt} USING (term)"
    )
    if pre_partition:
        # One exchange instead of two for PROVEN-SMALL corpora (the
        # caller gates on n_docs < SALT_MIN_DOCS, the same proof that
        # skips the salt stage): hash-partitioning by query_id alone
        # satisfies the (query_id, doc_id) aggregation's clustering AND
        # the top-k window's, so agg + sort + window fuse into the one
        # post-exchange stage (plan: 2 Exchange → 1; A/B min 1.13 →
        # 0.91 s on the 25-query reference batch). At scale this shape
        # would funnel a hot query's candidates through one partition —
        # exactly the straggler the salted two-stage top-k exists to
        # avoid — so large corpora keep the standard shape.
        n = int(postings.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        inner = f"SELECT /*+ REPARTITION({n}, query_id) */ * FROM ({inner})"
    return postings.sparkSession.sql(
        "SELECT query_id, doc_id, "
        "aggregate(array_sort(collect_list(struct(term, contrib))), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.contrib) AS score, "
        f"count(1) AS n_matched FROM ({inner}) GROUP BY query_id, doc_id",
        postings=postings,
        qt=query_terms,
    )


# Candidate sets are bounded by the corpus: below this many docs a
# query's full candidate list fits one reducer comfortably and the salt
# pre-stage is a pure extra exchange (~0.15-0.2 s of stage overhead per
# call at page scale). Above it, the two-stage shape is what keeps a
# hot term's top-k from becoming a single-reducer straggler at 10^12
# docs. The gate input is n_docs from the already-collected stats row —
# no extra job, and the decision scales with the DATA, not the host.
SALT_MIN_DOCS = 1 << 20


def topk(
    scores: DataFrame, ks: dict[str, int], n_docs: int | None = None
) -> DataFrame:
    """Per-query top-k with deterministic tie-break (score desc, doc asc).

    Two-stage: a per-(query, doc-hash-salt) partial top-k runs first so
    no single reducer ever receives every candidate of one query (the
    plain per-query window is ≤|queries| tasks — a straggler/OOM shape
    when the exact path scores a hot term over 10^12 docs). The union of
    per-salt top-k is a superset of the global top-k, so the final
    narrow window over ≤ 64·k rows/query is exact. The pre-stage is
    semantically a no-op, so it is SKIPPED when the caller proves the
    corpus is small (``n_docs`` < SALT_MIN_DOCS) — same rows out.

    Built as ONE df-parametrized ``spark.sql`` statement: every
    DataFrame op re-analyzes its whole (deep) tree JVM-side — measured
    ~8-12 ms per op on this host — so a 6-op window chain paid more in
    plan analysis than in py4j traffic. One statement = one analysis."""
    # spark.sql's arg templating is a string.Formatter: literal braces
    # (possible inside query-id strings) must be doubled to survive
    k_map = sql_esc(sql_map(sorted(ks.items()), lambda k: str(int(k))))
    src = "{scores}"
    if n_docs is None or n_docs >= SALT_MIN_DOCS:
        src = (
            "(SELECT query_id, doc_id, score FROM ("
            "SELECT *, row_number() OVER (PARTITION BY query_id, "
            "pmod(xxhash64(doc_id), 64) ORDER BY score DESC, doc_id ASC)"
            f" AS r1 FROM {{scores}}) WHERE r1 <= {k_map}[query_id])"
        )
    return scores.sparkSession.sql(
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, score, row_number() OVER ("
        "PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank "
        f"FROM {src}) WHERE rank <= {k_map}[query_id]",
        scores=scores,
    )


def exact_topk(
    spark: SparkSession,
    blocks: DataFrame,
    doclens: DataFrame,
    dictionary: DataFrame,
    stats: DataFrame,
    queries: list[tuple[str, list[str], int]],
    mode: str = "or",
    doc_filter: DataFrame | None = None,
    min_match: int | dict[str, int] | None = None,
) -> DataFrame:
    """Exact BM25 top-k for a batch of queries. mode='or' (disjunctive)
    or 'and' (conjunctive: doc must match every query term; a term
    absent from the index empties that query, Lucene MUST semantics).

    ``min_match`` — Solr (e)dismax ``mm``: a disjunctive doc is
    admissible only if it contains at least mm DISTINCT query terms
    (int: same mm for every query; dict: per-query). Lucene counts
    SHOULD clauses matched against the ORIGINAL query — terms absent
    from the index still raise the bar, they never lower it. mm=1 is
    plain OR; mm=len(terms) equals mode='and'. Ignored under
    mode='and'. Scoring stays pure BM25 over the matched terms.

    ``doc_filter`` — Solr fq parity (the reference ANDs field predicates
    into every query, /root/reference/Spcht/Core/WorkOrder.py:702-707):
    a one-column (doc_id) DataFrame of admissible docs; candidates are
    restricted to it by a semi-join AFTER scoring, and — exactly like
    fq — the filter does NOT change scoring (idf/avgdl stay corpus-wide).
    The semi-join shuffles only (query_id, doc_id, score) candidate
    rows, never postings, so it stays narrow at 10^12 docs.

    ``term IN (...)`` is applied before decode so parquet row-group
    min/max stats on the sorted term column prune the block scan.

    ``doclens`` is accepted for API symmetry with IndexTables but no
    longer joined: blocks carry the dl lane and decode_blocks surfaces
    it, removing the postings-wide Exchange.
    """
    all_terms = sorted({t for _, ts, _ in queries for t in ts})
    stats_row, idfs = stats_and_idfs(dictionary, stats, all_terms)
    avgdl = float(stats_row["avgdl"])
    if not idfs:
        # No query term occurs in the corpus → empty result, stable schema.
        return spark.createDataFrame([], schema=TOPK_SCHEMA)

    if mode == "and":
        # drop queries containing any index-absent term (can't be satisfied)
        queries = [q for q in queries if all(t in idfs for t in q[1])]
        if not queries:
            return spark.createDataFrame([], schema=TOPK_SCHEMA)

    qrows = [(qid, t) for qid, ts, _ in queries for t in sorted(set(ts)) if t in idfs]
    query_terms = values_df(spark, qrows, ["query_id", "term"])

    hit_blocks = blocks.where(f"term IN ({sql_in(sorted(idfs))})")
    postings = decode_blocks(hit_blocks)
    scores = score_postings(
        postings, idfs, avgdl, query_terms,
        pre_partition=int(stats_row["n_docs"]) < SALT_MIN_DOCS,
    )
    if doc_filter is not None:
        scores = scores.join(doc_filter.select("doc_id"), "doc_id", "semi")
    if mode == "and":
        n_terms = {qid: len(set(ts)) for qid, ts, _ in queries}
        nt_map = sql_map(sorted(n_terms.items()), lambda n: str(int(n)))
        scores = scores.where(f"n_matched = {nt_map}[query_id]")
    elif min_match is not None:
        mm = (
            {qid: int(min_match) for qid, _, _ in queries}
            if isinstance(min_match, int)
            else {qid: int(min_match.get(qid, 1)) for qid, _, _ in queries}
        )
        mm_map = sql_map(sorted(mm.items()), lambda n: str(int(n)))
        scores = scores.where(f"n_matched >= {mm_map}[query_id]")
    return topk(scores, {qid: k for qid, _, k in queries}, n_docs=int(stats_row["n_docs"]))


def boosted_topk(
    spark: SparkSession,
    blocks: DataFrame,
    doclens: DataFrame,
    dictionary: DataFrame,
    stats: DataFrame,
    queries: list[tuple[str, list[str], int]],
    attrs: DataFrame,
    bf: tuple[Column, list[str]] | None = None,
    boost: tuple[Column, list[str]] | None = None,
) -> DataFrame:
    """Function-query boosting (Solr ``bf=``/``boost=``): disjunctive
    BM25 re-weighted by document-level functions of attribute fields —
    ``score = BM25 · boost(attrs) + bf(attrs)`` (edismax multiplicative
    ``boost`` and additive ``bf``; Lucene FunctionScoreQuery).

    Each of ``bf``/``boost`` is ``(expression Column, [attr columns it
    reads])`` — the explicit column list prunes the attrs join input,
    like the facet specs. The function applies to EVERY admissible
    candidate BEFORE top-k selection (a doc outside the raw BM25 page
    can boost into it), so the join is candidates⋈attrs on doc_id —
    narrow rows, never postings — followed by the standard two-stage
    salted top-k. NULL function values contribute neutrally (boost 1,
    bf 0), Solr's behavior for docs missing the field.
    """
    if bf is None and boost is None:
        return exact_topk(spark, blocks, doclens, dictionary, stats, queries)
    all_terms = sorted({t for _, ts, _ in queries for t in ts})
    stats_row, idfs = stats_and_idfs(dictionary, stats, all_terms)
    avgdl = float(stats_row["avgdl"])
    if not idfs:
        return spark.createDataFrame([], schema=TOPK_SCHEMA)
    qrows = [(qid, t) for qid, ts, _ in queries for t in sorted(set(ts)) if t in idfs]
    query_terms = values_df(spark, qrows, ["query_id", "term"])
    postings = decode_blocks(blocks.where(f"term IN ({sql_in(sorted(idfs))})"))
    scores = score_postings(
        postings, idfs, avgdl, query_terms,
        pre_partition=int(stats_row["n_docs"]) < SALT_MIN_DOCS,
    )
    need = sorted(
        {c for spec in (bf, boost) if spec is not None for c in spec[1]}
    )
    joined = scores.join(
        attrs.select("doc_id", *[F.col(c) for c in need]), "doc_id", "left"
    )
    expr = F.col("score")
    if boost is not None:
        expr = expr * F.coalesce(boost[0].cast("double"), F.lit(1.0))
    if bf is not None:
        expr = expr + F.coalesce(bf[0].cast("double"), F.lit(0.0))
    rescored = joined.select("query_id", "doc_id", expr.alias("score"))
    return topk(rescored, {qid: k for qid, _, k in queries}, n_docs=int(stats_row["n_docs"]))
