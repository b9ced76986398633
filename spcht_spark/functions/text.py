"""Text-analysis operators (training-data pipeline): language ID,
quality scoring, token counting, document fingerprinting. All pure
Catalyst (split/filter/aggregate higher-order functions) — no Python."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spcht_spark.functions.dedup import ngram_shingles, tokens_col

# Tiny stopword profiles for an n-gram-free heuristic language ID:
# score(lang) = share of tokens in that language's stopword set.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "para", "en"],
}


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, lang_pred, lang_score): argmax stopword-hit-share; 'und'
    (undetermined) when nothing hits."""
    toks = tokens_col(text_col)
    lowered = F.transform(toks, F.lower)
    n = F.greatest(F.size(lowered), F.lit(1))
    scores = [
        (
            lang,
            (
                F.size(F.filter(lowered, lambda x: x.isin(*words))) / n
            ).alias(f"score_{lang}"),
        )
        for lang, words in STOPWORDS.items()
    ]
    ranked = F.array_sort(
        F.array(
            *[
                F.struct((-score).alias("neg"), F.lit(lang).alias("lang"), score.alias("s"))
                for lang, score in scores
            ]
        )
    )
    best = F.element_at(ranked, 1)
    return df.select(
        F.col(id_col).alias("id"),
        F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        F.round(best["s"], 4).alias("lang_score"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_tokens, avg_token_len, stopword_ratio, punct_ratio,
    quality): length/punct/stopword heuristics composited to [0,1]."""
    toks = tokens_col(text_col)
    lowered = F.transform(toks, F.lower)
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1))
    text_len = F.greatest(F.length(text_col), F.lit(1))
    avg_len = F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)) / n1
    stop_ratio = F.size(F.filter(lowered, lambda x: x.isin(*all_stop))) / n1
    punct_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^\p{Punct}]", "")) / text_len
    )
    quality = (
        F.least(n / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(avg_len / F.lit(8.0), F.lit(1.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))) * F.lit(0.3)
    )
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_tokens, n_unique, n_chars) — whitespace + BPE-ish subword
    count (splitting camelCase/digit boundaries like a crude BPE)."""
    toks = tokens_col(text_col)
    subword = F.split(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), r"([a-z])([A-Z])", r"$1 $2"),
            r"([A-Za-z])([0-9])", r"$1 $2",
        ),
        r"\s+",
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.size(F.filter(subword, lambda x: x != "")).alias("n_subwords"),
        F.length(text_col).alias("n_chars"),
    )


def fingerprint(
    df: DataFrame, text_col: str, id_col: str, window: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, fingerprint) — winnowing-style: min over rolling-window token
    n-gram hashes; robust to small edits (document fingerprinting op).

    hash_fn="xxhash64" → bigint fingerprint (default, fastest);
    hash_fn="md5" → lexicographic-min md5 hex string — same selection
    semantics, reproducible in ANSI SQL for the driver's DuckDB oracle."""
    toks = tokens_col(text_col)
    n_windows = F.greatest(F.size(toks) - F.lit(window - 1), F.lit(1))
    if hash_fn == "xxhash64":
        h = lambda c: F.xxhash64(c)
    elif hash_fn == "md5":
        h = lambda c: F.md5(c)
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    win_hashes = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: h(F.array_join(F.slice(toks, i, window), " ")),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_min(win_hashes).alias("fingerprint"),
    )


def _grams_col(toks: Column, n: int) -> Column:
    """Overlapping word n-grams of a token array (space-joined), [] when
    the doc has fewer than n tokens."""
    n_g = F.size(toks) - F.lit(n - 1)
    return F.when(
        n_g > 0,
        F.transform(F.sequence(F.lit(1), n_g), lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    df: DataFrame, text_col: str, id_col: str, top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5,),
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Table A1 repetition filters), word-n-gram
    based: for each n in ``top_ns`` the fraction of characters covered by
    the single most frequent n-gram (``top_{n}gram_frac`` = count ×
    non-space chars of the gram ÷ doc chars; ties break to the
    lexicographically smallest gram), and for each n in ``dup_ns`` the
    fraction of n-gram occurrences that are repeats
    (``dup_{n}gram_frac`` = 1 − distinct/total).

    Entirely in-row (array HOFs over a sorted gram array — the mode is a
    run-length scan, no per-doc shuffle, no explode): the whole signal
    set is ONE codegen'd projection over the corpus scan, which is the
    only shape that survives 100 TB (an explode+groupBy per signal would
    shuffle |tokens| rows per doc). Gap the reference outsources with the
    rest of content analytics to Solr (Spcht feeds Solr full documents:
    /root/reference/Spcht/Core/WorkOrder.py:600-607)."""
    toks = tokens_col(text_col)
    n_chars = F.greatest(F.length(text_col), F.lit(1))
    cols = [F.col(id_col).alias("id")]
    for n in top_ns:
        grams = F.array_sort(_grams_col(toks, n))
        # Run-length scan for the mode: sorted ascending + strict '>'
        # means the first gram to reach the max run wins ⇒ ties resolve
        # to the lexicographically smallest gram (deterministic, matches
        # the oracle's ORDER BY c DESC, gram ASC).
        init = F.struct(
            F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"), F.lit("").alias("bestg"),
        )
        scan = F.aggregate(
            grams,
            init,
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
                F.when(
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)) > acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).cast("long"),
                ).otherwise(acc["best"]).alias("best"),
                F.when(
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)) > acc["best"], x
                ).otherwise(acc["bestg"]).alias("bestg"),
            ),
        )
        frac = (
            scan["best"] * F.length(F.replace(scan["bestg"], F.lit(" "), F.lit("")))
        ) / n_chars
        cols.append(F.round(frac, 4).alias(f"top_{n}gram_frac"))
    for n in dup_ns:
        grams = _grams_col(toks, n)
        total = F.size(grams)
        frac = F.when(
            total > 0,
            F.lit(1.0) - F.size(F.array_distinct(grams)) / total,
        ).otherwise(F.lit(0.0))
        cols.append(F.round(frac, 4).alias(f"dup_{n}gram_frac"))
    return df.select(*cols)


def shared_ngram_share(
    df: DataFrame, text_col: str, id_col: str, n: int = 5
) -> DataFrame:
    """(id, n_grams, n_shared, shared_frac) — corpus-level n-gram
    duplication (the RefinedWeb/CCNet cross-document signal): per doc,
    the share of its DISTINCT word n-grams that also occur in at least
    one OTHER document.

    Scale shape: distinct shingles per doc (in-row, no shuffle) → ONE
    groupBy(shingle) counting holder docs (each doc contributes a
    shingle once, so count == n_docs) → join back on shingle — both
    sides exit the same hash-partitioning, so AQE reuses the exchange —
    → ONE groupBy(id) rollup. Never all-pairs, never per-doc jobs."""
    sh = ngram_shingles(df, text_col, id_col, n)
    counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs_holding"))
    per_doc = (
        sh.join(counts, "shingle")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("n_docs_holding") > 1).cast("long")).alias("n_shared"),
        )
    )
    return per_doc.select(
        "id", "n_grams", "n_shared",
        F.round(F.col("n_shared") / F.greatest("n_grams", F.lit(1)), 4).alias("shared_frac"),
    )


def ngram_contamination(
    df: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
) -> DataFrame:
    """(id, n_grams, n_contaminated, contaminated) — benchmark
    decontamination (the GPT-3/PaLM appendix protocol): a training doc
    is contaminated when it shares at least one word n-gram with any
    document of a held-out benchmark set.

    Scale shape: the corpus side computes distinct n-grams IN-ROW (no
    shuffle) and explodes once; the benchmark side — tiny by
    definition (eval suites are KBs against a 100 TB corpus) — reduces
    to a distinct-shingle frame that BROADCASTS into a left join, so
    the corpus is touched by exactly one scan + one groupBy(id): no
    shuffle of corpus grams against corpus grams, ever. Gap the
    reference outsources with content analytics to Solr
    (/root/reference/Spcht/Core/WorkOrder.py:600-607)."""
    from spcht_spark.functions.dedup import ngram_shingles

    doc_sh = ngram_shingles(df, text_col, id_col, n)
    bench_sh = (
        ngram_shingles(
            bench, bench_text_col or text_col, bench_id_col or id_col, n
        )
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per = (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_contaminated"),
        )
    )
    return per.select(
        "id", "n_grams", "n_contaminated",
        (F.col("n_contaminated") > 0).alias("contaminated"),
    )


# PII patterns kept RE2/Java-common (no backrefs, no lookaround) so the
# same regex runs in Spark (Java), DuckDB (RE2) and Python verbatim.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]"),
]


def scrub_pii(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, text_scrubbed, n_email, n_ipv4, n_phone) — masks emails,
    IPv4 addresses and phone-like digit runs with ``<PII:kind>`` tokens
    (the CCNet/Dolma-style scrub pass) and counts each kind BEFORE
    scrubbing. Pure Catalyst: one codegen'd projection of chained
    regexp_replace + regexp_count, no shuffle, no Python. Order is
    fixed email → ipv4 → phone so a masked email's domain cannot
    re-match as a phone-ish digit run."""
    out = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_t"),
        *[
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{kind}")
            for kind, pat in PII_PATTERNS
        ],
    )
    scrubbed = F.col("_t")
    for kind, pat in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, f"<PII:{kind}>")
    return out.select(
        "id", scrubbed.alias("text_scrubbed"),
        *[f"n_{kind}" for kind, _ in PII_PATTERNS],
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_text) — split each document into
    overlapping token windows (the context-chunking pass of a training
    / RAG pipeline): chunk i covers tokens [i·stride, i·stride +
    chunk_tokens) with stride = chunk_tokens − overlap; the last chunk
    may be short; a non-empty doc always yields ≥ 1 chunk; chunk_id is
    the window index (0-based), so (id, chunk_id) is a stable key
    under any partitioning/retry.

    Entirely in-row (sequence + slice + array_join over the token
    array — one codegen'd projection, then ONE explode): chunking
    never shuffles, so at 100 TB it rides the corpus scan it is fused
    into. Gap the reference outsources with the rest of content
    processing to Solr (/root/reference/Spcht/Core/WorkOrder.py:
    600-607)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens_col(text_col)
    n = F.size(toks)
    # number of stride-starts covering all tokens: 1 + ceil((n - chunk)/stride)
    # clamped to >= 1 for any non-empty doc
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.greatest(
            F.lit(1),
            F.lit(1) + F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int"),
        )
    )
    # guard the empty doc: sequence(0, -1) DESCENDS in Spark
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.alias("chunk_id"),
                F.slice(toks, i * stride + 1, chunk_tokens).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<chunk_id:int,w:array<string>>>"))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(chunks).alias("c"))
        .select(
            "id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.w").alias("n_tokens"),
            F.array_join("c.w", " ").alias("chunk_text"),
        )
    )
