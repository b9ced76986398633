"""Text-analysis operators (training-data pipeline): language ID,
quality scoring, token counting, document fingerprinting. All pure
Catalyst (split/filter/aggregate higher-order functions) — no Python."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spcht_spark.functions.dedup import tokens_col

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
