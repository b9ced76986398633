"""Deterministic source-code corpus synthesis (FIXTURES.md §F1).

The north-rule input is an Iceberg table of source-code files
``(repo, path, commit, lang, content)`` (BASELINE.json ``input_hint``).
No Iceberg runtime jar ships in this sandbox, so tables are written as
partitioned parquet through :mod:`spcht_spark.sources.catalog`; the read
path is identical (``spark.read.parquet`` ⇄ ``spark.read.format("iceberg")``).

Generation is keyed purely on ``doc_id`` (every random draw seeds from
``(seed, doc_id)``), so the output is byte-identical regardless of
partition count or executor placement — the property that makes the
generator valid at cluster scale and makes the sha256 per-row invariant
(BASELINE.json ``input_hint``; digest helper parity:
/root/reference/Spcht/Utils/local_tools.py:285-286) checkable.

Token frequencies are Zipfian with code keywords/braces at the hot end —
deliberately adversarial for the posting-list shuffle (SURVEY.md §7
"What's hard: skew").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GLOBAL_SEED = 0x5BC47  # fixed; never wall-clock

LANGS = ["python", "java", "js", "go", "rust", "c", "md"]
LANG_WEIGHTS = np.array([0.30, 0.15, 0.15, 0.10, 0.10, 0.10, 0.10])
LANG_EXT = {
    "python": "py", "java": "java", "js": "js", "go": "go",
    "rust": "rs", "c": "c", "md": "md",
}

# Hot head of the vocabulary: braces / keywords shared across languages.
_HOT = [
    "{", "}", "(", ")", ";", "=", ",", "return", "if", "the", "import",
    "def", "for", "int", "else", "func", "let", "fn", "var", "while",
    "class", "public", "static", "void", "new", "self", "this", "const",
]
# Long tail: synthetic identifiers.
_TAIL = (
    [f"handler{i}" for i in range(80)]
    + [f"parse_{i}" for i in range(80)]
    + [f"cfg{i}" for i in range(60)]
    + [f"buf{i}" for i in range(60)]
    + [f"idx{i}" for i in range(60)]
    + [f"token{i}" for i in range(60)]
    + [f"node{i}" for i in range(100)]
)
VOCAB = np.array(_HOT + _TAIL)
# Zipf-ish: p(rank r) ∝ 1/(r+2)^1.07 — keeps the head very hot.
_ranks = np.arange(len(VOCAB), dtype=np.float64)
VOCAB_P = 1.0 / np.power(_ranks + 2.0, 1.07)
VOCAB_P /= VOCAB_P.sum()
_VOCAB_CDF = np.cumsum(VOCAB_P)  # inverse-CDF sampling beats choice(p=) ~20×

_DIRS = ["core", "util", "net", "io", "api", "db", "cli", "test", "pkg"]

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("content_sha256", T.StringType(), False),
    ]
)


def _gen_one(doc_id: int, min_lines: int, max_lines: int) -> tuple:
    rng = np.random.Generator(np.random.PCG64([GLOBAL_SEED, int(doc_id)]))
    repo = f"org{doc_id % 7}/repo{doc_id % 97}"
    lang = LANGS[int(rng.choice(len(LANGS), p=LANG_WEIGHTS))]
    d = _DIRS[int(rng.integers(0, len(_DIRS)))]
    name = f"mod{int(rng.integers(0, 997))}"
    path = f"src/{d}/{name}.{LANG_EXT[lang]}"
    commit = hashlib.sha1(f"{repo}/{path}/{GLOBAL_SEED}".encode()).hexdigest()
    n_lines = int(rng.integers(min_lines, max_lines + 1))
    lens = rng.integers(3, 13, size=n_lines)
    draws = rng.random(int(lens.sum()))
    toks = VOCAB[np.searchsorted(_VOCAB_CDF, draws, side="right")]
    lines, pos = [], 0
    for ln in lens:
        lines.append(" ".join(toks[pos : pos + ln]))
        pos += ln
    content = "\n".join(lines)
    sha = hashlib.sha256(content.encode()).hexdigest()
    return doc_id, repo, path, commit, lang, content, sha


def generate_corpus(
    spark: SparkSession,
    n_docs: int = 2000,
    min_lines: int = 10,
    max_lines: int = 400,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus: ``spark.range`` → ``mapInPandas``.

    Per-doc seeding means adding executors changes nothing but wall time.
    """
    if not 0 < min_lines <= max_lines:
        raise ValueError(f"need 0 < min_lines <= max_lines, got {min_lines}..{max_lines}")
    if n_docs < 1:
        raise ValueError(f"n_docs must be >= 1, got {n_docs}")

    def gen(batches):
        for pdf in batches:
            rows = [_gen_one(int(i), min_lines, max_lines) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in CORPUS_SCHEMA.fields])

    rng = spark.range(0, n_docs, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=CORPUS_SCHEMA)


def generate_corpus_local(n_docs: int = 2000, min_lines: int = 10, max_lines: int = 400) -> pd.DataFrame:
    """Driver-side twin of :func:`generate_corpus` for oracle computation.

    Bit-identical to the distributed path (same per-doc seeding)."""
    rows = [_gen_one(i, min_lines, max_lines) for i in range(n_docs)]
    return pd.DataFrame(rows, columns=[f.name for f in CORPUS_SCHEMA.fields])


def check_sha256_invariant(df: DataFrame) -> int:
    """Rows violating the per-row invariant ``sha2(content,256) == content_sha256``.

    Must be 0 after every pipeline stage (BASELINE.md "Per-row invariant")."""
    return df.filter(F.sha2(F.col("content"), 256) != F.col("content_sha256")).count()


# Reference query set for rank-identity checks (FIXTURES.md §F1):
# mix of 1/2/4-term queries, hot (high-df) and rare terms, k ∈ {10, 100}.
REFERENCE_QUERIES: list[tuple[str, list[str], int]] = (
    [(f"q{i:02d}_hot1", [t], 10) for i, t in enumerate(["return", "{", "import", "if"])]
    + [(f"q{i:02d}_rare1", [t], 10) for i, t in enumerate(["node42", "parse_77", "cfg11", "token59"], start=4)]
    + [
        ("q08_mix2", ["return", "node42"], 10),
        ("q09_mix2", ["import", "handler7"], 10),
        ("q10_hot2", ["{", "}"], 10),
        ("q11_rare2", ["buf33", "idx12"], 10),
        ("q12_mix4", ["def", "self", "node7", "parse_3"], 10),
        ("q13_mix4", ["for", "int", "token3", "cfg5"], 10),
        ("q14_hot4", ["{", "return", "if", "="], 10),
        ("q15_mix2_k100", ["return", "node42"], 100),
        ("q16_hot1_k100", ["import"], 100),
        ("q17_rare1_k100", ["handler42"], 100),
        ("q18_mix4_k100", ["class", "static", "node99", "buf7"], 100),
        ("q19_absent", ["node7", "zzz_not_in_vocab"], 10),
        ("q20_mix3", ["while", "token11", "idx40"], 10),
        ("q21_mix2", ["fn", "node150"], 10),
        ("q22_mix2", ["const", "parse_60"], 10),
        ("q23_hot3", ["(", ")", ";"], 10),
        ("q24_mix4_k100", ["if", "else", "cfg30", "token1"], 100),
    ]
)
