"""Spark-free unit equivalence: the pyarrow RE2 tokenizer pipeline must
produce exactly re.findall(TOKEN_REGEX) on adversarial inputs (the
Spark-level agreement test is test_index_build.test_tokenizers_agree)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from spcht_spark.corpus import generate_corpus_local
from spcht_spark.oracle import tokenize_py

PUNCT = r"[{}()\[\];:=,.<>+\-*/]"


def _tok_arrow(texts: list[str]) -> list[list[str]]:
    content = pa.array(texts, type=pa.string())
    s = pc.replace_substring_regex(
        content, pattern=rf"[^A-Za-z0-9_\s{{}}()\[\];:=,.<>+\-*/]", replacement=" "
    )
    s = pc.replace_substring_regex(s, pattern=f"({PUNCT})", replacement=r" \1 ")
    s = pc.replace_substring_regex(
        s, pattern=r"(^|[^A-Za-z0-9_])([0-9]+)([A-Za-z_])", replacement=r"\1\2 \3"
    )
    lists = pc.split_pattern_regex(s, pattern=r"\s+")
    return [[t for t in lst if t != ""] for lst in lists.to_pylist()]


ADVERSARIAL = [
    "foo(bar) { return x; }",
    "9abc 123 abc9 _x9 x9y 99abc99 9abc9def 1_a",
    'weird "quoted" #hash @deco $dollar %percent &amp |pipe ~tilde',
    "a.b.c, d->e f<=g h>=i j*k/l m-n+o p=q",
    "tab\tsep\nnewline  multi   space\r\ncrlf",
    "",
    "((()))[]{};;",
    "émoji ünïcode straße mixédascii",
    "x=1;y=2;z=10*4",
    "__dunder__ _private camelCase PascalCase snake_case SCREAMING",
    "0x1F hex 1e10 sci 3.14 pi",
    "trailing space ",
    " leading",
    "012leading0zeros",
]


def test_arrow_tokenizer_equals_findall_adversarial():
    got = _tok_arrow(ADVERSARIAL)
    for text, g in zip(ADVERSARIAL, got):
        assert g == tokenize_py(text), repr(text)


def test_arrow_tokenizer_equals_findall_corpus():
    texts = generate_corpus_local(50, 2, 30)["content"].tolist()
    got = _tok_arrow(texts)
    for text, g in zip(texts, got):
        assert g == tokenize_py(text)
