"""Deduplication operators.

* exact_dedup          — hash-groupBy (one shuffle on the digest)
* ngram_shingles       — token n-grams (pure Catalyst)
* minhash_signatures   — k permutation-free min-hashes per doc
* lsh_candidate_pairs  — banding → bucket self-join (candidates only
                         within equal band-hash buckets: the shuffle is
                         on (band, band_hash), never all-pairs)
* jaccard_pairs        — exact n-gram Jaccard for candidate verification
* simhash              — 64-bit sign-aggregated fingerprint + hamming
* near_dup_components  — iterative min-label propagation (joins only,
                         no driver-side union-find) → cluster ids

MinHash math: h_i(s) = (a_i·x + b_i) mod p over x = xxhash64(shingle),
p = 2^31-1 (Mersenne; a·x then fits int64 — the same prime Spark
MLlib's MinHashLSH uses), (a_i, b_i) seeded deterministically. All
hashing stays in Catalyst (xxhash64 + integer ops); no Python in the
hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE31 = (1 << 31) - 1


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(digest, keep_id, n_dups): canonical row = min id per content hash."""
    return df.groupBy(F.sha2(F.col(text_col), 256).alias("digest")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    )


def tokens_col(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")


def ngram_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) distinct token n-grams — expressed with a sliding
    window over the token array (transform + slice), fully JVM-side."""
    toks = tokens_col(text_col)
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), n_sh), lambda i: F.array_join(F.slice(toks, i, n), " ")
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def _hash_params(num_hashes: int, seed: int) -> tuple[list[int], list[int]]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, MERSENNE31 - 1, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE31 - 1, size=num_hashes, dtype=np.int64)
    return a.tolist(), b.tolist()


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 64, seed: int = 7
) -> DataFrame:
    """(id, sig: array<long>) — min over shingles of (a·x+b) mod p.

    One aggregation shuffle on id; the k hash lanes are computed as an
    array expression per shingle (column-parallel, not k passes).
    xxhash64 is mapped to [0, p) first; with p = 2^31-1 the product
    a·x < 2^62 stays inside int64 (ANSI-overflow-safe)."""
    a, b = _hash_params(num_hashes, seed)
    x = (F.abs(F.xxhash64("shingle")) % F.lit(MERSENNE31)).alias("x")
    base = shingled.select("id", x)

    def lane(ai: int, bi: int) -> Column:
        return F.pmod(F.lit(ai) * F.col("x") + F.lit(bi), F.lit(MERSENNE31))

    lanes = F.array(*[lane(ai, bi) for ai, bi in zip(a, b)])
    per_shingle = base.select("id", lanes.alias("lanes"))
    agg = per_shingle.groupBy("id").agg(
        *[F.min(F.element_at("lanes", i + 1)).alias(f"m{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16) -> DataFrame:
    """(a, b) candidate pairs sharing ≥1 band. Shuffle key = (band,
    band_hash): Zipf-safe because identical docs share buckets but
    distinct docs spread across 2^64 hash space."""
    num_hashes_col = F.size("sig")
    rows_per_band = (num_hashes_col / F.lit(bands)).cast("int")
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("sig"), bnd * rows_per_band + 1, rows_per_band)
                    ).alias("bh"),
                ),
            )
        ).alias("b"),
    ).select("id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    return pairs


def jaccard_pairs(
    shingled: DataFrame, pairs: DataFrame | None = None
) -> DataFrame:
    """Exact n-gram Jaccard. With ``pairs`` given, verifies only the
    candidates (broadcast-able); without, computes all co-shingle pairs
    (inverted-index style join on shingle — only docs sharing a shingle
    ever meet, never a cartesian)."""
    counts = shingled.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    s1 = shingled.alias("s1")
    s2 = shingled.alias("s2")
    inter = (
        s1.join(s2, (F.col("s1.shingle") == F.col("s2.shingle")) & (F.col("s1.id") < F.col("s2.id")))
        .groupBy(F.col("s1.id").alias("a"), F.col("s2.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if pairs is not None:
        inter = inter.join(pairs, ["a", "b"], "inner")
    ca = counts.select(F.col("id").alias("a"), F.col("n").alias("na"))
    cb = counts.select(F.col("id").alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "a")
        .join(cb, "b")
        .select(
            "a", "b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
    )


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash: long) — 64-bit sign aggregate of token-hash bits
    weighted by tf. Bit lanes are an array expression; one shuffle."""
    toks = tokens_col(text_col)
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.xxhash64("term"))
    )
    contribs = F.array(
        *[
            F.when(
                F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.col("tf")
            ).otherwise(-F.col("tf"))
            for i in range(64)
        ]
    )
    per_bit = tf.select("id", contribs.alias("c"))
    summed = per_bit.groupBy("id").agg(
        *[F.sum(F.element_at("c", i + 1)).alias(f"b{i}") for i in range(64)]
    )
    bits = [
        F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        * F.lit(1 << i).cast("long")
        for i in range(63)  # bit 63 kept clear: stay in positive long space
    ]
    acc = bits[0]
    for bcol in bits[1:]:
        acc = acc + bcol
    return summed.select("id", acc.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def near_dup_components(pairs: DataFrame, max_iter: int = 10) -> DataFrame:
    """(id, component) via iterative min-label propagation over the
    candidate-pair graph — pure joins, converges in O(diameter) rounds
    (near-dup clusters are tiny, so a handful of rounds suffices)."""
    # Materialize the graph once: the loop must not re-derive the (often
    # expensive) candidate lineage every round. localCheckpoint also caps
    # plan growth across iterations (else round k replans k nested joins).
    edges = (
        pairs.select("a", "b")
        .union(pairs.select(F.col("b"), F.col("a")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nc"))
        )
        new_labels = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nc"), F.col("component"))).alias(
                    "component"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    seed: int = 7,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bucket join →
    exact-Jaccard verify → connected components → (id, component, keep)."""
    sh = ngram_shingles(df, text_col, id_col, n).cache()
    sigs = minhash_signatures(sh, num_hashes, seed)
    cands = lsh_candidate_pairs(sigs, bands)
    verified = jaccard_pairs(sh, cands).filter(F.col("jaccard") >= jaccard_threshold)
    comps = near_dup_components(verified)
    ids = df.select(F.col(id_col).alias("id"))
    labeled = ids.join(comps, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
    w = Window.partitionBy("component").orderBy("id")
    return labeled.withColumn("keep", F.row_number().over(w) == 1)
