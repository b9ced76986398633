"""Training-data ops: dedup, similarity, text analysis, multimodal."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spcht_spark.functions import dedup as D
from spcht_spark.functions import similarity as S
from spcht_spark.functions import text as X
from spcht_spark.functions.multimodal import decode_and_featurize, synth_media


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup
        (3, "the quick brown fox jumps over the lazy dog near the river shore"),  # near dup
        (4, "completely different content about spark query engines and columnar execution"),
        (5, "der hund läuft über die straße und die katze ist nicht da"),
        (6, "le chat est dans la maison et le chien est pour la porte"),
    ]
    return spark.createDataFrame(rows, ["id", "text"]).cache()


def test_exact_dedup(docs):
    out = D.exact_dedup(docs, "text", "id").collect()
    dups = {r["keep_id"]: r["n_dups"] for r in out}
    assert dups[1] == 2  # ids 1,2 collapse
    assert len(out) == 5


def test_shingles_and_minhash_vs_oracle(spark, docs):
    sh = D.ngram_shingles(docs, "text", "id", n=3)
    # oracle: recompute shingles in python
    pdf = docs.toPandas()
    for _, row in pdf.iterrows():
        toks = row["text"].split()
        want = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        got = {r["shingle"] for r in sh.filter(F.col("id") == row["id"]).collect()}
        assert got == want, f"doc {row['id']}"

    # minhash lanes vs numpy oracle using Spark's own xxhash64 values
    base = sh.withColumn("x", F.abs(F.xxhash64("shingle")) % F.lit(D.MERSENNE31)).toPandas()
    a, b = D._hash_params(8, seed=7)
    sigs = {r["id"]: r["sig"] for r in D.minhash_signatures(sh, num_hashes=8, seed=7).collect()}
    for doc_id, grp in base.groupby("id"):
        xs = grp["x"].to_numpy(dtype=object)
        want = [
            min((int(ai) * int(x) + int(bi)) % D.MERSENNE31 for x in xs)
            for ai, bi in zip(a, b)
        ]
        assert list(sigs[doc_id]) == want, f"doc {doc_id}"


def test_minhash_dedup_pipeline(docs):
    out = D.minhash_dedup(docs, "text", "id", n=3, num_hashes=64, bands=16,
                          jaccard_threshold=0.5).collect()
    comp = {r["id"]: r["component"] for r in out}
    keep = {r["id"]: r["keep"] for r in out}
    assert comp[1] == comp[2] == comp[3]  # dup cluster
    assert comp[4] not in (comp[1],)
    assert keep[1] and not keep[2] and not keep[3]
    assert keep[4] and keep[5] and keep[6]


def test_minhash_dedup_planted_identical_cluster(spark):
    """Hot-key bound: a big cluster of byte-identical docs must collapse
    BEFORE MinHash (one representative) — O(cluster) work, not
    O(cluster²) candidate pairs — while the output still labels every
    member with the same component and keeps exactly the min id."""
    n_clone = 2000
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
            for i in range(n_clone)]
    rows += [(10_000 + i, f"unique text number {i} spark w{i} x{i} y{i} z{i} q{i}")
             for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = D.minhash_dedup(df, "text", "doc_id", n=3, jaccard_threshold=0.8).collect()
    comp = {r["id"]: r["component"] for r in out}
    keeps = sorted(r["id"] for r in out if r["keep"])
    assert all(comp[i] == 0 for i in range(n_clone))
    assert keeps == [0] + [10_000 + i for i in range(8)]
    # the candidate stage only ever saw the representatives: rebuild the
    # rep-level pipeline and count pairs — must be O(#reps), not O(n²)
    reps = df.groupBy(F.sha2("text", 256).alias("d")).agg(F.min("doc_id").alias("doc_id"))
    sh = D.ngram_shingles(df.join(reps.select("doc_id"), "doc_id"), "text", "doc_id", n=3)
    n_pairs = D.lsh_candidate_pairs(D.minhash_signatures(sh)).count()
    assert n_pairs <= 9 * 8 / 2  # 9 reps max


def test_lsh_bucket_cap_chains_not_squares(spark):
    """max_bucket: an oversized LSH bucket emits a chain (B-1 pairs),
    not B²/2, while keeping its members transitively connected."""
    n = 200
    # near-identical docs (one trailing unique token) → same band buckets
    rows = [(i, "one two three four five six seven eight nine ten t" + str(i % 2))
            for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = D.minhash_signatures(D.ngram_shingles(df, "text", "doc_id", n=3))
    unbounded = D.lsh_candidate_pairs(sigs).count()
    capped = D.lsh_candidate_pairs(sigs, max_bucket=16).count()
    assert unbounded > 4000  # ~n²/2 within each half
    assert capped < 3 * n  # chains: O(n)
    # connectivity preserved: components over capped pairs still group
    # each near-identical half into one cluster
    comps = D.near_dup_components(D.lsh_candidate_pairs(sigs, max_bucket=16))
    labels = {r["id"]: r["component"] for r in comps.collect()}
    assert len({labels[i] for i in range(0, n, 2)}) == 1
    assert len({labels[i] for i in range(1, n, 2)}) == 1


def test_jaccard_pairs_max_shingle_df(docs):
    """df-threshold drops hot shingles from candidate generation only:
    surviving pairs keep EXACT jaccard values."""
    sh = D.ngram_shingles(docs, "text", "id", n=3)
    full = {(r["a"], r["b"]): r["jaccard"] for r in D.jaccard_pairs(sh).collect()}
    # threshold high enough to keep all shingles → identical output
    same = {(r["a"], r["b"]): r["jaccard"]
            for r in D.jaccard_pairs(sh, max_shingle_df=100).collect()}
    assert same == full
    # df<=2 drops the 3-doc-shared shingles from candidate generation,
    # but pairs found via rarer shingles still report exact values
    bounded = {(r["a"], r["b"]): r["jaccard"]
               for r in D.jaccard_pairs(sh, max_shingle_df=2).collect()}
    for pair, j in bounded.items():
        assert j == full[pair]


def test_jaccard_pairs_exact(docs):
    j = {(r["a"], r["b"]): r["jaccard"] for r in D.jaccard_pairs(
        D.ngram_shingles(docs, "text", "id", n=3)
    ).collect()}
    assert j[(1, 2)] == 1.0
    assert 0.5 < j[(1, 3)] < 1.0


def test_simhash(docs):
    out = {r["id"]: r["simhash"] for r in D.simhash(docs, "text", "id").collect()}
    assert out[1] == out[2]
    d_near = bin(out[1] ^ out[3]).count("1")
    d_far = bin(out[1] ^ out[4]).count("1")
    assert d_near < d_far
    assert d_near <= 16


def test_near_dup_components_graph(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], ["a", "b"])
    comp = {r["id"]: r["component"] for r in D.near_dup_components(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[7] == comp[8] == 7


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def _queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )


def test_lsh_recall_vs_brute(spark, emb):
    q = _queries(emb)
    brute = S.brute_force_topk(emb, q, k=10)
    approx = S.lsh_topk(emb, q, k=10, n_planes=6, n_tables=10, dim=64)
    b = {(r["q_id"], r["vec_id"]) for r in brute.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.3, f"LSH recall too low: {recall}"
    # self-match must always be rank 1 (cos=1)
    top1 = {r["q_id"]: r["vec_id"] for r in approx.filter("rnk=1").collect()}
    assert all(q_id == v for q_id, v in top1.items())


def test_ivf_recall_vs_brute(spark, emb):
    q = _queries(emb)
    brute = S.brute_force_topk(emb, q, k=10)
    approx = S.ivf_topk(emb, q, k=10, n_cells=8, nprobe=4)
    b = {(r["q_id"], r["vec_id"]) for r in brute.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_language_id(spark):
    rows = [
        (1, "the cat is in the house and the dog is at the door"),
        (2, "der hund und die katze ist nicht in das haus"),
        (3, "le chat est dans la maison et pour le chien"),
        (4, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["id"]: r["lang_pred"] for r in X.language_id(df, "text", "id").collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr" and out[4] == "und"


def test_quality_score(docs):
    out = {r["id"]: r for r in X.quality_score(docs, "text", "id").collect()}
    assert 0 <= out[1]["quality"] <= 1
    assert out[1]["n_tokens"] == 13
    assert out[1]["stopword_ratio"] > 0


def test_token_stats_and_fingerprint(spark, docs):
    ts = {r["id"]: r for r in X.token_stats(docs, "text", "id").collect()}
    assert ts[1]["n_tokens"] == 13 and ts[1]["n_unique"] == 11
    fp = {r["id"]: r["fingerprint"] for r in X.fingerprint(docs, "text", "id").collect()}
    assert fp[1] == fp[2]  # identical docs → identical fingerprint
    camel = spark.createDataFrame([(1, "fooBar baz99 plainword")], ["id", "text"])
    st = X.token_stats(camel, "text", "id").collect()[0]
    assert st["n_tokens"] == 3 and st["n_subwords"] == 5


def test_multimodal_plumbing(spark):
    media = synth_media(spark, n=30)
    feats = decode_and_featurize(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 16 for r in rows)
    # determinism: same payload → same feature
    again = {r["media_id"]: r["feature"] for r in decode_and_featurize(media, dim=16).collect()}
    first = {r["media_id"]: r["feature"] for r in rows}
    assert again == first
    # sha256 invariant against payload
    joined = media.join(feats, "media_id").withColumn(
        "chk", F.sha2(F.col("payload"), 256) == F.col("payload_sha256")
    )
    assert joined.filter(~F.col("chk")).count() == 0


def test_lsh_candidate_side_carries_no_vector(spark, emb):
    """Scale contract: the ×n_tables exploded bucket-join input must not
    carry the embedding (round-2 VERDICT #2) — candidates rejoin the
    vector table for rescoring instead. Checked on the physical plan:
    every Generate (explode) output is vector-free."""
    q = _queries(emb)
    plan = S.lsh_topk(emb, q, k=5, n_planes=6, n_tables=10, dim=64)._jdf.queryExecution().executedPlan().toString()
    import re
    gens = re.findall(r"Generate explode.*", plan)
    assert gens, "expected explode nodes in the plan"
    for g in gens:
        # the node's trailing [..] group is its OUTPUT column list; the
        # explode EXPRESSION legitimately reads the embedding (codes are
        # computed from it before the row is emitted vector-free)
        out_cols = re.findall(r"\[([^\[\]]*)\]", g)[-1]
        assert "embedding" not in out_cols, g[:200] + " ... " + out_cols


def test_minhash_bounded_equals_exact(spark, docs):
    """preset='web' (chain-linked buckets + hot-shingle exclusion) must
    produce the same clustering as the exact configuration on data
    without pathological mass (the bounds are protection, not a
    semantics change)."""
    exact = {
        (r["id"], r["component"], r["keep"])
        for r in D.minhash_dedup(
            docs, "text", "id", n=3, num_hashes=128, bands=64,
            jaccard_threshold=0.8,
        ).collect()
    }
    bounded = {
        (r["id"], r["component"], r["keep"])
        for r in D.minhash_dedup(
            docs, "text", "id", n=3, num_hashes=128, bands=64,
            jaccard_threshold=0.8, preset="web",
        ).collect()
    }
    assert exact == bounded


def test_embedding_dedup_known_clusters(spark):
    """Constructed vectors with two tight clusters + singletons: the
    (component, keep) output equals hand-computed connected components
    over the exact cos >= 0.9 graph, at full pair gen and with
    max_bucket chaining."""
    import numpy as np

    from spcht_spark.functions.dedup import embedding_dedup

    rng = np.random.Generator(np.random.PCG64(3))
    base_a = rng.standard_normal(16)
    base_b = rng.standard_normal(16)
    rows = []
    for i in range(4):  # cluster A: ids 0-3, tiny perturbations
        rows.append((i, (base_a + 0.01 * rng.standard_normal(16)).tolist()))
    for i in range(3):  # cluster B: ids 10-12
        rows.append((10 + i, (base_b + 0.01 * rng.standard_normal(16)).tolist()))
    for i in range(5):  # singletons: ids 100+
        rows.append((100 + i, rng.standard_normal(16).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    for mb in (None, 2):
        got = {
            r["id"]: (r["component"], r["keep"])
            for r in embedding_dedup(
                df, "embedding", "vec_id", threshold=0.9,
                n_planes=2, n_tables=12, dim=16, max_bucket=mb,
            ).collect()
        }
        for i in range(4):
            assert got[i] == (0, i == 0), (mb, i)
        for i in range(10, 13):
            assert got[i] == (10, i == 10), (mb, i)
        for i in range(100, 105):
            assert got[i] == (i, True), (mb, i)


def test_embedding_dedup_exact_duplicates_and_threshold(spark):
    """Identical vectors always cluster (cos = 1 in every table);
    orthogonal vectors never do at any positive threshold."""
    from spcht_spark.functions.dedup import embedding_dedup

    e1 = [1.0] + [0.0] * 15
    e2 = [0.0, 1.0] + [0.0] * 14
    df = spark.createDataFrame(
        [(1, e1), (2, e1), (3, e2)], ["vec_id", "embedding"]
    )
    got = {
        r["id"]: (r["component"], r["keep"])
        for r in embedding_dedup(
            df, "embedding", "vec_id", threshold=0.99,
            n_planes=2, n_tables=8, dim=16,
        ).collect()
    }
    assert got == {1: (1, True), 2: (1, False), 3: (3, True)}


def test_repetition_signals_pinned(spark):
    """Hand-computed Gopher repetition fractions, incl. a tie resolved
    to the lexicographically smallest gram and a doc shorter than n."""
    from spcht_spark.functions.text import repetition_signals

    docs = spark.createDataFrame(
        [
            # "b c" x2 and "a b" x1, "c a" x1, "c b" x1... tokens:
            # a b c b c  -> bigrams: "a b","b c","c b","b c"; mode "b c" x2
            # chars: len("a b c b c")=9; gram chars (no space)=2
            (1, "a b c b c"),
            # every bigram unique, all count 1 -> tie -> smallest "a b"
            (2, "a b c d"),
            # shorter than 5 tokens -> dup_5gram 0; single token -> no bigram
            (3, "solo"),
            # 6 tokens all "x": 5-grams: 2 total, 1 distinct -> dup 0.5
            (4, "x x x x x x"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["id"]: (r["top_2gram_frac"], r["top_3gram_frac"], r["dup_5gram_frac"])
        for r in repetition_signals(docs, "text", "doc_id").collect()
    }
    assert got[1] == (round(2 * 2 / 9, 4), round(1 * 3 / 9, 4), 0.0)
    # doc 2: mode bigram "a b" count 1, 2 chars / 7; trigram "a b c", 3/7
    assert got[2] == (round(2 / 7, 4), round(3 / 7, 4), 0.0)
    assert got[3] == (0.0, 0.0, 0.0)
    # doc 4: bigram "x x" count 5, 2 chars / len("x x x x x x")=11
    assert got[4] == (round(5 * 2 / 11, 4), round(4 * 3 / 11, 4), 0.5)


def test_shared_ngram_share_pinned(spark):
    """Cross-doc 3-gram sharing: identical docs share everything, a
    disjoint doc shares nothing; within-doc duplicate grams count once."""
    from spcht_spark.functions.text import shared_ngram_share

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # grams: "a b c","b c d"
            (2, "a b c d"),        # identical -> both shared
            (3, "q r s t u"),      # disjoint -> 0 shared of 3
            (4, "a b c a b c a"),  # grams incl "a b c" (shared), others not
        ],
        ["doc_id", "text"],
    )
    got = {
        r["id"]: (r["n_grams"], r["n_shared"], r["shared_frac"])
        for r in shared_ngram_share(docs, "text", "doc_id", n=3).collect()
    }
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 2, 1.0)
    assert got[3] == (3, 0, 0.0)
    # doc 4 distinct 3-grams: "a b c","b c a","c a b" -> only "a b c" shared
    assert got[4] == (3, 1, round(1 / 3, 4))


def test_ngram_contamination_pinned(spark):
    """A doc sharing one 3-gram with the benchmark flags; a disjoint
    doc does not; counts are over DISTINCT doc grams."""
    from spcht_spark.functions.text import ngram_contamination

    corpus = spark.createDataFrame(
        [(10, "the quick brown fox jumps"),     # shares "quick brown fox"
         (11, "totally different words here"),  # disjoint
         (12, "the quick brown the quick brown fox")],  # dup grams count once
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(1, "a quick brown fox ran")], ["doc_id", "text"]
    )
    got = {
        r["id"]: (r["n_grams"], r["n_contaminated"], r["contaminated"])
        for r in ngram_contamination(
            corpus, bench, "text", "doc_id", n=3
        ).collect()
    }
    assert got[10] == (3, 1, True)
    assert got[11] == (2, 0, False)
    # doc 12 distinct 3-grams: "the quick brown","quick brown the",
    # "brown the quick","quick brown fox" -> 4, 2 shared ("quick brown
    # fox" and "the quick brown"? benchmark grams: "a quick brown",
    # "quick brown fox","brown fox ran" -> only "quick brown fox")
    assert got[12] == (4, 1, True)


def test_scrub_pii_masks_and_counts(spark):
    from spcht_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex.co.uk ip 10.0.0.1 tel +49 (30) 1234-5678"),
         (2, "no pii at all")],
        ["doc_id", "text"],
    )
    got = {r["id"]: r.asDict() for r in scrub_pii(df, "text", "doc_id").collect()}
    assert got[1]["text_scrubbed"] == "mail <PII:email> ip <PII:ipv4> tel <PII:phone>"
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 1, 1)
    assert got[2]["text_scrubbed"] == "no pii at all"


def test_chunk_documents_windows(spark):
    """Window arithmetic pinned: stride = chunk - overlap, last chunk
    short, single short doc -> one chunk, empty doc -> none, adjacent
    chunks share exactly `overlap` tokens."""
    from spcht_spark.functions.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, " ")],
        ["doc_id", "text"],
    )
    rows = sorted(
        chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=1)
        .collect(),
        key=lambda r: (r["id"], r["chunk_id"]),
    )
    got = [(r["id"], r["chunk_id"], r["chunk_text"]) for r in rows]
    assert got == [
        (1, 0, "t0 t1 t2 t3"),
        (1, 1, "t3 t4 t5 t6"),
        (1, 2, "t6 t7 t8 t9"),
        (2, 0, "a b"),
    ]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=4)
