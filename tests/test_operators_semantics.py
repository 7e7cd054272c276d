"""Semantic tests for the dedup / similarity operators on hand-built
corpora (the oracle harness checks cross-engine equivalence; these check
the operators actually *do the job* — near-dups found, ANN ⊆ exact)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def session():
    from ocr_api_spark.plans.session import build_session

    return build_session(app_name="op-tests", master="local[4]", shuffle_partitions=4)


BASE = (
    "the quick brown fox jumps over the lazy dog while the distributed engine "
    "shuffles partitions across executors and amortizes serialization costs"
)


@pytest.fixture(scope="module")
def near_dup_docs(session):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),  # near dup of 0
        (3, "completely different text about cooking pasta with tomatoes and basil leaves"),
        (4, "another unrelated document describing mountain hiking trails in the alps region"),
    ]
    return session.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_counts(session, near_dup_docs):
    from pyspark.sql import functions as F

    from ocr_api_spark.operators.dedup import exact_duplicate_stats

    out = exact_duplicate_stats(near_dup_docs.withColumn("source", F.lit("s")), "text", "source").collect()[0]
    assert out["rows"] == 5
    assert out["distinct_texts"] == 4  # 0 and 1 collapse


def test_minhash_lsh_finds_near_dups(session, near_dup_docs):
    from ocr_api_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures, word_shingles

    sh = word_shingles(near_dup_docs, "text", 3)
    sigs = minhash_signatures(sh, k=4)
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs, [(0, 1), (2, 3)]).collect()}
    assert (0, 1) in pairs  # exact dup always shares every band
    assert (0, 3) not in pairs and (0, 4) not in pairs  # unrelated never


def test_ngram_jaccard_values(session, near_dup_docs):
    from ocr_api_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(near_dup_docs, "text", 3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.5 < pairs[(0, 2)] < 1.0  # one word changed
    assert (0, 3) not in pairs


def test_simhash_near_dup_proximity(session, near_dup_docs):
    from ocr_api_spark.operators.dedup import simhash64

    rows = simhash64(near_dup_docs, "text").collect()
    out = {r["doc_id"]: int(r["simhash"], 2) for r in rows}
    assert out[0] == out[1]  # identical text -> identical signature
    for r in rows:  # bands are the 16-bit slices of the signature
        assert r["simhash"] == r["band0"] + r["band1"] + r["band2"] + r["band3"]
        assert len(r["simhash"]) == 64 and set(r["simhash"]) <= {"0", "1"}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(out[0], out[2]) < hamming(out[0], out[3])


def test_ann_subset_of_exact(session):
    import random

    from ocr_api_spark.operators.similarity import ann_topk_lsh, cosine_topk

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)]
    df = session.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [rng.uniform(-1, 1) for _ in range(16)]

    exact = [r["vec_id"] for r in cosine_topk(df, q, 10).collect()]
    approx = ann_topk_lsh(df, q, 10, bits=4)
    approx_ids = [r["vec_id"] for r in approx.collect()]
    # the ANN candidates must be ranked by the same exact cosine, and the
    # query's own bucket must contain its true nearest neighbour most of
    # the time at 4 bits; require ≥3/10 recall (deterministic seed)
    recall = len(set(exact) & set(approx_ids)) / 10
    assert recall >= 0.3, recall

    # multiprobe (r7): radius-1 probes every bucket one hyperplane away,
    # so its candidate set is a superset and recall is monotone in the
    # radius; at radius=bits the probe set is ALL buckets = exact
    r1_ids = {r["vec_id"] for r in ann_topk_lsh(df, q, 10, bits=4, probe_radius=1).collect()}
    assert len(set(exact) & r1_ids) >= len(set(exact) & set(approx_ids))
    full = [r["vec_id"] for r in ann_topk_lsh(df, q, 10, bits=4, probe_radius=4).collect()]
    assert full == exact


def test_lang_guess_on_real_stopwords(session):
    from ocr_api_spark.operators.textstats import with_lang_guess

    rows = [
        (1, "the cat sat on the mat and looked at the dog"),
        (2, "el gato y la casa de la abuela en madrid"),
        (3, "le chat et les maisons des amis en france"),
        (4, "xyzzy qwerty asdf"),
    ]
    df = session.createDataFrame(rows, "id int, text string")
    out = {r["id"]: r["lang_guess"] for r in with_lang_guess(df).collect()}
    assert out == {1: "en", 2: "es", 3: "fr", 4: "und"}


def test_ivf_ann_recall(session):
    import random

    from ocr_api_spark.operators.ivf import build_ivf, ivf_topk
    from ocr_api_spark.operators.similarity import cosine_topk

    rng = random.Random(9)
    # two well-separated clusters + noise so IVF lists are meaningful
    rows = []
    for i in range(400):
        base = 1.0 if i % 2 == 0 else -1.0
        rows.append((i, [base + rng.uniform(-0.3, 0.3) for _ in range(8)]))
    df = session.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0] * 8

    assigned, centroids = build_ivf(df, k=4)
    exact = [r["vec_id"] for r in cosine_topk(df, q, 10).collect()]

    def recall(n_probe):
        ids = [r["vec_id"] for r in ivf_topk(assigned, centroids, q, 10, n_probe=n_probe).collect()]
        return len(set(exact) & set(ids)) / 10

    # more probes -> more recall; probing every positive-side list is exact
    r2, r4 = recall(2), recall(4)
    assert r2 >= 0.5, r2
    assert r4 == 1.0, r4
    assert r4 >= r2

    # determinism: same seed -> same assignment
    assigned2, centroids2 = build_ivf(df, k=4)
    assert centroids == centroids2


def test_winnowing_guarantee(session):
    """Winnowing's core guarantee: two documents sharing a run of at
    least w+k-1 words share at least one fingerprint; disjoint texts
    share none."""
    from ocr_api_spark.operators.dedup import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words >= w+k-1 = 6
    docs = session.createDataFrame(
        [
            (0, f"intro words here {shared} tail one"),
            (1, f"totally different head {shared}"),
            (2, "unrelated content about nothing shared at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, "text", k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[0] & by_doc[1]  # shared run -> shared fingerprint
    assert not (by_doc[0] & by_doc[2])
    # short doc (< w windows) still contributes its global min
    short = session.createDataFrame([(9, "just four tiny words")], "doc_id long, text string")
    assert winnowing_fingerprints(short, "text").count() == 1


def test_winnowing_plan_shape(session):
    """Window-based sliding min: exactly one shuffle (hash on the
    high-cardinality doc key), codegen'd window, no Python — the linear
    shape (every array-lambda formulation measured superlinear on long
    docs because Spark re-evaluates captured chains per element)."""
    from ocr_api_spark.operators.dedup import winnowing_fingerprints

    docs = session.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = winnowing_fingerprints(docs, "text")
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Window" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # formatted explain names nodes tersely; the details section shows the
    # hashpartitioning argument
    assert "Exchange" in plan


def test_shingle_ops_scale_linearly(session):
    """Regression guard for the split-in-lambda trap: 16k-word docs must
    process in seconds, not minutes (the transform-over-indices shingle
    builder measured O(words^2))."""
    import time

    from ocr_api_spark.operators.dedup import winnowing_fingerprints

    text = " ".join(f"w{i % 97}x{i % 13}" for i in range(16000))
    df = session.createDataFrame([(i, text) for i in range(4)], "doc_id long, text string")
    winnowing_fingerprints(df, "text").count()  # warm
    t0 = time.time()
    winnowing_fingerprints(df, "text").count()
    assert time.time() - t0 < 30, "shingle construction went superlinear again"


def test_near_dup_pairs_finds_identical_vectors(session):
    from ocr_api_spark.operators.similarity import near_dup_pairs

    base = [0.5, -0.25, 0.75, -1.0, 0.1, 0.2, -0.3, 0.4] + [0.0] * 8
    near = [v * 1.01 for v in base]  # same direction -> cosine ~1
    opposite = [-v for v in base]
    rows = [(1, base), (2, near), (3, opposite), (4, [1.0] * 16)]
    df = session.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in near_dup_pairs(df, 0.9).collect()}
    assert pairs[(1, 2)] >= 0.999
    assert (1, 3) not in pairs  # opposite sign pattern -> different bucket
    assert (1, 4) not in pairs  # different bucket and low cosine


def test_auto_sign_bits_scales_with_corpus():
    from ocr_api_spark.operators.similarity import auto_sign_bits

    assert auto_sign_bits(500, 64) == 4  # floor: min_bits
    assert auto_sign_bits(2_000, 64) == 6
    assert auto_sign_bits(1_000_000, 64) == 15
    assert auto_sign_bits(10**12, 64) == 35  # grows with log2(n)
    assert auto_sign_bits(10**12, 16) == 16  # clamped to the dims
    assert auto_sign_bits(0, 64) == 4


def test_near_dup_pairs_auto_matches_explicit_bits(session):
    from ocr_api_spark.operators.similarity import near_dup_pairs

    rows = [(i, [float((i >> b) & 1) - 0.5 for b in range(16)]) for i in range(40)]
    df = session.createDataFrame(rows, "vec_id long, embedding array<double>")
    # n=40 -> ceil(log2(40/32)) = 1 -> clamped to min_bits=4
    auto = sorted(tuple(r) for r in near_dup_pairs(df, 0.5, bits="auto").collect())
    explicit = sorted(tuple(r) for r in near_dup_pairs(df, 0.5, bits=4).collect())
    assert auto == explicit and len(auto) > 0


def test_near_dup_pairs_multiband_recovers_cross_band_pair(session):
    """bits growth costs recall; disjoint-dim bands win it back: this
    pair disagrees on a dim in band 0 but matches band 1 exactly."""
    from ocr_api_spark.operators.similarity import near_dup_pairs

    a = [0.01, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]
    b = [-0.01, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]  # cosine ~0.9999
    df = session.createDataFrame(
        [(1, a), (2, b)], "vec_id long, embedding array<double>"
    )
    single = near_dup_pairs(df, 0.9, bits=4).collect()
    assert single == []  # band 0 sign patterns differ
    two_band = [tuple(r) for r in near_dup_pairs(df, 0.9, bits=4, n_bands=2).collect()]
    assert len(two_band) == 1 and two_band[0][:2] == (1, 2)


def test_lsh_bucket_cap_drops_mega_cluster(session, caplog):
    """Round-2 verdict #3: a 100-copy exact-duplicate cluster must not
    produce c(c-1)/2 pairs when the cap is set — the oversized bucket
    is dropped (and logged); genuinely-near pairs in small buckets
    survive."""
    import logging

    from ocr_api_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures_arr

    boiler = "exact copy of the same boilerplate page body " * 4
    rows = [(i, boiler) for i in range(100)]
    rows += [(200, "a genuinely unique sentence about winnowing fingerprints"),
             (201, "a genuinely unique sentence about winnowing fingerprints")]
    docs = session.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures_arr(docs, "text", n=3, k=4)
    bands = [(0, 1), (2, 3)]

    uncapped = lsh_candidate_pairs(sigs, bands).count()
    assert uncapped == 100 * 99 // 2 + 1  # the quadratic blowup, plus the real pair

    with caplog.at_level(logging.WARNING, logger="ocr_api_spark.operators.dedup"):
        capped = [tuple(r) for r in lsh_candidate_pairs(sigs, bands, max_bucket_size=10).collect()]
    assert capped == [(200, 201)]
    assert any("oversized bucket" in r.message for r in caplog.records)
    assert any("100 rows" in r.getMessage() for r in caplog.records)


def test_bpe_token_count_semantics(session):
    from ocr_api_spark.operators.textstats import with_bpe_token_count

    df = session.createDataFrame(
        [(1, "hello, world! x2024 a-b")], "doc_id long, text string"
    )
    out = with_bpe_token_count(df).collect()[0]
    # hello , world ! x 2024->202+4 a - b  => 10 pre-tokens
    assert out["bpe_token_count"] == 10


def test_minhash_projection_equals_exploded_form(session, near_dup_docs):
    """The array-fold signatures must equal the explode→groupBy form
    bit-for-bit (same hash, same distinct-shingle set)."""
    from ocr_api_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_arr,
        word_shingles,
    )

    exploded = {
        tuple(r) for r in minhash_signatures(word_shingles(near_dup_docs, "text", 3), k=4).collect()
    }
    projected = {tuple(r) for r in minhash_signatures_arr(near_dup_docs, "text", 3, k=4).collect()}
    assert exploded == projected


def test_minhash_codegen_explode_single_exchange(session):
    """r8 shape: the k md5s are computed in a codegen'd projection over
    the exploded shingles (no interpreted higher-order lambdas) and the
    k mins ride ONE map-side-combined aggregate — exactly one exchange,
    keyed on the doc id, carrying partially-aggregated rows."""
    import re

    from ocr_api_spark.operators.dedup import minhash_signatures_arr

    docs = session.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = minhash_signatures_arr(docs, "text", 3, k=4)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "partial_min" in plan, plan  # map-side combine before the shuffle
    # the k×md5 hashing left the interpreted array_min/transform path
    # (the shingle-array build itself still uses linear zip_with lambdas)
    assert "array_min" not in plan, plan


def test_kmeans_lloyd_partition_invariant(session):
    """The decimal-exact centroid update makes the iterative k-means
    bit-identical regardless of how the input is partitioned — the
    property that lets an iterative algorithm live in the exact
    correctness gate."""
    from ocr_api_spark.operators.ivf import kmeans_lloyd

    emb = session.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a_df, a_cents = kmeans_lloyd(emb.repartition(1), k=3, iters=2)
    b_df, b_cents = kmeans_lloyd(emb.repartition(13), k=3, iters=2)
    assert repr(a_cents) == repr(b_cents)
    a = {r["vec_id"]: r["ivf_list"] for r in a_df.collect()}
    b = {r["vec_id"]: r["ivf_list"] for r in b_df.collect()}
    assert a == b
    assert len(set(a.values())) > 1  # actually clusters


def test_bpe_merge_rank_known_strings():
    """True merge-rank BPE (kernels/bpe.py): pinned tokenizations of
    known strings under the deterministic default merges table —
    rank order (not greedy scanning) drives the merge loop."""
    from ocr_api_spark.kernels.bpe import BpeTokenizer, default_merges, encode_word, merge_ranks

    tok = BpeTokenizer()
    assert tok.encode("the theory") == ["the</w>", "the", "or", "y</w>"]
    assert tok.encode("that that") == ["that</w>", "that</w>"]
    assert tok.encode("hello world") == ["h", "e", "l", "l", "o</w>", "wor", "ld</w>"]
    assert tok.encode("a 1234 b!") == [
        "a</w>", "1", "2", "3", "</w>", "4", "</w>", "b", "</w>", "!", "</w>",
    ]
    assert tok.encode("training") == ["t", "r", "ain", "in", "g</w>"]
    assert tok.count("the theory") == 4

    # the trainer is deterministic and its first merges are the classic
    # English pair frequencies
    merges = default_merges()
    assert merges[1] == ("t", "h")
    assert ("th", "e") in merges

    # rank order beats left-to-right greediness: with ranks where (b,c)
    # outranks (a,b), 'abc' must merge bc first
    ranks = merge_ranks([("b", "c"), ("a", "bc")])
    assert encode_word("abc", ranks) == ("abc", "</w>")


def test_bpe_operator_matches_kernel(session):
    from ocr_api_spark.kernels.bpe import BpeTokenizer
    from ocr_api_spark.operators.textstats import with_bpe_merge_token_count

    rows = [("d1", "the quick brown fox"), ("d2", "that that is is"), ("d3", "")]
    df = session.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["bpe_merge_token_count"] for r in with_bpe_merge_token_count(df).collect()}
    tok = BpeTokenizer()
    assert got == {"d1": tok.count(rows[0][1]), "d2": tok.count(rows[1][1]), "d3": 0}


def test_pq_encode_and_adc_semantics(session):
    """PQ: codes are the per-subspace argmin; ADC distance equals the
    codebook-space distance computed by hand; top-k ranks by it."""
    from ocr_api_spark.operators.pq import adc_lut, default_codebooks, pq_adc_topk, pq_encode

    books = default_codebooks()
    dsub = len(books[0][0])
    # vectors placed exactly on centroids -> codes are known
    def vec_for(codes):
        v = []
        for j, c in enumerate(codes):
            v.extend(books[j][c])
        return [float(x) for x in v]

    rows = [(1, vec_for([0, 1, 2, 3])), (2, vec_for([7, 6, 5, 4])), (3, vec_for([3, 3, 3, 3]))]
    df = session.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = {r["vec_id"]: (r["code_0"], r["code_1"], r["code_2"], r["code_3"])
           for r in pq_encode(df).collect()}
    assert got == {1: (0, 1, 2, 3), 2: (7, 6, 5, 4), 3: (3, 3, 3, 3)}

    query = vec_for([0, 1, 2, 3])
    lut = adc_lut(query)
    top = pq_adc_topk(pq_encode(df), query, k=3).collect()
    assert top[0]["vec_id"] == 1 and abs(top[0]["adc_dist"]) < 1e-9  # exact centroid hit
    want2 = sum(lut[j][c] for j, c in enumerate([7, 6, 5, 4]))
    got2 = {r["vec_id"]: r["adc_dist"] for r in top}[2]
    assert abs(got2 - want2) < 1e-6


def test_pq_adc_is_pure_projection(session):
    """The ADC scan must stay a projection + TakeOrderedAndProject over
    the code columns — no join, no Python, no exchange beyond top-k."""
    from ocr_api_spark.operators.pq import pq_adc_topk, pq_encode

    emb = session.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = session._sc._jvm.PythonSQLUtils.explainString(
        pq_adc_topk(pq_encode(emb), [0.1] * 64, k=5)._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan, plan
    for bad in ("Join", "ArrowEvalPython", "BatchEvalPython", "Generate"):
        assert bad not in plan, plan


def test_hll_estimate_accuracy_and_merge(session):
    """HLL over known-cardinality data: estimate within the sketch's
    error band, and the union of two sketches (element-wise max) equals
    the sketch of the union — the mergeability a distributed run needs."""
    from ocr_api_spark.operators.sketches import hll_estimate, hll_merge, hll_register_rows

    vals = [(f"value-{i}",) for i in range(2000)]
    df = session.createDataFrame(vals, "v string")
    regs = [(r["bucket"], r["register"]) for r in hll_register_rows(df, "v").collect()]
    est = hll_estimate(regs)
    assert abs(est - 2000) / 2000 < 0.2  # rse(m=256) = 6.5%; 3-sigma band

    # duplicates must not move the sketch
    dup = session.createDataFrame(vals * 3, "v string")
    regs_dup = sorted((r["bucket"], r["register"]) for r in hll_register_rows(dup, "v").collect())
    assert regs_dup == sorted(regs)

    # merge(sketch(A), sketch(B)) == sketch(A ∪ B)
    a = session.createDataFrame(vals[:1200], "v string")
    b = session.createDataFrame(vals[800:], "v string")
    ra = [(r["bucket"], r["register"]) for r in hll_register_rows(a, "v").collect()]
    rb = [(r["bucket"], r["register"]) for r in hll_register_rows(b, "v").collect()]
    merged = hll_merge(ra, rb)
    assert merged == dict(regs)


def test_connected_components_chain_and_singletons(session):
    """Min-label CC: a 5-node chain collapses to its smallest id (needs
    several propagation rounds — the fixpoint check, not an iteration
    guess), disjoint clusters stay separate, pairless nodes stay
    singletons."""
    from ocr_api_spark.operators.dedup import connected_components

    pairs = session.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12)], "id_a int, id_b int"
    )
    nodes = session.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 99]], "doc_id int")
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_pq_trained_codebooks_deterministic_and_useful(session):
    """The production PQ path: per-subspace kmeans_lloyd codebooks —
    re-training reproduces them bit-for-bit, and trained-ADC distances
    separate true near neighbours from random rows."""
    from ocr_api_spark.operators.pq import adc_lut, pq_adc_topk, pq_encode, pq_train

    emb = session.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books1 = pq_train(emb, m=4, k=4, iters=2)
    books2 = pq_train(emb, m=4, k=4, iters=2)
    assert books1 == books2  # engine-deterministic training
    assert len(books1) == 4 and all(len(b) == 4 for b in books1)

    rows = emb.select("vec_id", "embedding").collect()
    query = [float(v) for v in rows[0]["embedding"]]
    codes = pq_encode(emb, books1)
    top = pq_adc_topk(codes, query, k=10, codebooks=books1).collect()
    # the query IS a database vector: its own row must score at the
    # minimum ADC distance (quantization maps query and row to the
    # same cell distances)
    best = min(r["adc_dist"] for r in top)
    self_row = [r for r in top if r["vec_id"] == rows[0]["vec_id"]]
    assert self_row and abs(self_row[0]["adc_dist"] - best) < 1e-9
    # trained ADC beats random ordering: top-10 mean << corpus mean
    lut = adc_lut(query, books1)
    all_codes = codes.select("vec_id", "code_0", "code_1", "code_2", "code_3").collect()
    dists = [sum(lut[j][r[f"code_{j}"]] for j in range(4)) for r in all_codes]
    top_mean = sum(r["adc_dist"] for r in top) / len(top)
    assert top_mean < sum(dists) / len(dists)


def test_canonical_url_fragment_query_not_leaked(session):
    """Review r4: a '?' inside the fragment (SPA routes) is fragment
    content — it must not leak into the canonical URL or split dedup
    keys for the same resource."""
    from ocr_api_spark.operators.weburl import with_canonical_url

    rows = [
        ("a", "https://ex.com/page#/route?tab=1"),
        ("b", "https://ex.com/page#/route?tab=2"),
        ("c", "https://ex.com/page?real=1#frag?fake=2"),
    ]
    df = session.createDataFrame(rows, "k string, url string")
    got = {r["k"]: r["canonical_url"] for r in with_canonical_url(df).collect()}
    assert got["a"] == "https://ex.com/page"
    assert got["b"] == "https://ex.com/page"  # same dedup key
    assert got["c"] == "https://ex.com/page?real=1"


def test_duplicated_substring_spans_semantics(session):
    """Rolling-window substring dedup on a hand-built corpus: two docs
    share a 6-token passage mid-text (window=4 → 3 shared windows each,
    merged to ONE maximal span over the passage), boundary windows that
    straddle doc-specific context stay unflagged, a doc with no shared
    span emits nothing, and an exact-dup pair flags end to end."""
    from ocr_api_spark.operators.dedup import duplicated_substring_spans

    passage = "p0 p1 p2 p3 p4 p5"
    rows = [
        (1, f"a0 a1 {passage} a2 a3"),
        (2, f"b0 b1 b2 {passage} b4"),
        (3, "c0 c1 c2 c3 c4 c5 c6 c7"),
        (10, "d0 d1 d2 d3 d4 d5"),
        (11, "d0 d1 d2 d3 d4 d5"),
    ]
    df = session.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicated_substring_spans(df, window=4).collect()
    }
    # doc 1: passage tokens at 2..7 → windows at pos 2,3,4 → span 2..7
    # doc 2: passage tokens at 3..8 → windows at pos 3,4,5 → span 3..8
    # docs 10/11: 6 tokens, windows 0,1,2 all shared → span 0..5
    assert got == {1: (2, 7, 3), 2: (3, 8, 3), 10: (0, 5, 3), 11: (0, 5, 3)}
    assert 3 not in got


def test_duplicated_substring_spans_distinct_islands(session):
    """Two disjoint shared passages in one doc produce TWO spans (the
    gaps-and-islands merge must not bridge the gap)."""
    from ocr_api_spark.operators.dedup import duplicated_substring_spans

    p1, p2 = "x0 x1 x2 x3", "y0 y1 y2 y3"
    rows = [
        (1, f"{p1} g0 g1 g2 g3 g4 {p2}"),
        (2, f"m0 {p1} m1 m2 m3 m4 m5 {p2} m6"),
    ]
    df = session.createDataFrame(rows, "doc_id long, text string")
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_substring_spans(df, window=4).collect()
    )
    assert spans == [(1, 0, 3), (1, 9, 12), (2, 1, 4), (2, 10, 13)]


def test_duplicated_substring_spans_materialize_and_stride1_identical(session, tmp_path):
    """The r6 materialization knob must not change results: cache mode,
    parquet-path mode, and stride=1 all emit exactly the default
    operator's spans (materialize only removes Catalyst's double
    computation of the window-hash projection)."""
    from ocr_api_spark.operators.dedup import duplicated_substring_spans

    passage = " ".join(f"p{i}" for i in range(12))
    rows = [
        (i, f"h{i}a h{i}b {passage} t{i}") for i in range(6)
    ] + [(90, "z0 z1 z2 z3 z4 z5 z6 z7")]
    df = session.createDataFrame(rows, "doc_id long, text string")

    def spans(**kw):
        return sorted(
            tuple(r) for r in duplicated_substring_spans(df, window=4, **kw).collect()
        )

    base = spans()
    assert base  # the shared passage must actually flag
    assert spans(stride=1) == base
    assert spans(materialize="cache") == base
    assert spans(materialize=str(tmp_path / "wins")) == base
    session.catalog.clearCache()


def test_duplicated_substring_spans_stride_semantics(session):
    """stride=2: only even-aligned windows exist, so consecutive
    flagged positions 2 apart must still merge into ONE span, and a
    duplicated passage is found when an aligned window fits inside it
    on both copies."""
    from ocr_api_spark.operators.dedup import duplicated_substring_spans

    passage = " ".join(f"p{i}" for i in range(10))
    # passage starts at pos 2 in doc 1 and pos 4 in doc 2: aligned
    # (even) windows inside the passage exist in both docs
    rows = [
        (1, f"a0 a1 {passage} a2"),
        (2, f"b0 b1 b2 b3 {passage}"),
    ]
    df = session.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicated_substring_spans(df, window=4, stride=2).collect()
    }
    # doc1: window starts in passage at even pos 2,4,6,8 (pos+3 <= 11);
    # doc2: even pos 4,6,8,10 — shared window TEXTS are the 7 aligned
    # passage windows p0..p3, p2..p5, p4..p7, p6..p9 → per doc those at
    # even positions: doc1 pos 2(p0..p3),4(p2..),6(p4..),8(p6..);
    # doc2 pos 4(p0..p3),6,8,10 — all flagged, strided islands merge
    assert got == {1: (2, 11, 4), 2: (4, 13, 4)}


def test_hll_estimate_row_branches(session):
    """The single-row estimator DataFrame: small cardinality takes the
    linear-counting branch, large takes the raw harmonic branch, and
    both agree with the driver-side hll_estimate to the 4-dp round."""
    import math

    from ocr_api_spark.operators.sketches import (
        HLL_M,
        hll_estimate,
        hll_estimate_row,
        hll_register_rows,
    )

    for n in (100, 5000):  # 100 < 2.5m=640 < 5000
        df = session.createDataFrame([(f"v{i}",) for i in range(n)], "v string")
        row = hll_estimate_row(df, "v").collect()[0]
        assert row["m"] == HLL_M and row["exact_distinct"] == n
        assert row["nonzero_buckets"] + row["zero_buckets"] == HLL_M
        regs = [(r["bucket"], r["register"]) for r in hll_register_rows(df, "v").collect()]
        assert math.isclose(row["hll_estimate"], round(hll_estimate(regs), 4), abs_tol=1e-3)
        assert abs(row["hll_estimate"] - n) / n < 0.25


def test_star_cc_matches_label_prop_on_shallow_graph(session):
    """Drop-in contract: both algorithms return identical clusters on
    the normal near-dup shape."""
    from ocr_api_spark.operators.dedup import connected_components

    pairs = session.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12)], "id_a int, id_b int"
    )
    nodes = session.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 99]], "doc_id int")
    lp = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs, nodes).collect()}
    st = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, nodes, algorithm="star").collect()
    }
    assert st == lp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_star_cc_converges_on_pathological_chain(session):
    """A 100-node path has diameter 99: min-label propagation needs ~99
    rounds (it must raise at the default 30-round budget — silent wrong
    labels would be worse), while small-star/large-star contracts it in
    O(log n) rounds within the same budget."""
    import pytest as _pytest

    from ocr_api_spark.operators.dedup import connected_components

    n = 100
    pairs = session.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a int, id_b int")
    nodes = session.createDataFrame([(i,) for i in range(n)], "doc_id int")

    with _pytest.raises(ValueError, match="did not converge"):
        connected_components(pairs, nodes, max_iters=30)

    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, nodes, max_iters=30, algorithm="star").collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_star_cc_ignores_phantom_pair_ids(session):
    """Drop-in parity on dirty input (review r5): pairs referencing ids
    absent from `nodes` contribute nothing under label_prop (the label
    join skips them), so star must not propagate connectivity THROUGH
    a phantom node either."""
    from ocr_api_spark.operators.dedup import connected_components

    pairs = session.createDataFrame([(5, 999), (999, 3)], "id_a int, id_b int")
    nodes = session.createDataFrame([(3,), (5,)], "doc_id int")
    lp = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs, nodes).collect()}
    st = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, nodes, algorithm="star").collect()
    }
    assert lp == st == {3: 3, 5: 5}


def test_duplicated_substring_spans_sample_mod_alignment_robust(session):
    """Content-defined sampling (sample_mod) must find a duplicated
    passage whose copies sit at offsets INCONGRUENT mod the sampling
    rate — the exact miss mode of positional stride (review r6): the
    selection keys on the window hash itself, so both copies keep the
    same windows at any alignment."""
    import pytest

    from ocr_api_spark.operators.dedup import duplicated_substring_spans

    passage = " ".join(f"p{i}" for i in range(40))
    rows = [
        (1, f"a0 a1 {passage}"),          # passage starts at pos 2
        (2, f"b0 b1 b2 {passage}"),       # pos 3: incongruent mod 2
        (3, "c0 c1 c2 c3 c4 c5 c6 c7"),
    ]
    df = session.createDataFrame(rows, "doc_id long, text string")

    # positional stride=2 structurally misses the misaligned pair
    strided = duplicated_substring_spans(df, window=4, stride=2).collect()
    assert strided == []

    # content-defined sampling at the same expected volume finds it.
    # A doc may emit SEVERAL spans (the sampled-gap threshold can split
    # the passage) and groupBy output has no promised order, so collect
    # the FULL span set per doc (review r6: a dict comprehension kept
    # whichever row arrived last — collect-order luck)
    spans_by_doc: dict[int, list] = {}
    for r in duplicated_substring_spans(df, window=4, sample_mod=2).collect():
        spans_by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    assert set(spans_by_doc) == {1, 2}
    s1 = sorted(spans_by_doc[1])
    s2 = sorted(spans_by_doc[2])
    # every span covers (a subset of) the passage region in each doc,
    # offset by each doc's own prefix — approximate bounds, inside text
    assert all(2 <= a <= b <= 2 + 40 - 1 for a, b in s1)
    assert all(3 <= a <= b <= 3 + 40 - 1 for a, b in s2)
    # identical passage ⇒ identical SAMPLED window set ⇒ the whole span
    # LIST maps to the same passage-relative offsets in both copies
    assert [(a - 2, b - 2) for a, b in s1] == [(a - 3, b - 3) for a, b in s2]

    # degenerate/identity cases
    base = sorted(tuple(r) for r in duplicated_substring_spans(df, window=4).collect())
    assert sorted(tuple(r) for r in duplicated_substring_spans(df, window=4, sample_mod=1).collect()) == base
    with pytest.raises(ValueError):
        duplicated_substring_spans(df, window=4, stride=2, sample_mod=2)
    # sample_mod validation mirrors stride (review r7): 0/negative used
    # to silently behave as exact — must fail loudly instead
    with pytest.raises(ValueError, match="sample_mod"):
        duplicated_substring_spans(df, window=4, sample_mod=0)
    with pytest.raises(ValueError, match="sample_mod"):
        duplicated_substring_spans(df, window=4, sample_mod=-3)


def test_duplicated_substring_spans_winnow(session):
    """True MOSS winnowing (r6-verdict task): deterministic guarantee —
    every ``winnow`` consecutive window hashes contain a selection, so
    a duplicated passage of >= window + winnow - 1 tokens is detected
    at ANY alignment (no congruence condition, no geometric tail)."""
    import pytest

    from ocr_api_spark.operators.dedup import duplicated_substring_spans

    passage = " ".join(f"p{i}" for i in range(40))
    rows = [
        (1, f"a0 a1 {passage} z0 z1 z2"),
        (2, f"b0 b1 b2 {passage}"),  # misaligned: offsets 2 vs 3
        (3, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"),
    ]
    df = session.createDataFrame(rows, "doc_id long, text string")

    spans_by_doc: dict[int, list] = {}
    n_by_doc: dict[int, int] = {}
    for r in duplicated_substring_spans(df, window=4, winnow=5).collect():
        spans_by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
        n_by_doc[r["doc_id"]] = n_by_doc.get(r["doc_id"], 0) + r["n_windows"]
    assert set(spans_by_doc) == {1, 2}
    s1, s2 = sorted(spans_by_doc[1]), sorted(spans_by_doc[2])
    # spans stay inside each copy's passage region
    assert all(2 <= a <= b <= 2 + 40 - 1 for a, b in s1)
    assert all(3 <= a <= b <= 3 + 40 - 1 for a, b in s2)
    # content-defined selection: the interior fingerprint sets agree, so
    # the span lists map to the same passage-relative offsets
    assert [(a - 2, b - 2) for a, b in s1] == [(a - 3, b - 3) for a, b in s2]
    # density ~2/(w+1): far fewer than the 37 exact windows, more than 1
    assert 2 <= n_by_doc[1] <= 20 and n_by_doc[1] == n_by_doc[2]

    # guarantee at the THRESHOLD length: passage of exactly
    # window + winnow - 1 tokens (= winnow shared hashes) must be found
    short = " ".join(f"q{i}" for i in range(4 + 5 - 1))
    dfs = session.createDataFrame(
        [(10, f"x0 {short}"), (11, f"y0 y1 y2 y3 y4 {short} y5")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in duplicated_substring_spans(dfs, window=4, winnow=5).collect()}
    assert got == {10, 11}

    # identity + validation
    base = sorted(tuple(r) for r in duplicated_substring_spans(df, window=4).collect())
    w1 = sorted(tuple(r) for r in duplicated_substring_spans(df, window=4, winnow=1).collect())
    assert w1 == base
    with pytest.raises(ValueError, match="winnow"):
        duplicated_substring_spans(df, window=4, winnow=0)
    with pytest.raises(ValueError, match="alternative sampling"):
        duplicated_substring_spans(df, window=4, winnow=3, sample_mod=2)
    with pytest.raises(ValueError, match="alternative sampling"):
        duplicated_substring_spans(df, window=4, winnow=3, stride=2)


def test_winnow_differential_vs_python_replica(session):
    """Differential check of the winnow pipeline against a pure-Python
    replica (same md5 window hashes, same composite-key argmin over the
    w-hash winnow window, same consecutive-duplicate collapse, same
    count>=min_count gate and gap<=2w islands).  Small alphabet forces
    window-hash collisions WITHIN docs (equal adjacent minima, tie
    positions) — the edges the composite key and lag collapse exist
    for."""
    import hashlib
    import random

    from ocr_api_spark.operators.dedup import duplicated_substring_spans

    rng = random.Random(99)
    window, w = 3, 4
    docs = {}
    for doc_id in range(8):
        n_tok = rng.randint(6, 40)
        docs[doc_id] = [rng.choice("ab") for _ in range(n_tok)]

    def replica():
        sel = {}  # (doc, pos) -> whash of selected windows
        for d, words in docs.items():
            hashes = []
            for p in range(len(words) - window + 1):
                txt = " ".join(words[p : p + window])
                hashes.append((p, hashlib.md5(txt.encode()).hexdigest()))
            keys = [h + str(p).rjust(10, "0") for p, h in hashes]
            chosen = []
            for t in range(len(keys)):
                kmin = min(keys[t : t + w])
                if not chosen or chosen[-1] != kmin:
                    chosen.append(kmin)
            for kmin in chosen:
                sel[(d, int(kmin[32:]))] = kmin[:32]
        from collections import Counter

        counts = Counter(sel.values())
        flagged = sorted((d, p) for (d, p), h in sel.items() if counts[h] >= 2)
        spans = []
        for d in docs:
            ps = [p for dd, p in flagged if dd == d]
            if not ps:
                continue
            start = prev = ps[0]
            n_sel = 1
            for p in ps[1:]:
                if p - prev > 2 * w:
                    spans.append((d, start, prev + window - 1, n_sel))
                    start, n_sel = p, 0
                prev = p
                n_sel += 1
            spans.append((d, start, prev + window - 1, n_sel))
        return sorted(spans)

    df = session.createDataFrame(
        [(d, " ".join(ws)) for d, ws in docs.items()], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicated_substring_spans(df, window=window, winnow=w).collect()
    )
    assert got == replica(), (got, replica())


def test_ivfpq_degenerates_to_plain_pq_and_improves_on_it(session):
    """IVFADC composition sanity: with ONE zero coarse centroid the
    residual IS the vector, so ivfpq_topk must equal pq_adc_topk
    row-for-row; with real clusters, residual quantization must score
    the true neighbourhood at least as well as raw-vector PQ."""
    import random

    from ocr_api_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
        pq_adc_topk,
        pq_encode,
    )
    from ocr_api_spark.operators.similarity import cosine_topk

    rng = random.Random(21)
    rows = []
    for i in range(300):
        center = 2.0 if i % 2 == 0 else -2.0
        rows.append(
            (i, [center + rng.uniform(-0.4, 0.4) for _ in range(8)] + [0.0] * 56)
        )
    df = session.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [2.0] * 8 + [0.0] * 56

    zero = [[0.0] * 64]
    plain = pq_adc_topk(pq_encode(df), q, 10).collect()
    via_ivfpq = ivfpq_topk(ivfpq_encode(df, zero), zero, q, 10, n_probe=1).drop(
        "ivf_list"
    ).collect()
    assert [tuple(r) for r in via_ivfpq] == [tuple(r) for r in plain]

    # two ±2 coarse centroids: probing 1 list restricts to the query's
    # cluster, and every returned id must be from the positive cluster
    cents = [[2.0] * 8 + [0.0] * 56, [-2.0] * 8 + [0.0] * 56]
    got = ivfpq_topk(ivfpq_encode(df, cents), cents, q, 10, n_probe=1).collect()
    assert len(got) == 10
    assert all(r["vec_id"] % 2 == 0 for r in got)
    # exact top-10 is also entirely the positive cluster — same lists
    exact = cosine_topk(df, q, 10).collect()
    assert all(r["vec_id"] % 2 == 0 for r in exact)
    # and the docstring's quality claim, asserted: residuals (uniform
    # ±0.4 around the coarse centroid) sit inside the default
    # codebooks' ±0.5 dynamic range where the raw vectors (±2) clip,
    # so IVFADC must overlap the exact top-10 at least as well as
    # raw-vector PQ under the SAME code budget
    exact_ids = {r["vec_id"] for r in exact}
    plain_ids = {r["vec_id"] for r in plain}
    ivfpq_ids = {r["vec_id"] for r in got}
    assert len(ivfpq_ids & exact_ids) >= len(plain_ids & exact_ids)
