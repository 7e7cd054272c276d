"""ANN recall-vs-cost: measured, not guessed (r7).

The similarity tier ships three top-k paths — brute-force cosine
(exact), sign-LSH bucket re-rank, IVF probe-restricted re-rank.  The
oracle rows prove each is *correct per its own contract*; this harness
measures what the contracts trade: recall@k against the exact top-k,
and the candidate fraction each approximate path scans, on a corpus 10x
the sf0.1 embeddings table (key-offset replicas with a +r*1e-3 dim-0
tiebreak, the gen_scaled_sf.py convention).

Usage::

    python BENCH/stress_ann.py [cpus] [n_queries]

One JSON line per configuration, recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    k = 10

    from pyspark.sql import functions as F

    from ocr_api_spark.operators.ivf import build_ivf, ivf_topk
    from ocr_api_spark.operators.similarity import ann_topk_lsh, cosine_topk
    from ocr_api_spark.plans.session import build_session

    spark = build_session(
        app_name="ann-stress", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n_base = base.count()
    rep = spark.range(10).select(F.col("id").alias("r"))
    corpus = (
        base.crossJoin(rep)
        .select(
            (F.col("vec_id") + F.col("r") * 1_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda v, i: F.when(i == 0, v + F.col("r") * 1e-3).otherwise(v),
            ).alias("embedding"),
        )
        .repartition(cpus)
        .persist()
    )
    n = corpus.count()
    print(f"# corpus: {n_base} x 10 = {n} vectors", file=sys.stderr)

    # queries = midpoints of adjacent base vectors: a corpus member's
    # own 10 replicas would make every truth set a single IVF list
    # (recall trivially 1.0 at n_probe=1); midpoints straddle two
    # neighborhoods, so probes and buckets actually get tested
    base_vecs = [
        [float(x) for x in row["embedding"]]
        for row in base.orderBy("vec_id").limit(2 * n_queries).collect()
    ]
    queries = [
        [(a + b) / 2 for a, b in zip(base_vecs[2 * i], base_vecs[2 * i + 1])]
        for i in range(n_queries)
    ]

    def topk_ids(df) -> set:
        return {row["vec_id"] for row in df.collect()}

    # exact ground truth per query (full-scan cosine top-k)
    t0 = time.time()
    truth = [topk_ids(cosine_topk(corpus, q, k)) for q in queries]
    exact_wall = time.time() - t0
    print(json.dumps({
        "method": "brute_force", "param": None, "recall_at_10": 1.0,
        "candidate_frac": 1.0, "wall_s_per_query": round(exact_wall / n_queries, 3),
    }))

    # IVF: one build, probe sweep
    assigned, centroids = build_ivf(corpus, k=32)
    assigned = assigned.persist()
    list_sizes = {r["ivf_list"]: r["count"] for r in assigned.groupBy("ivf_list").count().collect()}
    for n_probe in (1, 2, 4, 8):
        t0 = time.time()
        hits = 0
        cand = 0
        for q, gt in zip(queries, truth):
            got = topk_ids(ivf_topk(assigned, centroids, q, k, n_probe=n_probe))
            hits += len(got & gt)
            # candidate volume = rows in the probed lists
            from ocr_api_spark.operators.pq import nearest_lists

            probe = nearest_lists(centroids, q, n_probe)
            cand += sum(list_sizes.get(p, 0) for p in probe)
        wall = time.time() - t0
        print(json.dumps({
            "method": "ivf", "param": n_probe,
            "recall_at_10": round(hits / (k * n_queries), 4),
            "candidate_frac": round(cand / (n * n_queries), 4),
            "wall_s_per_query": round(wall / n_queries, 3),
        }))

    # IVF-PQ: same coarse quantizer, but candidates are scored from the
    # compressed residual codes (raw vectors never load) — the recall
    # delta vs IVF at equal n_probe IS the quantization cost
    from ocr_api_spark.operators.pq import ivfpq_encode, ivfpq_topk, ivfpq_train

    # two code budgets: the oracle-sized default (m=4, k=8 → 12-bit
    # codes) and a realistic one (m=8, k=16 → 32-bit codes).  The
    # recall delta vs raw-vector IVF at equal n_probe is quantization
    # error, which shrinks with the budget — the knob a production
    # deployment turns (FAISS-scale setups run m>=8, k=256).
    # Codebooks are trained on RESIDUALS (ivfpq_train — the IVFADC
    # convention; training on raw vectors and encoding residuals would
    # measure a train/apply distribution mismatch, not quantization
    # error), over an orderBy-pinned sample so the recorded rows are
    # reproducible across runs and task schedules.
    train_set = corpus.orderBy("vec_id").limit(2000)
    for m, kk in ((4, 8), (8, 16)):
        books = ivfpq_train(train_set, centroids, m=m, k=kk, dims=64)
        enc = ivfpq_encode(corpus, centroids, codebooks=books).persist()
        enc.count()
        for n_probe in (2, 8):
            t0 = time.time()
            hits = 0
            for q, gt in zip(queries, truth):
                got = topk_ids(
                    ivfpq_topk(enc, centroids, q, k, n_probe=n_probe, codebooks=books)
                )
                hits += len(got & gt)
            wall = time.time() - t0
            print(json.dumps({
                "method": "ivfpq", "param": f"m={m},k={kk},probe={n_probe}",
                "recall_at_10": round(hits / (k * n_queries), 4),
                "candidate_frac": None,
                "wall_s_per_query": round(wall / n_queries, 3),
            }))
        enc.unpersist()

    # sign-LSH: (bucket width, multiprobe radius) sweep — candidate
    # fraction ~ sum(C(bits, i) for i <= r) / 2^bits
    import math

    for bits, radius in ((4, 0), (6, 0), (8, 0), (8, 1), (8, 2), (6, 1)):
        t0 = time.time()
        hits = 0
        for q, gt in zip(queries, truth):
            got = topk_ids(ann_topk_lsh(corpus, q, k, bits=bits, probe_radius=radius))
            hits += len(got & gt)
        wall = time.time() - t0
        frac = sum(math.comb(bits, i) for i in range(radius + 1)) / 2 ** bits
        print(json.dumps({
            "method": "sign_lsh", "param": f"bits={bits},r={radius}",
            "recall_at_10": round(hits / (k * n_queries), 4),
            "candidate_frac": round(frac, 4),
            "wall_s_per_query": round(wall / n_queries, 3),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
