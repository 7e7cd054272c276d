"""MinHash+LSH stress: 150k docs with the bucket cap FIRING.

The r6 verdict's ask: extend the LSH stress series to 150k docs and
demonstrate ``max_bucket_size`` actually governing a pathological
bucket, not just existing.  The corpus plants a boilerplate cluster
that grows WITH corpus size (every 50th doc is byte-identical), so the
uncapped band join pays c(c-1)/2 pairs per band — quadratic in corpus
size — while the capped run drops the oversized buckets (logged by the
operator) and stays linear.  That contrast IS the 100-TB scale
argument: the cap converts an adversarial cluster from a quadratic
cost into a logged drop + the documented run-exact-dedup-first
contract.

Usage::

    python BENCH/stress_lsh.py [cpus] [cap]

One JSON line per (replicas, mode): wall seconds (steal-gated best of
2 via bench.timed_best), candidate-pair count, dropped-bucket rows.
Results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    from pyspark.sql import functions as F

    from bench import timed_best
    from ocr_api_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures_arr
    from ocr_api_spark.plans.session import build_session

    spark = build_session(
        app_name="lsh-stress", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    boiler = " ".join(f"boiler{i}" for i in range(120))  # the planted cluster text

    for replicas in (10, 20, 30):
        rep = spark.range(replicas).select(F.col("id").alias("r"))
        # unique-ify every replica's tokens (the "natural" shape of
        # stress_substring), EXCEPT every 50th doc, which becomes the
        # shared boilerplate — a byte-identical cluster of n_docs/50
        # members that shares every band signature
        uniq_text = F.regexp_replace(
            F.col("text"), " ", F.concat(F.lit(" x"), F.col("r").cast("string"), F.lit("_"))
        )
        corpus = (
            docs.crossJoin(rep)
            .select(
                (F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id"),
                F.when(F.col("doc_id") % 50 == 0, F.lit(boiler))
                .otherwise(uniq_text)
                .alias("text"),
            )
            .repartition(cpus * 2)
            .persist()
        )
        n_docs = corpus.count()
        hot = n_docs // 50
        print(f"# corpus: {n_docs} docs, planted cluster {hot}", file=sys.stderr)

        # signatures staged once per corpus (both modes measure the
        # BAND JOIN, which is what the cap governs; bench.py measures
        # the end-to-end projection+join shape separately)
        sigs = minhash_signatures_arr(corpus, "text", 3, k=4).persist()
        sigs.count()

        for mode_cap in (cap, None):
            state = {}
            captured: list[str] = []

            def once():
                handler = _ListHandler(captured)
                log = logging.getLogger("ocr_api_spark.operators.dedup")
                log.addHandler(handler)
                try:
                    pairs = lsh_candidate_pairs(
                        sigs, bands=[(0, 1), (2, 3)], max_bucket_size=mode_cap
                    )
                    state["n_pairs"] = pairs.count()
                finally:
                    log.removeHandler(handler)

            best, samples, _clean = timed_best(once, trials=2, max_attempts=4)
            print(
                json.dumps(
                    {
                        "replicas": replicas,
                        "n_docs": n_docs,
                        "planted_cluster": hot,
                        "cap": mode_cap,
                        "wall_s": best,
                        "trials": samples,
                        "n_pairs": state["n_pairs"],
                        "drops_fired": bool(captured),
                        "drop_sample": captured[0] if captured else None,
                    }
                )
            )
        corpus.unpersist()
        sigs.unpersist()
    spark.stop()


class _ListHandler(logging.Handler):
    def __init__(self, sink: list[str]):
        super().__init__()
        self.sink = sink

    def emit(self, record: logging.LogRecord) -> None:
        self.sink.append(record.getMessage())


if __name__ == "__main__":
    main()
