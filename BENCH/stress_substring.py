"""Substring-dedup stress: materialization knob + stride cost/recall.

The r5 verdict's ask: ``duplicated_substring_spans`` computes the
(doc, pos, whash) projection twice (Catalyst recomputes the lazy window
frame on the count side and the probe side of the join back) — measure
the ``materialize=`` knob at the 50k-doc stress scale (replicated sf0.1
corpus, every doc a duplicate: worst-case span volume) and the
``stride`` cost/recall curve.

Usage::

    python BENCH/stress_substring.py [replicas] [cpus]

Prints one JSON line per configuration: wall seconds (best of 2
steal-gated trials), span count, and flagged-token coverage (recall
denominator = stride-1 coverage).  Results recorded in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _steal_window():
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def timed(fn, trials: int = 2) -> tuple[float, list]:
    best, samples = float("inf"), []
    for _ in range(trials):
        s0 = _steal_window()
        t0 = time.time()
        fn()
        dt = time.time() - t0
        s1 = _steal_window()
        steal = round(100.0 * (s1[1] - s0[1]) / max(s1[0] - s0[0], 1), 2)
        samples.append((round(dt, 2), steal))
        if steal <= 0.5:
            best = min(best, dt)
    if best == float("inf"):  # every window dirty: fastest is least-wrong
        best = min(s[0] for s in samples)
    return round(best, 2), samples


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from ocr_api_spark.operators.dedup import duplicated_substring_spans
    from ocr_api_spark.plans.session import build_session

    spark = build_session(
        app_name="substring-stress", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    spark.sparkContext.setLogLevel("ERROR")

    shape = sys.argv[3] if len(sys.argv) > 3 else "all-dup"
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = docs.count()
    rep = spark.range(replicas).select(F.col("id").alias("r"))
    if shape == "all-dup":
        # every replica identical: worst-case span volume (the r5 shape)
        text = F.col("text")
    else:
        # "natural": prefix every token with the replica id, so windows
        # never match ACROSS replicas — duplicate structure is the
        # corpus's natural ~8% of docs, at 10x the corpus size.  This is
        # the realistic shape: flagged volume small, the window-hash
        # projection dominates, which is what materialize= dedupes.
        text = F.regexp_replace(
            F.col("text"), " ", F.concat(F.lit(" x"), F.col("r").cast("string"), F.lit("_"))
        )
    corpus = (
        docs.crossJoin(rep)
        .select((F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id"), text.alias("text"))
        .repartition(cpus * 2)
        .persist()
    )
    n_docs = corpus.count()
    print(f"# corpus: {n_base} base docs x {replicas} = {n_docs} ({shape})", file=sys.stderr)

    mat_path = "/dev/shm/substring_wins"
    coverage_ref: dict[str, int] = {}

    def run(stride: int, materialize: str | None):
        state = {}

        def once():
            spans = duplicated_substring_spans(
                corpus, window=20, stride=stride, materialize=materialize
            )
            agg = spans.agg(
                F.count("*").alias("n_spans"),
                F.sum(F.col("span_end") - F.col("span_start") + 1).alias("coverage"),
            ).collect()[0]
            state["n_spans"], state["coverage"] = agg["n_spans"], int(agg["coverage"] or 0)
            if materialize == "cache":
                spark.catalog.clearCache()
                corpus.persist().count()  # keep the corpus pinned for the next config
            elif materialize:
                shutil.rmtree(materialize, ignore_errors=True)

        best, samples = timed(once)
        if stride == 1 and materialize is None:
            coverage_ref["cov"] = state["coverage"]
        rec = {
            "stride": stride,
            "materialize": materialize or "none",
            "wall_s": best,
            "trials": samples,
            "n_spans": state["n_spans"],
            "coverage_tokens": state["coverage"],
            "recall_vs_stride1": round(state["coverage"] / max(coverage_ref.get("cov", state["coverage"]), 1), 4),
        }
        print(json.dumps(rec))
        return rec

    base = run(1, None)
    cached = run(1, "cache")
    pathed = run(1, mat_path)
    print(
        json.dumps(
            {
                "speedup_cache": round(base["wall_s"] / cached["wall_s"], 2),
                "speedup_path": round(base["wall_s"] / pathed["wall_s"], 2),
            }
        )
    )
    for s in (2, 4):
        run(s, None)
    spark.stop()


if __name__ == "__main__":
    main()
