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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# timing discipline is bench.py's timed_best — ONE shared steal-gated
# best-of implementation (review r6: a locally re-implemented gate with
# its own threshold meant numbers recorded side by side in
# BENCH/BASELINE.md were gated by two different disciplines)


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
    elif shape == "misaligned":
        # replica r prefixed with r filler tokens: every duplicated
        # passage appears at offsets 0..replicas-1 — the shape where
        # positional stride's congruence requirement bites and
        # content-defined sampling (sample_mod) does not.
        # nb: F.sequence(1, r) at r=0 yields a DESCENDING [1,0] (it
        # auto-steps -1), which silently shifted BOTH replicas by one
        # token in the first cut of this shape — slice a literal token
        # array by r instead
        if replicas > 16:
            # F.slice caps at the filler array length, which would make
            # replicas 16+ position-CONGRUENT copies and silently
            # inflate measured stride recall (review r6)
            raise SystemExit("misaligned shape supports at most 16 replicas")
        fillers = F.split(F.lit("z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12 z13 z14 z15"), " ")
        text = F.when(F.col("r") == 0, F.col("text")).otherwise(
            F.concat(
                F.concat_ws(" ", F.slice(fillers, F.lit(1), F.col("r"))),
                F.lit(" "),
                F.col("text"),
            )
        )
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

    from bench import timed_best

    def run(stride: int, materialize: str | None, sample_mod: int | None = None,
            winnow: int | None = None):
        state = {}

        def once():
            spans = duplicated_substring_spans(
                corpus, window=20, stride=stride, materialize=materialize,
                sample_mod=sample_mod, winnow=winnow,
            )
            agg = spans.agg(
                F.count("*").alias("n_spans"),
                F.sum(F.col("span_end") - F.col("span_start") + 1).alias("coverage"),
            ).collect()[0]
            state["n_spans"], state["coverage"] = agg["n_spans"], int(agg["coverage"] or 0)

        def cleanup():
            # inter-trial bookkeeping OUTSIDE the timed window (review
            # r6: charging a trial with the previous trial's cache
            # clear / rmtree understated the knob's benefit)
            if materialize == "cache":
                spark.catalog.clearCache()
                corpus.persist().count()  # keep the corpus pinned for the next config
            elif materialize:
                shutil.rmtree(materialize, ignore_errors=True)

        best, samples, _clean = timed_best(once, trials=2, max_attempts=4, between=cleanup)
        if stride == 1 and materialize is None and sample_mod is None and winnow is None:
            # exact-mode coverage only — a sampled mode must never
            # become its own recall denominator (review r7)
            coverage_ref["cov"] = state["coverage"]
        rec = {
            "stride": stride,
            "sample_mod": sample_mod,
            "winnow": winnow,
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
    # content-defined sampling at matching expected volumes: on a
    # misaligned corpus stride recall collapses toward 1/stride while
    # sample_mod keys on the hash itself and holds
    for m in (2, 4):
        run(1, None, sample_mod=m)
    # true-MOSS winnowing at comparable volumes: density ~2/(w+1), so
    # w=3 ~ sample_mod 2 and w=9 ~ sample_mod 5 — alignment-robust like
    # sample_mod but with a DETERMINISTIC per-passage guarantee
    for w in (3, 9):
        run(1, None, winnow=w)
    spark.stop()


if __name__ == "__main__":
    main()
