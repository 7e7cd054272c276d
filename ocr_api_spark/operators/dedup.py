"""Deduplication operators (training-data-pipeline tier).

- exact:   md5-fingerprint groupBy (one shuffle on the hash, map-side
           partial aggregation free via AQE)
- minhash: word-shingle → k independent min-hashes built from
           md5(seed || shingle) (string min is engine-portable) → LSH
           bands → candidate pairs from band-bucket joins.  At 100 TB
           the band join is the only shuffle and its key space (band
           signatures) is high-cardinality, so it partitions evenly.
- n-gram jaccard: exact pairwise similarity over exploded distinct
           shingles — quadratic in cluster size, so only ever applied
           to a bounded candidate set (the LSH output or an explicit
           subset), never the full corpus.
- simhash: 64-bit bit-majority signature via xxhash64, JVM-side
           (aggregate over bit positions); Hamming-band grouping for
           near-dup candidates.  xxhash64 has no DuckDB analog → its
           correctness check is rows-only (the driver records the
           weaker check; noted in oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(df: DataFrame, text_col: str, n: int, id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per document: (id_col, shingle)."""
    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    return (
        df.select(id_col, F.explode(F.array_distinct(shingles)).alias("shingle"))
        .where(F.length("shingle") > 0)
        .distinct()
    )


def exact_duplicate_stats(df: DataFrame, text_col: str = "text", group_col: str = "source") -> DataFrame:
    """rows vs distinct fingerprints per group — the exact-dedup report."""
    return (
        df.withColumn("fingerprint", F.md5(F.col(text_col)))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("bigint").alias("rows"),
            F.countDistinct("fingerprint").cast("bigint").alias("distinct_texts"),
        )
    )


def minhash_signatures(shingled: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """k min-hashes per doc.  Hash h_i(s) = md5(i || ':' || s); taking the
    MIN of the hex string is a valid min-hash (uniform order) and is
    bit-identical across Spark and DuckDB."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}") for i in range(k)
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, bands: list[tuple[int, ...]], id_col: str = "doc_id") -> DataFrame:
    """Docs sharing any band signature.  ``bands`` lists the mh indices in
    each band, e.g. [(0,1),(2,3)]."""
    pair_frames = []
    for b, cols in enumerate(bands):
        sig = F.concat_ws("|", *[F.col(f"mh{i}") for i in cols])
        bucketed = signatures.select(F.col(id_col), sig.alias("band_sig")).withColumn(
            "band", F.lit(b)
        )
        left = bucketed.alias("l")
        right = bucketed.alias("r")
        pairs = (
            left.join(right, ["band", "band_sig"])
            .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
            )
        )
        pair_frames.append(pairs)
    out = pair_frames[0]
    for p in pair_frames[1:]:
        out = out.unionByName(p)
    return out.distinct()


def ngram_jaccard_pairs(df: DataFrame, text_col: str, n: int, id_col: str = "doc_id") -> DataFrame:
    """Exact jaccard over distinct word n-grams for every id pair that
    shares at least one shingle.  Apply to bounded subsets only."""
    sh = word_shingles(df, text_col, n, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").cast("bigint").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    overlap = (
        a.join(b, "shingle")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").cast("bigint").alias("overlap"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        overlap.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("overlap") / (F.col("n_a") + F.col("n_b") - F.col("overlap")), 4).cast("double"),
        )
        .select("id_a", "id_b", "overlap", "jaccard")
    )


def simhash64(df: DataFrame, text_col: str, n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash: per shingle xxhash64, per bit position a majority
    vote.  All JVM-side: explode → per-bit contribution ±1 → sum → sign."""
    sh = word_shingles(df, text_col, n, id_col).withColumn("h", F.xxhash64("shingle"))
    bit = F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit")
    contrib = sh.select(id_col, "h", bit).withColumn(
        "vote", F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1)
    )
    bits = (
        contrib.groupBy(id_col, "bit")
        .agg(F.sum("vote").alias("s"))
        .withColumn("bitval", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)))
    )
    return bits.groupBy(id_col).agg(
        F.sum(F.col("bitval") * F.pow(F.lit(2.0), F.col("bit"))).cast("double").alias("simhash_f")
    ).withColumn("simhash", F.col("simhash_f").cast("decimal(20,0)").cast("string")).drop("simhash_f")
