"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-side ``zip_with`` + ``aggregate``
  (no Python), one pass, broadcast of the query vector in the plan —
  the exact baseline.
- sign-LSH bucketing: an 8-bit bucket from the signs of the first 8
  dimensions (deterministic hyperplanes = axis planes) — the scale
  path: candidate set shrinks ~2^8 before the exact re-rank, and the
  bucket id is a plain projection both engines compute identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def with_cosine_to(df: DataFrame, query_vec: list[float], vec_col: str = "embedding") -> DataFrame:
    """cosine(embedding, query) rounded to 3 dp (cross-engine float
    stability; see oracle notes)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    return df.withColumn("cosine", F.round(cos, 3).cast("double"))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int, id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force top-k by cosine, deterministic tie-break on id."""
    return (
        with_cosine_to(df, query_vec)
        .select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def with_sign_bucket(df: DataFrame, vec_col: str = "embedding", bits: int = 8) -> DataFrame:
    """bucket = sum(2^i * [v_i > 0]) over the first ``bits`` dims."""
    bucket = None
    for i in range(bits):
        term = F.when(F.element_at(F.col(vec_col), i + 1) > 0, F.lit(2**i)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return df.withColumn("bucket", bucket.cast("bigint"))


def near_dup_pairs(
    df: DataFrame,
    threshold: float,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH bucket candidates
    (identical first-``bits`` sign pattern) + exact cosine ≥ threshold.
    The only shuffle is the bucket-keyed self-join — candidates shrink
    ~2^bits before any pairwise math, the scale shape for near-dup
    detection over 10^12 embeddings (recall bounded by the LSH buckets,
    like every banded scheme).  Cosine rounded to 3 dp on both engines
    before the threshold so the cut is cross-engine stable."""
    # per-row norm computed ONCE before the self-join: the pairwise
    # stage is quadratic in bucket size, so only the dot product should
    # pay O(d) there
    b = with_sign_bucket(df, vec_col, bits).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
        "bucket",
    )
    b = b.withColumn("__nrm", _norm(F.col("__v")))
    left = b.alias("l")
    right = b.alias("r")
    lv, rv = F.col("l.__v"), F.col("r.__v")
    cos = F.round(_dot(lv, rv) / (F.col("l.__nrm") * F.col("r.__nrm")), 3).cast("double")
    return (
        left.join(right, "bucket")
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def ann_topk_lsh(
    df: DataFrame, query_vec: list[float], k: int, id_col: str = "vec_id", bits: int = 8
) -> DataFrame:
    """Approximate top-k: exact re-rank inside the query's sign bucket.
    Recall < 1 by construction; the scale path for 10^12 rows (bucket
    pruning pushes down to the scan when bucket is a partition column)."""
    qbucket = sum(2**i for i in range(bits) if query_vec[i] > 0)
    bucketed = with_sign_bucket(df, bits=bits).where(F.col("bucket") == F.lit(qbucket))
    return cosine_topk(bucketed, query_vec, k, id_col)
