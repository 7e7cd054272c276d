"""IVF (inverted-file) approximate nearest-neighbour search — the
coarse-quantizer scale path for embedding similarity (complements the
sign-LSH variant in ``similarity.py``).

Build: k-means coarse centroids (MLlib, fixed seed → deterministic),
assign every vector to its nearest centroid (the "inverted list"; at
production scale this is the partition/bucket column so probing prunes
at the scan).  Search: rank centroids by distance to the query, take the
``n_probe`` nearest lists, exact cosine re-rank inside them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_api_spark.operators.similarity import cosine_topk


def ivf_assign(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared L2), given a
    FIXED centroid list — the SQL-expressible half of IVF (the driver
    oracle reproduces it in DuckDB), and the production shape: trained
    centroids are a small broadcast constant, assignment is a pure
    JVM-side projection, and ``ivf_list`` becomes the partition/bucket
    column so probing prunes at the scan.

    Deterministic argmin: ties break to the smallest list index via
    struct-ordered array_min over (dist, j)."""
    vec = F.col(vec_col).cast("array<double>")
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(vec, F.array(*[F.lit(float(x)) for x in c]), lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.lit(j).alias("j"),
            )
            for j, c in enumerate(centroids)
        ]
    )
    return df.withColumn("ivf_list", F.array_min(dists)["j"])


def kmeans_lloyd(
    df: DataFrame,
    k: int = 4,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[list[float]]]:
    """Distributed Lloyd's k-means, ENGINE-DETERMINISTIC by
    construction — the iterative-algorithm entry in the driver's exact
    correctness gate (most iterative ML is check-by-tolerance; this one
    is check-by-hash):

    - init: the k lowest-``id_col`` vectors (no RNG);
    - assignment: ``ivf_assign``'s sequential-fold squared L2 with
      (dist, index) tie-break — bit-reproducible on any engine that
      evaluates doubles left-to-right;
    - update: per-dim means via exact DECIMAL(28,12) sums (addition is
      exact, hence partition-order-independent), double division, then
      round-to-6dp ``+ 0.0`` (the signed-zero normalizer) — so the new
      centroid literals are identical across engines and partitionings;
    - empty clusters keep their previous centroid.

    Returns (assigned df, final centroids).  Driver-side replica:
    ``__spark_entry__._kmeans_replica`` computes the same fixpoint with
    Python ``decimal`` (repr-based double→decimal cast matches Spark's
    HALF_UP at 12 fractional digits)."""
    first = df.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(first) < k:
        raise ValueError(f"need at least k={k} vectors")
    dims = len(first[0][0])
    centroids = [[round(float(v), 6) + 0.0 for v in r[0]] for r in first]
    sum_aggs = [
        F.sum(F.element_at(vec_col, d + 1).cast("double").cast("decimal(28,12)")).alias(f"s{d}")
        for d in range(dims)
    ]
    for _ in range(iters):
        assigned = ivf_assign(df, centroids, vec_col)
        rows = assigned.groupBy("ivf_list").agg(
            F.count(F.lit(1)).alias("n"), *sum_aggs
        ).collect()
        new = [list(c) for c in centroids]
        for r in rows:
            n = int(r["n"])
            new[int(r["ivf_list"])] = [
                round(float(r[f"s{d}"]) / n, 6) + 0.0 for d in range(dims)
            ]
        centroids = new
    return ivf_assign(df, centroids, vec_col), centroids


def build_ivf(df: DataFrame, k: int = 16, vec_col: str = "embedding", seed: int = 42):
    """Returns (assigned_df, centroids) where assigned_df carries an
    ``ivf_list`` column and centroids is a list of k dense vectors."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    with_vec = df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=k, seed=seed, featuresCol="__features", predictionCol="ivf_list").fit(with_vec)
    assigned = model.transform(with_vec).drop("__features")
    centroids = [list(c) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact re-rank restricted to the ``n_probe`` nearest inverted lists.

    Probe choice goes through the one shared :func:`pq.nearest_lists`
    (squared L2 orders identically to the former sqrt form; ties to the
    smaller list id, which the stable sort here already implied)."""
    from ocr_api_spark.operators.pq import nearest_lists

    probe = nearest_lists(centroids, query_vec, n_probe)
    candidates = assigned.where(F.col("ivf_list").isin(probe))
    return cosine_topk(candidates, query_vec, k, id_col)
