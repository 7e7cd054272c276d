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
    """Exact re-rank restricted to the ``n_probe`` nearest inverted lists."""
    import math

    def dist(c):
        return math.sqrt(sum((a - b) ** 2 for a, b in zip(c, query_vec)))

    probe = sorted(range(len(centroids)), key=lambda i: dist(centroids[i]))[:n_probe]
    candidates = assigned.where(F.col("ivf_list").isin(probe))
    return cosine_topk(candidates, query_vec, k, id_col)
