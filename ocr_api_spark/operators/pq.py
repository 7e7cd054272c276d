"""Product quantization (PQ) — the memory-side ANN scale path
(Jégou et al. 2011), complementing sign-LSH (hash buckets) and IVF
(coarse partitions) in ``similarity.py``/``ivf.py``.

Encode: split each embedding into ``m`` subvectors; store only the
index of the nearest codebook centroid per subspace — 64-dim float
vectors compress to ``m`` small ints, so a 10^12-row corpus's index
fits in memory where raw vectors cannot.  Search (ADC): precompute the
query→centroid distance lookup table per subspace (m×k Python floats,
broadcast as literals), then a vector's approximate distance is m
array lookups + adds — a pure JVM projection over the compact codes,
no Python, no shuffle, TakeOrderedAndProject for top-k.

Codebooks here are FIXED deterministic constants (the ``_IVF_CENTROIDS``
precedent): production trains them with ``ivf.kmeans_lloyd`` per
subspace (already engine-deterministic and exact-gated); the fixed
codebooks keep the PQ math itself SQL-expressible for the DuckDB
oracle.  Argmin ties break to the smallest code via struct-ordered
``array_min`` — the same convention the oracle's ``list_position`` of
the first minimum reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PQ_M = 4  # subspaces
PQ_K = 8  # centroids per codebook


def default_codebooks(dims: int = 64, m: int = PQ_M, k: int = PQ_K) -> list:
    """codebooks[j][c] = centroid vector for code c of subspace j:
    ±(0.5 + 0.1·j) per bit of c on the subspace's first 3 dims, 0
    elsewhere — exact decimal literals both engines parse identically."""
    dsub = dims // m
    amp = [round(0.5 + 0.1 * j, 1) for j in range(m)]
    return [
        [
            [((amp[j] if (c >> d) & 1 else -amp[j]) if d < 3 else 0.0) for d in range(dsub)]
            for c in range(k)
        ]
        for j in range(m)
    ]


def pq_train(
    df: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int | None = None,
) -> list:
    """Train per-subspace codebooks with the engine-deterministic
    ``kmeans_lloyd`` (decimal-exact centroid means, no RNG, ties to the
    smallest id — see ivf.py): slice the corpus into ``m`` subvector
    tables and run one bounded k-means each.  The result plugs straight
    into ``pq_encode``/``pq_adc_topk``; determinism means a re-train on
    the same snapshot reproduces the same codebooks bit-for-bit, so
    incremental re-encodes never mix codebook generations silently."""
    from ocr_api_spark.operators.ivf import kmeans_lloyd

    if dims is None:  # one limit-1 job; pass dims to skip it
        head = df.select(vec_col).first()
        if head is None:
            raise ValueError("pq_train: empty input DataFrame")
        dims = len(head[0])
    dsub = dims // m
    books = []
    for j in range(m):
        sub = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col).cast("array<double>"), j * dsub + 1, dsub).alias(vec_col),
        )
        _assigned, centroids = kmeans_lloyd(sub, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
        books.append(centroids)
    return books


def pq_encode(
    df: DataFrame, codebooks: list | None = None, vec_col: str = "embedding"
) -> DataFrame:
    """One ``code_j`` int column per subspace (flat columns, not an
    array — compact, prunable, and partition-key-able)."""
    codebooks = codebooks if codebooks is not None else default_codebooks()
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    vec = F.col(vec_col).cast("array<double>")
    out = df
    for j, book in enumerate(codebooks):
        sub = F.slice(vec, j * dsub + 1, dsub)
        dists = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            sub,
                            F.array(*[F.lit(float(x)) for x in cent]),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("dist"),
                    F.lit(c).alias("c"),
                )
                for c, cent in enumerate(book)
            ]
        )
        out = out.withColumn(f"code_{j}", F.array_min(dists)["c"].cast("int"))
    return out


def adc_lut(query: list[float], codebooks: list | None = None) -> list[list[float]]:
    """Asymmetric-distance lookup table: lut[j][c] = squared L2 between
    the query's j-th subvector and codebook centroid c.  Computed
    driver-side (m×k Python floats) and shipped as literals."""
    codebooks = codebooks if codebooks is not None else default_codebooks()
    dsub = len(codebooks[0][0])
    lut = []
    for j, book in enumerate(codebooks):
        qsub = query[j * dsub : (j + 1) * dsub]
        lut.append([sum((a - b) ** 2 for a, b in zip(qsub, cent)) for cent in book])
    return lut


def adc_distance(lut: list[list[float]]):
    """Column expression summing the per-subspace ADC lookups
    ``lut[j][code_j]`` — the one scoring kernel both ``pq_adc_topk``
    and ``ivfpq_topk`` build their distance from (shared so a
    tie-break or rounding change lands in every caller at once)."""
    approx = None
    for j, row in enumerate(lut):
        term = F.element_at(
            F.array(*[F.lit(float(v)) for v in row]), F.col(f"code_{j}") + 1
        )
        approx = term if approx is None else approx + term
    return approx


def nearest_lists(
    coarse_centroids: list[list[float]], query: list[float], n_probe: int
) -> list[int]:
    """The probe set: indices of the ``n_probe`` coarse centroids
    nearest the query by squared L2, ties to the smaller list id.
    Driver-side (the centroid table is k small vectors); shared by
    ``ivfpq_topk`` and the entry-point DuckDB oracle builders so the
    Spark/oracle pair can never diverge on probe choice."""
    def d2(c):
        return sum((a - b) ** 2 for a, b in zip(c, query))

    return sorted(range(len(coarse_centroids)), key=lambda j: (d2(coarse_centroids[j]), j))[
        :n_probe
    ]


def pq_adc_topk(
    codes_df: DataFrame,
    query: list[float],
    k: int = 10,
    codebooks: list | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by ADC distance: m literal-array lookups + adds per row
    over the code columns only (the raw vectors never load), then
    TakeOrderedAndProject.  Ties break on the id for a stable order."""
    approx = adc_distance(adc_lut(query, codebooks))
    return (
        codes_df.select(
            F.col(id_col), F.round(approx, 6).cast("double").alias("adc_dist")
        )
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_train(
    df: DataFrame,
    coarse_centroids: list[list[float]],
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: int | None = None,
) -> list:
    """Train PQ codebooks on the RESIDUALS w.r.t. the coarse quantizer —
    the IVFADC convention (Jégou et al. 2011 §III.C; FAISS does the
    same).  Residuals are centered near 0, a different distribution
    from the raw vectors, so codebooks fit on raw subvectors and then
    applied to residuals measure a train/apply mismatch rather than
    quantization error.  This computes the same residual projection as
    :func:`ivfpq_encode` and runs :func:`pq_train` over it, so the
    trained books match exactly what encode will quantize."""
    from ocr_api_spark.operators.ivf import ivf_assign

    assigned = ivf_assign(df, coarse_centroids, vec_col=vec_col)
    cents = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in coarse_centroids]
    )
    residual = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.element_at(cents, F.col("ivf_list") + 1),
        lambda a, b: a - b,
    )
    res_df = assigned.select(F.col(id_col), residual.alias("__res"))
    return pq_train(
        res_df, m=m, k=k, iters=iters, vec_col="__res", id_col=id_col, dims=dims
    )


def ivfpq_encode(
    df: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ index build (Jégou et al. 2011, IVFADC — the FAISS
    billion-scale layout): coarse-assign each vector to its nearest
    centroid (``ivf.ivf_assign``), subtract that centroid, and
    PQ-encode the RESIDUAL.  Residuals are far more compact around 0
    than raw vectors, so the same codebook budget quantizes them with
    less error — and the stored index is (ivf_list, m code ints) per
    row: the raw vectors never need to load at search time.

    The residual subtraction is one ``zip_with`` against
    ``element_at(<literal array of centroid arrays>, ivf_list + 1)`` —
    a pure projection; the whole build is assignment-projection →
    residual-projection → encode-projection, zero shuffles."""
    from ocr_api_spark.operators.ivf import ivf_assign

    assigned = ivf_assign(df, coarse_centroids, vec_col=vec_col)
    cents = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in coarse_centroids]
    )
    residual = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.element_at(cents, F.col("ivf_list") + 1),
        lambda a, b: a - b,
    )
    with_res = assigned.withColumn("__res", residual)
    return pq_encode(with_res, codebooks, vec_col="__res").drop("__res", vec_col)


def ivfpq_topk(
    encoded: DataFrame,
    coarse_centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
    codebooks: list | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC search: probe the ``n_probe`` coarse lists nearest the
    query (driver-side argsort over the literal centroids, ties to the
    smaller list id), and score each candidate by ADC against a
    PER-LIST lookup table built on the query's residual w.r.t. THAT
    list's centroid — ``n_probe`` m×k tables of driver floats shipped
    as a literal ``when`` chain on ``ivf_list``.  The plan is a scan of
    the code columns → literal projection → TakeOrderedAndProject;
    list pruning pushes to the scan when ``ivf_list`` partitions the
    index table, which is how the 10^12-row layout stores it."""
    probes = nearest_lists(coarse_centroids, query, n_probe)
    dist = None
    for lst in probes:
        res_q = [a - b for a, b in zip(query, coarse_centroids[lst])]
        term = adc_distance(adc_lut(res_q, codebooks))
        dist = (
            F.when(F.col("ivf_list") == lst, term)
            if dist is None
            else dist.when(F.col("ivf_list") == lst, term)
        )
    return (
        encoded.where(F.col("ivf_list").isin([int(p) for p in probes]))
        .select(
            F.col(id_col),
            F.col("ivf_list").cast("int").alias("ivf_list"),
            F.round(dist, 6).cast("double").alias("adc_dist"),
        )
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
