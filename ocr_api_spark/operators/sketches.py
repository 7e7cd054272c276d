"""Mergeable cardinality sketches (HyperLogLog) — distinct counting at
10^12 rows without a distinct shuffle.

Spark's ``approx_count_distinct`` is HLL++ too, but its register
layout is engine-private: it can't be exact-oracled, persisted for
incremental merging, or unioned with a sketch another system built.
This HLL is deterministic from md5, so the DuckDB oracle reproduces
the REGISTERS bit-for-bit (the estimate is then plain arithmetic both
sides can pin), and a sketch stored today merges with tomorrow's by
element-wise max — the property that makes per-partition /
per-snapshot distinct counts composable on a 1000-executor run.

Layout: h = first 60 bits of md5(value); bucket = top ``HLL_BUCKET_BITS``
bits; rho = position of the highest set bit in the remaining bits
(computed exactly via ``length(bin(rem))`` — integer ops only, no
floating point anywhere in the sketch itself).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_BUCKET_BITS = 8  # m = 256 registers: rse ~ 1.04/sqrt(m) = 6.5%
_H_BITS = 60  # 15 hex chars: fits signed 64-bit exactly in both engines
_REM_BITS = _H_BITS - HLL_BUCKET_BITS
_REM_MASK = (1 << _REM_BITS) - 1
HLL_M = 1 << HLL_BUCKET_BITS


def hll_register_rows(df: DataFrame, value_col: str) -> DataFrame:
    """(bucket, register) rows — the sketch in its mergeable form
    (union more data = element-wise max of registers; the groupBy is a
    256-key partial aggregate, map-side combined)."""
    h = F.conv(F.substring(F.md5(F.col(value_col)), 1, 15), 16, 10).cast("bigint")
    rem = h.bitwiseAND(F.lit(_REM_MASK))
    rho = (
        F.when(rem == 0, F.lit(_REM_BITS + 1))
        .otherwise(F.lit(_REM_BITS + 1) - F.length(F.bin(rem)))
        .cast("int")
    )
    return (
        df.select(F.shiftright(h, _REM_BITS).cast("int").alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_merge(rows_a: list[tuple[int, int]], rows_b: list[tuple[int, int]]) -> dict[int, int]:
    """Element-wise max — union semantics for two register sets."""
    merged: dict[int, int] = {}
    for bucket, reg in list(rows_a) + list(rows_b):
        merged[bucket] = max(merged.get(bucket, 0), reg)
    return merged


def hll_estimate(register_rows, m: int = HLL_M) -> float:
    """Flajolet et al. 2007 estimator with the small-range linear
    counting correction.  Driver-side arithmetic over the exact integer
    registers (the heavy part — hashing + max — stayed distributed)."""
    regs = dict(register_rows)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    denom = sum(2.0 ** -regs.get(b, 0) for b in range(m))
    raw = alpha * m * m / denom
    zeros = m - len([r for r in regs.values() if r > 0])
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


# the shared estimator arithmetic, spelled ONCE as engine-neutral SQL so
# the Spark query (selectExpr) and the DuckDB oracle evaluate the exact
# same double-precision expression tree: the denominator is an
# integer-exact sum (each register contributes 2^(53-reg), zeros
# contribute 2^53 — max 256*2^53 = 2^61, inside BIGINT), so the only
# floating-point steps are one cast and the literal alpha arithmetic,
# all in identical order.  The linear-counting branch's m*ln(m/zeros)
# is NOT evaluated by either engine (ADVICE r5: JVM Math.log and libm
# log are each allowed a sub-ulp slop that round(.., 4) can amplify at
# a half-ulp boundary — the exact divergence class the decimal-sum
# pattern fixed in events_user_stats): zero_buckets has only 256
# possible values, so the branch is an integer-keyed lookup of
# driver-precomputed literals, identical bytes in both engines' SQL.
#
# every fractional literal carries E0: a bare `0.7213` parses as
# DECIMAL in Spark SQL (decimal division semantics would silently
# diverge from DuckDB's double math); `0.7213E0` is DOUBLE in both.
_LINEAR_COUNT_LOOKUP_SQL = (
    f"CASE {HLL_M} - nonzero_buckets "
    + " ".join(
        f"WHEN {z} THEN {round(HLL_M * math.log(HLL_M / z), 4)!r}E0"
        for z in range(1, HLL_M + 1)
    )
    + " END"
)
HLL_ESTIMATE_SQL_EXPR = (
    "CASE WHEN ({m} - nonzero_buckets) > 0 AND "
    "(0.7213E0 / (1.0E0 + 1.079E0 / {m}.0E0)) * {m2}.0E0 * 9007199254740992.0E0 "
    "/ denom_scaled <= {lin}.0E0 "
    "THEN {lookup} "
    "ELSE round((0.7213E0 / (1.0E0 + 1.079E0 / {m}.0E0)) * {m2}.0E0 * 9007199254740992.0E0 "
    "/ denom_scaled, 4) END"
).format(m=HLL_M, m2=HLL_M * HLL_M, lin=int(2.5 * HLL_M), lookup=_LINEAR_COUNT_LOOKUP_SQL)


def hll_estimate_row(df: DataFrame, value_col: str) -> DataFrame:
    """ONE-row distributed cardinality estimate (Flajolet et al. 2007
    with the linear-counting small-range correction), plus the exact
    distinct count for side-by-side comparison.  All heavy work —
    hashing, per-bucket max, the distinct count — is distributed; the
    estimator itself is constant-size arithmetic over a 256-register
    aggregate.

    Cross-engine determinism: summing ``2.0**-register`` directly would
    be partition-order-dependent in the last ulp, so the denominator is
    accumulated as the INTEGER ``sum(2^(53-register))`` (exact,
    order-independent) and only then divided — see
    ``HLL_ESTIMATE_SQL_EXPR``, which the DuckDB oracle evaluates
    verbatim."""
    regs = hll_register_rows(df, value_col)
    scaled = regs.agg(
        F.count("*").cast("bigint").alias("nonzero_buckets"),
        # pyspark's shiftleft() only takes a literal shift; the SQL form
        # accepts a column expression
        F.sum(F.expr(f"shiftleft(cast(1 AS bigint), {_REM_BITS + 1} - register)"))
        .cast("bigint")
        .alias("present_scaled"),
    )
    exact = df.agg(F.count_distinct(F.col(value_col)).cast("bigint").alias("exact_distinct"))
    return (
        scaled.crossJoin(exact)
        .withColumn(
            "denom_scaled",
            (
                (F.lit(HLL_M) - F.col("nonzero_buckets"))
                * F.lit(1 << (_REM_BITS + 1)).cast("bigint")
                + F.col("present_scaled")
            ).cast("bigint"),
        )
        .selectExpr(
            f"{HLL_M} AS m",
            "nonzero_buckets",
            f"cast({HLL_M} - nonzero_buckets AS bigint) AS zero_buckets",
            "denom_scaled",
            f"cast({HLL_ESTIMATE_SQL_EXPR} AS double) AS hll_estimate",
            "exact_distinct",
        )
    )
