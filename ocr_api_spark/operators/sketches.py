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
