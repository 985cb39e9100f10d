"""C2 kernelfunction (/root/reference/R/processing.R:23-42): distance-
decay weights as pure column arithmetic (JVM-side, codegen) plus numpy
twins for use inside pandas UDFs.

Reference semantics, pinned by its own golden tests
(/root/reference/tests/testthat/test-processing.R:986-1010):
- uniform: 0.5 when d ≤ bw else 0
- all others clamp d ← min(d, bw) first (so they hit 0 at d ≥ bw):
  quartic      (15/16)·(1-(d/bw)²)²
  triweight    1-(d/bw)³
  epanechnikov (3/4)·(1-(d/bw)²)

All formulas use only +,-,*,/ on IEEE doubles — bit-identical in Spark,
DuckDB and numpy, which is what makes kernel-weighted aggregates
oracle-checkable.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

KERNELS = ("uniform", "quartic", "triweight", "epanechnikov")


def kernel_col(d: Column, bw: float, kernel: str) -> Column:
    if kernel == "uniform":
        return F.when(d > bw, 0.0).otherwise(0.5)
    t = F.least(d, F.lit(float(bw))) / float(bw)
    if kernel == "quartic":
        u = 1.0 - t * t
        return (15.0 / 16.0) * u * u
    if kernel == "triweight":
        return 1.0 - t * t * t
    if kernel == "epanechnikov":
        return (3.0 / 4.0) * (1.0 - t * t)
    raise ValueError(f"unknown kernel {kernel!r}")  # reference errors too


def kernel_sql(d: str, bw: float, kernel: str) -> str:
    """Identical SQL text for Spark SQL and DuckDB oracles."""
    if kernel == "uniform":
        # CAST: Spark types a two-decimal-literal CASE as DECIMAL(2,1),
        # which surfaces as Decimal objects at collect (DuckDB: DOUBLE)
        return (f"CAST((CASE WHEN ({d}) > {bw!r} THEN 0.0 ELSE 0.5 END)"
                " AS DOUBLE)")
    t = f"(LEAST({d}, {bw!r}) / {bw!r})"
    if kernel == "quartic":
        return f"((15.0/16.0) * (1.0 - {t}*{t}) * (1.0 - {t}*{t}))"
    if kernel == "triweight":
        return f"(1.0 - {t}*{t}*{t})"
    if kernel == "epanechnikov":
        return f"((3.0/4.0) * (1.0 - {t}*{t}))"
    raise ValueError(f"unknown kernel {kernel!r}")


def kernel_np(d: np.ndarray, bw: float, kernel: str) -> np.ndarray:
    d = np.asarray(d, dtype=np.float64)
    if kernel == "uniform":
        return np.where(d > bw, 0.0, 0.5)
    t = np.minimum(d, bw) / bw
    if kernel == "quartic":
        u = 1.0 - t * t
        return (15.0 / 16.0) * u * u
    if kernel == "triweight":
        return 1.0 - t * t * t
    if kernel == "epanechnikov":
        return (3.0 / 4.0) * (1.0 - t * t)
    raise ValueError(f"unknown kernel {kernel!r}")


# Weight quantization: FLOOR(w * 2^16) turns kernel weights into exact
# integers so weighted sums are associative (order-independent) — the
# device that keeps kernel-weighted zonal means bit-identical between a
# shuffled Spark aggregation and a sequential DuckDB oracle.
QUANT = 65536


def quantize_np(w: np.ndarray) -> np.ndarray:
    return np.floor(w * QUANT).astype(np.int64)


def quantize_sql(w: str) -> str:
    return f"CAST(FLOOR(({w}) * {QUANT}) AS BIGINT)"
