"""CPC ICON estimator and confidence bounds (cpc/estimator.rs).

The ICON estimator survives merges (``cpc/sketch.rs:76-80``), which
makes it the load-bearing one for a distributed engine whose sketches
are always built per-partition and unioned. Port of
``cpc/estimator.rs:91-429``: a degree-19 polynomial approximation of
the preconditioned ICON mapping for C <= ~5.7K, the exponential
approximation above it, and the empirically-measured confidence
tables for lg_k <= 14 (numeric data in ``_cpc_tables.npz``).
"""

from __future__ import annotations

import math
import os

import numpy as np

ICON_ERROR_CONSTANT = math.log(2.0)
ICON_MIN_LG_K, ICON_MAX_LG_K = 4, 26

_tables = None


def _t():
    global _tables
    if _tables is None:
        _tables = np.load(os.path.join(os.path.dirname(__file__), "_cpc_tables.npz"))
    return _tables


def _evaluate_polynomial(coeffs: np.ndarray, x: float) -> float:
    total = float(coeffs[-1])
    for c in coeffs[-2::-1]:
        total = total * x + float(c)
    return total


def icon_estimate(lg_k: int, num_coupons: int) -> float:
    """cpc/estimator.rs:388-429."""
    if not ICON_MIN_LG_K <= lg_k <= ICON_MAX_LG_K:
        raise ValueError(f"lg_k out of range; got {lg_k}")
    if num_coupons == 0:
        return 0.0
    if num_coupons == 1:
        return 1.0
    k = float(1 << lg_k)
    c = float(num_coupons)
    threshold_factor = 5.7 if lg_k < 14 else 5.6
    if c > threshold_factor * k:
        return 0.7940236163830469 * k * 2.0 ** (c / k)
    factor = _evaluate_polynomial(_t()["icon_poly"][lg_k - ICON_MIN_LG_K], c / (2.0 * k))
    ratio = c / k
    result = c * factor * (1.0 + ratio * ratio * ratio / 66.774757)
    return result if result >= c else c


def _side_x(table_key: str, lg_k: int, kappa: int) -> float:
    if lg_k <= 14:
        return float(_t()[table_key][3 * (lg_k - 4) + (kappa - 1)]) / 10000.0
    return ICON_ERROR_CONSTANT


def icon_confidence_lb(lg_k: int, num_coupons: int, kappa: int) -> float:
    """cpc/estimator.rs:127-149 (note: LB uses the HIGH side table)."""
    if num_coupons == 0:
        return 0.0
    k = float(1 << lg_k)
    x = _side_x("icon_hi", lg_k, kappa)
    eps = kappa * x / math.sqrt(k)
    result = icon_estimate(lg_k, num_coupons) / (1.0 + eps)
    return max(result, float(num_coupons))


def icon_confidence_ub(lg_k: int, num_coupons: int, kappa: int) -> float:
    """cpc/estimator.rs:151-169 (UB uses the LOW side table)."""
    if num_coupons == 0:
        return 0.0
    k = float(1 << lg_k)
    x = _side_x("icon_lo", lg_k, kappa)
    eps = kappa * x / math.sqrt(k)
    return math.ceil(icon_estimate(lg_k, num_coupons) / (1.0 - eps))


HIP_ERROR_CONSTANT = math.sqrt(math.log(2.0) / 2.0)


def _hip_side_x(table_key: str, lg_k: int, kappa: int) -> float:
    if lg_k <= 14:
        return float(_t()[table_key][3 * (lg_k - 4) + (kappa - 1)]) / 10000.0
    return HIP_ERROR_CONSTANT


def hip_confidence_lb(lg_k: int, num_coupons: int, hip_est_accum: float, kappa: int) -> float:
    """cpc/estimator.rs:171-192 (LB uses the HIGH side table)."""
    if num_coupons == 0:
        return 0.0
    k = float(1 << lg_k)
    x = _hip_side_x("hip_hi", lg_k, kappa)
    eps = kappa * x / math.sqrt(k)
    result = hip_est_accum / (1.0 + eps)
    return max(result, float(num_coupons))


def hip_confidence_ub(lg_k: int, num_coupons: int, hip_est_accum: float, kappa: int) -> float:
    """cpc/estimator.rs:194-211 (UB uses the LOW side table)."""
    if num_coupons == 0:
        return 0.0
    k = float(1 << lg_k)
    x = _hip_side_x("hip_lo", lg_k, kappa)
    eps = kappa * x / math.sqrt(k)
    return math.ceil(hip_est_accum / (1.0 - eps))
