"""Reference-conformant HLL estimators (composite + bounds).

Ports the estimator math of the reference
(``/root/reference/datasketches/src/hll/estimator.rs``,
``cubic_interpolation.rs:24-140``, ``harmonic_numbers.rs:24-103``,
``composite_interpolation.rs:28-66``) so merged/deserialized sketches
produce the same numbers a Java/C++/Rust DataSketches deployment
would. The interpolation X tables (18 lg_k values x 257 knots) and
the lg_k<=12 empirical relative-error tables are numeric data from
the Apache DataSketches project, packed in ``_hll_tables.npz``.

The engine's sketches are built per-partition and merged, so the
out-of-order (composite) path is the load-bearing one — exactly the
estimator the reference dispatches to after any union
(``hll/estimator.rs:115-121``).
"""

from __future__ import annotations

import math
import os

import numpy as np

_EULER_MASCHERONI = 0.5772156649015329

# Exact harmonic numbers H(0)..H(24) (harmonic_numbers.rs:27-53)
_EXACT_HARMONIC = [
    0.0, 1.0, 1.5, 11.0 / 6.0, 25.0 / 12.0, 137.0 / 60.0, 49.0 / 20.0,
    363.0 / 140.0, 761.0 / 280.0, 7129.0 / 2520.0, 7381.0 / 2520.0,
    83711.0 / 27720.0, 86021.0 / 27720.0, 1145993.0 / 360360.0,
    1171733.0 / 360360.0, 1195757.0 / 360360.0, 2436559.0 / 720720.0,
    42142223.0 / 12252240.0, 14274301.0 / 4084080.0,
    275295799.0 / 77597520.0, 55835135.0 / 15519504.0,
    18858053.0 / 5173168.0, 19093197.0 / 5173168.0,
    444316699.0 / 118982864.0, 1347822955.0 / 356948592.0,
]

_tables = None


def _load_tables():
    global _tables
    if _tables is None:
        path = os.path.join(os.path.dirname(__file__), "_hll_tables.npz")
        _tables = np.load(path)
    return _tables


def harmonic_number(n: int) -> float:
    """H(n); exact below 25, asymptotic expansion above
    (harmonic_numbers.rs:58-83)."""
    if n < 25:
        return _EXACT_HARMONIC[n]
    x = float(n)
    inv_sq = 1.0 / (x * x)
    s = math.log(x) + _EULER_MASCHERONI + 1.0 / (2.0 * x)
    p = inv_sq
    s -= p / 12.0
    p *= inv_sq
    s += p / 120.0
    p *= inv_sq
    s -= p / 252.0
    p *= inv_sq
    s += p / 240.0
    return s


def bitmap_estimate(k: int, num_bits_set: int) -> float:
    """Linear-counting estimate k*(H(k) - H(k - set))
    (harmonic_numbers.rs:96-103)."""
    return k * (harmonic_number(k) - harmonic_number(k - num_bits_set))


def _cubic_interpolate(x0, y0, x1, y1, x2, y2, x3, y3, x) -> float:
    """Lagrange cubic (cubic_interpolation.rs:111-140)."""
    t0 = y0 * ((x - x1) * (x - x2) * (x - x3)) / ((x0 - x1) * (x0 - x2) * (x0 - x3))
    t1 = y1 * ((x - x0) * (x - x2) * (x - x3)) / ((x1 - x0) * (x1 - x2) * (x1 - x3))
    t2 = y2 * ((x - x0) * (x - x1) * (x - x3)) / ((x2 - x0) * (x2 - x1) * (x2 - x3))
    t3 = y3 * ((x - x0) * (x - x1) * (x - x2)) / ((x3 - x0) * (x3 - x1) * (x3 - x2))
    return t0 + t1 + t2 + t3


def _interp_x_stride(x_arr: np.ndarray, y_stride: float, x: float) -> float:
    """cubic_interpolation.rs:65-108 — 4-point window selection then
    Lagrange cubic over (x_arr[i], y_stride*i) knots."""
    n = len(x_arr)
    last = n - 1
    if x == x_arr[last]:
        return y_stride * last
    # find i with x_arr[i] <= x < x_arr[i+1]
    offset = int(np.searchsorted(x_arr, x, side="right")) - 1
    if offset == 0:
        base = 0
    elif offset == n - 2:
        base = offset - 2
    else:
        base = offset - 1
    xs = x_arr[base : base + 4]
    return _cubic_interpolate(
        xs[0], y_stride * base,
        xs[1], y_stride * (base + 1),
        xs[2], y_stride * (base + 2),
        xs[3], y_stride * (base + 3),
        x,
    )


def raw_hll_estimate(lg_k: int, kxq: float) -> float:
    """Standard HLL estimate with small-k correction factors
    (estimator.rs:174-186)."""
    k = float(1 << lg_k)
    if lg_k == 4:
        cf = 0.673
    elif lg_k == 5:
        cf = 0.697
    elif lg_k == 6:
        cf = 0.709
    else:
        cf = 0.7213 / (1.0 + 1.079 / k)
    return cf * k * k / kxq


def composite_estimate(lg_k: int, kxq: float, cur_min: int, num_at_cur_min: int) -> float:
    """The reference's out-of-order estimator (estimator.rs:211-263):
    cubic interpolation of the raw estimate over the composite X table,
    blended with linear counting for small cardinalities."""
    t = _load_tables()
    raw_est = raw_hll_estimate(lg_k, kxq)
    x_arr = t["x_arrs"][lg_k - 4]
    y_stride = float(t["y_strides"][lg_k - 4])
    if raw_est < x_arr[0]:
        return 0.0
    last = len(x_arr) - 1
    if raw_est > x_arr[last]:
        return raw_est * ((y_stride * last) / x_arr[last])
    adj_est = _interp_x_stride(x_arr, y_stride, raw_est)
    k = 1 << lg_k
    if adj_est > 3.0 * k:
        return adj_est
    num_unhit = num_at_cur_min if cur_min == 0 else 0
    if num_unhit == 0:
        lin_est = k * math.log(k / 0.5)
    else:
        lin_est = bitmap_estimate(k, k - num_unhit)
    avg_est = (adj_est + lin_est) / 2.0
    if lg_k == 4:
        crossover = 0.718
    elif lg_k == 5:
        crossover = 0.672
    else:
        crossover = 0.64
    return adj_est if avg_est > crossover * k else lin_est


def rel_err(lg_k: int, upper_bound: bool, ooo: bool, num_std_dev: int) -> float:
    """estimator.rs:343-371 — analytical RSE above lg_k 12, empirical
    quantile tables (RelativeErrorTables) below."""
    if lg_k > 12:
        rse_factor = 1.03896 if ooo else 0.8325546
        k = float(1 << lg_k)
        sign = -1.0 if upper_bound else 1.0
        return sign * num_std_dev * rse_factor / math.sqrt(k)
    t = _load_tables()
    idx = (lg_k - 4) * 3 + (num_std_dev - 1)
    if not ooo and not upper_bound:
        return float(t["hip_lb"][idx])
    if not ooo and upper_bound:
        return float(t["hip_ub"][idx])
    if ooo and not upper_bound:
        return float(t["non_hip_lb"][idx])
    return float(t["non_hip_ub"][idx])


def kxq_from_regs(regs: np.ndarray) -> float:
    """kxq0+kxq1 = sum over registers of 2^-v, computed via a 64-bin
    histogram so the float sum is exact regardless of register order
    (matches the reference's incremental kxq maintenance)."""
    counts = np.bincount(regs, minlength=64)
    vals = np.ldexp(1.0, -np.arange(len(counts), dtype=np.int64))
    # sum small-to-large for bit-stable accumulation
    return float(np.sum((counts * vals)[::-1]))
