"""LSH banding planner: pick (bands, rows) from the S-curve.

For MinHash-LSH with ``b`` bands of ``r`` rows, a pair with true
Jaccard ``s`` collides in at least one band with probability

    P(s) = 1 - (1 - s^r)^b

The planner integrates the S-curve's error areas around the target
threshold ``t`` (standard public LSH tuning, e.g. MMDS ch. 3):

    FP = integral_0^t  P(s) ds        (candidates below threshold)
    FN = integral_t^1 (1 - P(s)) ds   (misses above threshold)

and returns the (b, r) with ``b * r <= num_perms`` minimizing
``fp_weight * FP + fn_weight * FN``. Candidates feed an exact verify
in this engine, so false positives cost only verify compute while
false negatives are unrecoverable — hence the recall-leaning default
weights. ``probability(s, b, r)`` is exposed for sweep tooling.
"""

from __future__ import annotations

import numpy as np


def probability(s, bands: int, rows: int):
    """P(collide in >= 1 band) for true Jaccard ``s`` (scalar/array)."""
    s = np.asarray(s, dtype=np.float64)
    return 1.0 - (1.0 - s**rows) ** bands


def error_areas(bands: int, rows: int, threshold: float, n_grid: int = 512):
    """(FP area below threshold, FN area above) by trapezoidal rule."""
    lo = np.linspace(0.0, threshold, n_grid)
    hi = np.linspace(threshold, 1.0, n_grid)
    fp = float(np.trapz(probability(lo, bands, rows), lo))
    fn = float(np.trapz(1.0 - probability(hi, bands, rows), hi))
    return fp, fn


def optimal_bands(
    num_perms: int,
    threshold: float,
    fp_weight: float = 0.2,
    fn_weight: float = 0.8,
) -> tuple[int, int, float, float]:
    """-> (bands, rows, fp_area, fn_area) minimizing the weighted
    error over all integer splits with ``bands * rows <= num_perms``
    (only exact divisors are considered so every permutation slot is
    used — the signature is computed either way)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_perms < 2:
        raise ValueError("num_perms must be >= 2")
    best = None
    for rows in range(1, num_perms + 1):
        bands = num_perms // rows
        if bands * rows != num_perms or bands < 1:
            continue
        fp, fn = error_areas(bands, rows, threshold)
        cost = fp_weight * fp + fn_weight * fn
        if best is None or cost < best[0]:
            best = (cost, bands, rows, fp, fn)
    assert best is not None
    return best[1], best[2], best[3], best[4]
