"""Binomial confidence bounds for theta sketches.

Port of the reference's bound math (``common/binomial_bounds.rs``) for
the regimes a distributed engine hits:

- ``num_samples > 120``: Gaussian approximation to the binomial with
  continuity correction (``cont_classic_lb/ub`` —
  ``binomial_bounds.rs:345-362``) plus the reference's ±0.5 "fake
  rounding". This is the production regime: an estimating theta
  sketch retains >= k >= 2^5 entries and our defaults retain 4096.
- ``num_samples == 0 / 1``: the exact logarithmic tail formulas
  (``:492-499``, ``:533-537``).
- ``2 <= num_samples <= 120``: full reference parity — the
  equivalence-table-adjusted Gaussian when ``theta < k/360``
  (tables from ``binomial_bounds.rs:23-286``, packed as numeric data
  in ``_binomial_tables.npz``) and the exact Bayesian tail search
  (``special_n_star`` / ``special_n_prime_f``, ``:394-480``) in the
  mid-theta band.

Tail probabilities per NumStdDev from ``common/num_std_dev.rs:24-29``.
"""

from __future__ import annotations

import math
import os

DELTA_OF_NUM_STD_DEVS = [
    0.5000000000000000000,
    0.1586553191586026479,
    0.0227502618904135701,
    0.0013498126861731796,
]


_equiv_tables = None


def _equiv(upper: bool, num_samples: int, num_std_dev: int) -> float:
    """Equivalence-table num_std_devs for 2<=k<=120, theta < k/360
    (binomial_bounds.rs:505-511, 546-552)."""
    global _equiv_tables
    if _equiv_tables is None:
        import numpy as np

        _equiv_tables = np.load(os.path.join(os.path.dirname(__file__), "_binomial_tables.npz"))
    key = "ub_equiv" if upper else "lb_equiv"
    return float(_equiv_tables[key][3 * num_samples + num_std_dev - 1])


def _special_n_star(num_samples: int, p: float, delta: float) -> int | None:
    """Smallest m with P(X >= k | n=m, p) > delta
    (binomial_bounds.rs:394-418); None when out of the valid range."""
    q = 1.0 - p
    if num_samples / p >= 500.0:
        return None
    cur = p**num_samples
    if cur <= 1e-100:
        return None
    tot, m = cur, num_samples
    while tot <= delta:
        cur = (cur * q * m) / (m + 1 - num_samples)
        tot += cur
        m += 1
    return m - 1


def _special_n_prime_b(num_samples: int, p: float, delta: float) -> int | None:
    """Smallest m with P(X >= k | n=m, p) >= 1-delta
    (binomial_bounds.rs:439-459)."""
    q = 1.0 - p
    one_minus_delta = 1.0 - delta
    cur = p**num_samples
    if cur <= 1e-100:
        return None
    tot, m = cur, num_samples
    while tot < one_minus_delta:
        cur = (cur * q * m) / (m + 1 - num_samples)
        tot += cur
        m += 1
    return m


def _special_n_prime_f(num_samples: int, p: float, delta: float) -> int | None:
    if num_samples / p >= 500.0:
        return None
    return _special_n_prime_b(num_samples + 1, p, delta)


def _cont_classic_lb(num_samples: int, theta: float, num_std_devs: float) -> float:
    n_hat = (num_samples - 0.5) / theta
    b = num_std_devs * math.sqrt((1.0 - theta) / theta)
    d = 0.5 * b * math.sqrt(b * b + 4.0 * n_hat)
    return n_hat + 0.5 * b * b - d


def _cont_classic_ub(num_samples: int, theta: float, num_std_devs: float) -> float:
    n_hat = (num_samples + 0.5) / theta
    b = num_std_devs * math.sqrt((1.0 - theta) / theta)
    d = 0.5 * b * math.sqrt(b * b + 4.0 * n_hat)
    return n_hat + 0.5 * b * b + d


def lower_bound(num_samples: int, theta: float, num_std_dev: int) -> float:
    """binomial_bounds.rs::lower_bound."""
    if not 0.0 < theta <= 1.0:
        raise ValueError(f"theta must be in (0, 1], got {theta}")
    estimate = num_samples / theta
    if theta == 1.0:
        lb = float(num_samples)
    elif num_samples == 0:
        lb = 0.0
    elif num_samples == 1:
        delta = DELTA_OF_NUM_STD_DEVS[num_std_dev]
        lb = math.floor(math.log(1.0 - delta) / math.log(1.0 - theta))
    elif num_samples > 120:
        lb = _cont_classic_lb(num_samples, theta, float(num_std_dev)) - 0.5
    elif theta > 1.0 - 1e-5:
        lb = float(num_samples)
    elif theta < num_samples / 360.0:
        lb = _cont_classic_lb(num_samples, theta, _equiv(False, num_samples, num_std_dev)) - 0.5
    else:  # mid-theta 2..120: exact Bayesian search (rs:516-520)
        delta = DELTA_OF_NUM_STD_DEVS[num_std_dev]
        n_star = _special_n_star(num_samples, theta, delta)
        lb = float(n_star if n_star is not None else num_samples)
    return min(estimate, max(float(num_samples), lb))


def upper_bound(num_samples: int, theta: float, num_std_dev: int, no_data_seen: bool = False) -> float:
    """binomial_bounds.rs::upper_bound."""
    if no_data_seen:
        return 0.0
    if not 0.0 < theta <= 1.0:
        raise ValueError(f"theta must be in (0, 1], got {theta}")
    estimate = num_samples / theta
    if theta == 1.0:
        ub = float(num_samples)
    elif num_samples == 0:
        delta = DELTA_OF_NUM_STD_DEVS[num_std_dev]
        ub = math.ceil(math.log(delta) / math.log(1.0 - theta))
    elif num_samples > 120:
        ub = _cont_classic_ub(num_samples, theta, float(num_std_dev)) + 0.5
    elif theta > 1.0 - 1e-5:
        ub = float(num_samples + 1)
    elif theta < num_samples / 360.0:
        ub = _cont_classic_ub(num_samples, theta, _equiv(True, num_samples, num_std_dev)) + 0.5
    else:  # mid-theta 2..120: exact Bayesian search (rs:557-561)
        delta = DELTA_OF_NUM_STD_DEVS[num_std_dev]
        n_prime = _special_n_prime_f(num_samples, theta, delta)
        ub = float(n_prime if n_prime is not None else num_samples + 1)
    return max(estimate, ub)
