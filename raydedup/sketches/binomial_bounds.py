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
- ``2 <= num_samples <= 120`` mid-theta: the reference interpolates
  with generated equivalence tables / an exact Bayesian search
  (``:505-520``); we use the continuity-corrected Gaussian there too —
  a documented small-sample deviation of at most a few counts.

Tail probabilities per NumStdDev from ``common/num_std_dev.rs:24-29``.
"""

from __future__ import annotations

import math

DELTA_OF_NUM_STD_DEVS = [
    0.5000000000000000000,
    0.1586553191586026479,
    0.0227502618904135701,
    0.0013498126861731796,
]


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
    elif theta > 1.0 - 1e-5:
        lb = float(num_samples)
    else:
        lb = _cont_classic_lb(num_samples, theta, float(num_std_dev)) - 0.5
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
    elif theta > 1.0 - 1e-5:
        ub = float(num_samples + 1)
    else:
        ub = _cont_classic_ub(num_samples, theta, float(num_std_dev)) + 0.5
    return max(estimate, ub)
