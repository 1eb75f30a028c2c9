"""LSH banding planner: S-curve math + optimal split behavior."""

import numpy as np
import pytest


def test_probability_matches_closed_form():
    from raydedup.pipeline.plan import probability

    rng = np.random.default_rng(3)
    for _ in range(50):
        s = float(rng.uniform(0, 1))
        b = int(rng.integers(1, 64))
        r = int(rng.integers(1, 16))
        want = 1.0 - (1.0 - s**r) ** b
        assert probability(s, b, r) == pytest.approx(want, rel=1e-12)


def test_probability_is_monotone_in_s():
    from raydedup.pipeline.plan import probability

    s = np.linspace(0, 1, 200)
    p = probability(s, 32, 4)
    assert (np.diff(p) >= -1e-15).all()
    assert p[0] == 0.0 and p[-1] == pytest.approx(1.0)


def test_error_areas_shrink_with_more_perms():
    """More permutations -> a sharper S-curve -> both areas at the
    planner's chosen split shrink."""
    from raydedup.pipeline.plan import optimal_bands

    _, _, fp_small, fn_small = optimal_bands(32, 0.8)
    _, _, fp_big, fn_big = optimal_bands(256, 0.8)
    assert 0.2 * fp_big + 0.8 * fn_big < 0.2 * fp_small + 0.8 * fn_small


def test_rows_monotone_in_threshold():
    """Higher target thresholds need steeper curves (more rows/band)."""
    from raydedup.pipeline.plan import optimal_bands

    rows = [optimal_bands(128, t)[1] for t in (0.3, 0.5, 0.7, 0.9)]
    assert rows == sorted(rows)


def test_optimal_uses_every_perm_slot():
    from raydedup.pipeline.plan import optimal_bands

    for perms in (64, 128, 256):
        b, r, _, _ = optimal_bands(perms, 0.8)
        assert b * r == perms


def test_planner_rejects_bad_inputs():
    from raydedup.pipeline.plan import optimal_bands

    with pytest.raises(ValueError):
        optimal_bands(128, 0.0)
    with pytest.raises(ValueError):
        optimal_bands(128, 1.0)
    with pytest.raises(ValueError):
        optimal_bands(1, 0.8)


def test_config_plan_constructor():
    from raydedup.config import DedupConfig
    from raydedup.pipeline.plan import probability

    cfg = DedupConfig.plan(threshold=0.9, num_perms=128)
    assert cfg.bands * cfg.rows == 128
    assert cfg.threshold == 0.9
    # the planned curve must collide confidently above threshold and
    # rarely well below it
    assert probability(0.95, cfg.bands, cfg.rows) > 0.9
    assert probability(0.3, cfg.bands, cfg.rows) < 0.1
    # planned knobs round-trip through the config hash like any other
    assert cfg.config_hash() != DedupConfig().config_hash()
