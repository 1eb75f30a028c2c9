"""Frequent Directions (sketches/fd.py, ops/fd_embed.py): the
covariance guarantee, mergeability, determinism of the canonical-order
distributed plan, and serde."""

import numpy as np
import pyarrow as pa

from raydedup.ops.fd_embed import _bucket_of, fd_spectrum_local
from raydedup.sketches.fd import FrequentDirections, fd_reduce_ordered


def _mat(n=400, d=24, rank=6, seed=5):
    rng = np.random.default_rng(seed)
    U = rng.normal(size=(n, rank))
    V = rng.normal(size=(rank, d))
    return U @ V * 0.5 + rng.normal(size=(n, d)) * 0.05


def test_covariance_guarantee():
    """0 ≤ xᵀ(AᵀA − BᵀB)x ≤ ‖A‖F²/ℓ — checked via the spectrum of the
    difference (both directions: B never overestimates)."""
    A = _mat()
    for ell in (8, 12, 20):
        fd = FrequentDirections(ell, A.shape[1]).append(A)
        B = fd.sketch
        D = A.T @ A - B.T @ B
        eig = np.linalg.eigvalsh(D)
        assert eig.min() >= -1e-8, "BᵀB must underestimate AᵀA"
        assert eig.max() <= fd.cov_error_bound() + 1e-8
        assert np.isclose(fd.cov_error_bound(), (A**2).sum() / ell, rtol=1e-12)


def test_merge_preserves_guarantee_and_mass():
    A = _mat(seed=1)
    half = len(A) // 2
    a = FrequentDirections(10, A.shape[1]).append(A[:half])
    b = FrequentDirections(10, A.shape[1]).append(A[half:])
    m = a.merge(b)
    assert m.n_rows == len(A)
    assert np.isclose(
        m.squared_frob, (A[:half] ** 2).sum() + (A[half:] ** 2).sum(), rtol=1e-12
    )
    D = A.T @ A - m.sketch.T @ m.sketch
    eig = np.linalg.eigvalsh(D)
    assert eig.min() >= -1e-8
    assert eig.max() <= m.cov_error_bound() + 1e-8


def test_canonical_order_is_blocking_invariant():
    """Bucket + in-bucket sort + ascending-bucket fold gives the
    bit-identical sketch for ANY input blocking (the determinism
    contract the distributed op and its twin rely on)."""
    A = _mat(n=300, d=16, seed=7)
    ids = np.arange(len(A), dtype=np.int64) * 13 % 9973
    n_buckets = 4

    def run(perm):
        aid, am = ids[perm], A[perm]
        buckets = _bucket_of(aid, n_buckets)
        sks = {}
        for bk in np.unique(buckets):
            m = buckets == bk
            order = np.argsort(aid[m], kind="stable")
            sks[int(bk)] = FrequentDirections(8, A.shape[1]).append(am[m][order])
        return fd_reduce_ordered(sks).sketch

    base = run(np.arange(len(A)))
    for seed in (0, 1):
        perm = np.random.default_rng(seed).permutation(len(A))
        assert np.array_equal(run(perm), base)


def test_serde_roundtrip():
    A = _mat(n=50, d=12, seed=9)
    fd = FrequentDirections(6, 12).append(A)
    back = FrequentDirections.from_bytes(fd.to_bytes())
    assert np.array_equal(back.sketch, fd.sketch)
    assert back.n_rows == fd.n_rows and back.squared_frob == fd.squared_frob
    # merged after roundtrip still works
    back.merge(FrequentDirections(6, 12).append(A))
    assert back.n_rows == 2 * len(A)


def test_exact_below_ell():
    """Fewer than ℓ absorbed directions: BᵀB == AᵀA exactly (rank-k
    input, ℓ > k → FD is lossless)."""
    rng = np.random.default_rng(3)
    V = rng.normal(size=(3, 10))
    A = rng.normal(size=(40, 3)) @ V  # rank 3
    fd = FrequentDirections(8, 10).append(A)
    assert np.allclose(fd.sketch.T @ fd.sketch, A.T @ A, atol=1e-8)


def test_local_twin_table_shape():
    rng = np.random.default_rng(2)
    n, d = 120, 16
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [rng.normal(size=d).astype(np.float32) for _ in range(n)],
                pa.list_(pa.float32()),
            ),
        }
    )
    out = fd_spectrum_local(tbl, ell=8, n_buckets=4, top=8)
    assert out.column_names == ["rank", "sigma"]
    sv = out["sigma"].to_numpy()
    assert len(sv) == 8 and all(sv[:-1] >= sv[1:])  # descending
