"""b-bit MinHash fold + estimator kernels."""

import numpy as np
import pyarrow as pa
import pytest


def test_popcount_matches_python():
    from raydedup.ops.bbit import _popcount_u64

    rng = np.random.default_rng(3)
    w = rng.integers(0, 2**63, size=(50, 2), dtype=np.int64).view(np.uint64)
    got = _popcount_u64(w)
    exp = np.array([bin(int(a)).count("1") + bin(int(b)).count("1") for a, b in w])
    assert np.array_equal(got, exp)


def test_fold_sig_bits_roundtrip():
    from raydedup.ops.bbit import fold_sig_bits

    rng = np.random.default_rng(5)
    sig = rng.integers(0, 2**32, size=(20, 128), dtype=np.uint64)
    words = fold_sig_bits(sig)
    assert words.shape == (20, 2)
    for i in range(20):
        for j in range(128):
            assert ((int(words[i, j // 64]) >> (j % 64)) & 1) == (int(sig[i, j]) & 1)


def test_estimator_endpoints():
    """Identical signatures estimate J=1; independent random bits ~0."""
    from raydedup.ops.bbit import _popcount_u64, fold_sig_bits

    rng = np.random.default_rng(9)
    a = rng.integers(0, 2**32, size=(1, 128), dtype=np.uint64)
    wa = fold_sig_bits(a)
    agree_self = _popcount_u64(~(wa ^ wa))
    assert agree_self[0] == 128  # j = 2*1-1 = 1

    b = rng.integers(0, 2**32, size=(200, 128), dtype=np.uint64)
    c = rng.integers(0, 2**32, size=(200, 128), dtype=np.uint64)
    ag = _popcount_u64(~(fold_sig_bits(b) ^ fold_sig_bits(c)))
    j = np.maximum(2.0 * ag / 128.0 - 1.0, 0.0)
    assert j.mean() < 0.1  # half-agreement baseline -> ~0 after clipping


@pytest.mark.usefixtures("ray_session")
def test_bbit_estimates_track_signature_jaccard():
    """Through the Ray path: near-dup pairs' 1-bit estimates track the
    full 32-bit signature agreement within the b=1 variance bound."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from raydedup.config import DedupConfig
    from raydedup.ops.bbit import bbit_jaccard_pairs
    from raydedup.pipeline.run import run_dedup

    tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    import pyarrow.compute as pc

    pages = rd.from_arrow(
        pa.table(
            {
                "url": pc.cast(tbl["doc_id"], pa.string()),
                "text": tbl["text"],
            }
        )
    )
    res = run_dedup(pages, DedupConfig(), n_buckets=8, concurrency=(1, 2))
    est = bbit_jaccard_pairs(res.signatures, res.verified, id_column="url").to_pandas()
    ver = res.verified.to_pandas()[["url_a", "url_b", "jaccard_sig_est"]]
    m = est.merge(ver, on=["url_a", "url_b"])
    assert len(m) == len(est) > 0
    # 3-sigma bound for P=128 one-bit slots
    bound = 3 * np.sqrt(1.0 / 128.0) + 1e-9
    assert (np.abs(m.j_b1 - m.jaccard_sig_est) <= bound + 0.1).all()
