"""Corpus-spectrum sketching over an embedding column via Frequent
Directions (sketches/fd.py).

The pipeline shape: rows hash-bucket by id (ONE narrow exchange of
(bucket, id, vector)); each bucket absorbs its rows in ascending id
order into an ℓ×d FD sketch; the n_buckets sketches (ℓ·d floats each,
corpus-size-independent) fold on the driver in ascending bucket order.
Both orders are part of the determinism contract — any blocking of the
input yields the bit-identical final sketch, which is what lets the
single-process twin (``fd_spectrum_local``) match value-exactly.

At 100 TB the bucket count scales with cluster width and the driver
fold stays n_buckets × ℓ×d doubles — e.g. 1024 buckets × 32×768
floats ≈ 200 MB, still driver-sized; fold pairs of buckets in a tree
of Ray tasks before the driver if ℓ·d grows past that (the merge is
associative; only the ORDER is fixed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.sketches.fd import FrequentDirections, fd_reduce_ordered
from raydedup.sketches.hashing import fmix64

U64 = np.uint64


def _bucket_of(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    return (fmix64(ids.astype(np.int64).view(U64)) % U64(n_buckets)).astype(np.int64)


def _fd_bucket_table(ids: np.ndarray, mat: np.ndarray, ell: int, bucket: int) -> pa.Table:
    """One bucket's rows (ascending id) → one (bucket, sketch) row."""
    order = np.argsort(ids, kind="stable")
    fd = FrequentDirections(ell, mat.shape[1]).append(mat[order])
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int64()),
            "sketch": pa.array([fd.to_bytes()], pa.large_binary()),
        }
    )


def fd_corpus_sketch(ds, ell: int = 16, n_buckets: int = 8, id_column: str = "vec_id", vec_column: str = "embedding") -> FrequentDirections:
    """embeddings Dataset → one FD sketch of the whole row matrix."""
    from raydedup.ops.ann import _emb_matrix

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        return batch.append_column("bucket", pa.array(_bucket_of(ids, n_buckets), pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        ids = g[id_column].to_numpy(zero_copy_only=False)
        mat = _emb_matrix(g, vec_column).astype(np.float64)
        return _fd_bucket_table(ids, mat, ell, int(g["bucket"][0].as_py()))

    rows = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .take_all()
    )  # n_buckets rows of ell*d doubles — bounded, the intended gather
    return fd_reduce_ordered(
        {r["bucket"]: FrequentDirections.from_bytes(r["sketch"]) for r in rows}
    )


def spectrum_table(fd: FrequentDirections, top: int = 16) -> pa.Table:
    sv = fd.singular_values()[:top]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(sv) + 1), pa.int64()),
            "sigma": pa.array(np.round(sv, 6), pa.float64()),
        }
    )


def fd_group_spectra(ds, group_column: str = "label", ell: int = 8, top: int = 4, id_column: str = "vec_id", vec_column: str = "embedding"):
    """Per-group embedding spectra — the drift-report shape ("has
    source X's embedding distribution shifted?"): one FD sketch per
    group, rows absorbed in ascending id order (map_groups hands the
    whole group, so the result is blocking-invariant with no bucket
    fold needed). Output (group, rank, sigma) — fully distributed,
    n_groups × top rows."""
    from raydedup.ops.ann import _emb_matrix

    def per_group(g: pa.Table) -> pa.Table:
        ids = g[id_column].to_numpy(zero_copy_only=False)
        mat = _emb_matrix(g, vec_column).astype(np.float64)
        order = np.argsort(ids, kind="stable")
        fd = FrequentDirections(ell, mat.shape[1]).append(mat[order])
        sv = fd.singular_values()[:top]
        gv = int(g[group_column][0].as_py())
        return pa.table(
            {
                group_column: pa.array([gv] * len(sv), pa.int64()),
                "rank": pa.array(np.arange(1, len(sv) + 1), pa.int64()),
                "sigma": pa.array(np.round(sv, 6), pa.float64()),
            }
        )

    return ds.groupby(group_column).map_groups(per_group, batch_format="pyarrow")


def fd_group_spectra_local(tbl: pa.Table, group_column: str = "label", ell: int = 8, top: int = 4, id_column: str = "vec_id", vec_column: str = "embedding") -> pa.Table:
    """Single-process twin of ``fd_group_spectra``."""
    from raydedup.ops.ann import _emb_matrix

    ids = tbl[id_column].to_numpy(zero_copy_only=False)
    mat = _emb_matrix(tbl, vec_column).astype(np.float64)
    groups = tbl[group_column].to_numpy(zero_copy_only=False)
    out_g, out_r, out_s = [], [], []
    for gv in np.unique(groups):
        m = groups == gv
        order = np.argsort(ids[m], kind="stable")
        sv = FrequentDirections(ell, mat.shape[1]).append(mat[m][order]).singular_values()[:top]
        out_g.extend([gv] * len(sv))
        out_r.extend(range(1, len(sv) + 1))
        out_s.extend(np.round(sv, 6).tolist())
    return pa.table(
        {
            group_column: pa.array([int(g) for g in out_g], pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "sigma": pa.array(out_s, pa.float64()),
        }
    )


def fd_spectrum_local(tbl: pa.Table, ell: int = 16, n_buckets: int = 8, id_column: str = "vec_id", vec_column: str = "embedding", top: int = 16) -> pa.Table:
    """Single-process twin: same bucketing, same in-bucket id order,
    same ascending-bucket fold."""
    from raydedup.ops.ann import _emb_matrix

    ids = tbl[id_column].to_numpy(zero_copy_only=False)
    mat = _emb_matrix(tbl, vec_column).astype(np.float64)
    buckets = _bucket_of(ids, n_buckets)
    sketches = {}
    for b in np.unique(buckets):
        m = buckets == b
        order = np.argsort(ids[m], kind="stable")
        sketches[int(b)] = FrequentDirections(ell, mat.shape[1]).append(mat[m][order])
    return spectrum_table(fd_reduce_ordered(sketches), top=top)
