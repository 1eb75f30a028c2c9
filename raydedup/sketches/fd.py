"""Frequent Directions: a mergeable low-rank sketch of a tall matrix.

The matrix analog of Misra-Gries (Liberty, KDD 2013; Ghashami &
Phillips, SODA 2014 for the merge proof): an n×d row stream compresses
to an ℓ×d sketch B with the deterministic covariance guarantee

    0 ≤ xᵀ(AᵀA − BᵀB)x ≤ ‖A‖_F² / ℓ      for every unit vector x.

At 100-TB scale this is the embedding-analytics workhorse: corpus
covariance / top principal directions / spectral drift between
snapshots, all from sketches that are ℓ·d floats per shard regardless
of corpus size, merged associatively. (The reference crate has no
matrix sketch; this extends the engine's sketch family the same way
theta/HLL/CPC cover distinct counting — SURVEY §2 extension surface.)

Determinism contract (what makes an oracle-exact distributed run
possible): FD is ORDER-dependent, so the distributed op fixes a
canonical order — rows hash-bucket by id, each bucket processes its
rows in ascending id order, and bucket sketches fold in ascending
bucket order. Any blocking of the input then yields the bit-identical
sketch, and a single-process twin replays the same walk.
"""

from __future__ import annotations

import numpy as np

__all__ = ["FrequentDirections", "fd_reduce_ordered"]


class FrequentDirections:
    """Fast-FD with a 2ℓ-row buffer: O(d·ℓ) space, amortized O(d·ℓ)
    per row. ``sketch`` is the current ℓ×d array (zero-padded rows
    while fewer than ℓ distinct directions have been absorbed)."""

    def __init__(self, ell: int, d: int):
        if ell < 2 or ell > d * 4:
            raise ValueError(f"ell must be in [2, 4d], got {ell}")
        self.ell = int(ell)
        self.d = int(d)
        self._buf = np.zeros((2 * self.ell, d), dtype=np.float64)
        self._n_buf = 0  # filled rows in _buf (sketch rows live here too)
        self.n_rows = 0  # total rows absorbed
        self.squared_frob = 0.0  # running ||A||_F^2 (exact, for the bound)

    # -- updates -----------------------------------------------------------

    def append(self, rows: np.ndarray) -> "FrequentDirections":
        """Absorb a block of rows IN THE GIVEN ORDER (caller owns the
        canonical ordering — see module docstring)."""
        rows = np.atleast_2d(np.asarray(rows, dtype=np.float64))
        if rows.shape[1] != self.d:
            raise ValueError(f"row dim {rows.shape[1]} != sketch dim {self.d}")
        self.n_rows += len(rows)
        self.squared_frob += float(np.einsum("ij,ij->", rows, rows))
        i = 0
        while i < len(rows):
            take = min(2 * self.ell - self._n_buf, len(rows) - i)
            self._buf[self._n_buf : self._n_buf + take] = rows[i : i + take]
            self._n_buf += take
            i += take
            if self._n_buf == 2 * self.ell:
                self._shrink()
        return self

    def _shrink(self):
        """SVD the buffer, subtract sigma_ell² from the spectrum, keep
        the top ℓ directions (the Misra-Gries decrement step)."""
        _, s, vt = np.linalg.svd(self._buf[: self._n_buf], full_matrices=False)
        k = min(self.ell, len(s))
        delta = s[self.ell - 1] ** 2 if len(s) >= self.ell else 0.0
        s2 = np.sqrt(np.maximum(s[:k] ** 2 - delta, 0.0))
        self._buf[:] = 0.0
        self._buf[:k] = s2[:, None] * vt[:k]
        self._n_buf = k

    # -- queries -----------------------------------------------------------

    @property
    def sketch(self) -> np.ndarray:
        """Current ℓ×d sketch (deterministic given the input order)."""
        if self._n_buf > self.ell:
            self._shrink()
        out = np.zeros((self.ell, self.d), dtype=np.float64)
        out[: self._n_buf] = self._buf[: self._n_buf]
        return out

    def singular_values(self) -> np.ndarray:
        """Descending singular values of the sketch (ℓ of them)."""
        sv = np.linalg.svd(self.sketch, compute_uv=False)
        return np.sort(sv)[::-1]

    def cov_error_bound(self) -> float:
        """The deterministic guarantee: ||AᵀA − BᵀB||₂ ≤ ‖A‖_F²/ℓ."""
        return self.squared_frob / self.ell

    # -- merge -------------------------------------------------------------

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        """Fold ``other`` into self (Ghashami-Phillips: stacking two FD
        sketches and shrinking preserves the guarantee with summed
        Frobenius mass). NOT commutative at the bit level — callers
        needing determinism must fold in a canonical order
        (``fd_reduce_ordered``)."""
        if other.d != self.d or other.ell != self.ell:
            raise ValueError("merge requires identical (ell, d)")
        buffered = other._buf[: other._n_buf]
        self.n_rows += other.n_rows
        # append() would double-count squared_frob: add the true mass
        self.squared_frob += other.squared_frob
        i = 0
        while i < len(buffered):
            take = min(2 * self.ell - self._n_buf, len(buffered) - i)
            self._buf[self._n_buf : self._n_buf + take] = buffered[i : i + take]
            self._n_buf += take
            i += take
            if self._n_buf == 2 * self.ell:
                self._shrink()
        return self

    # -- serde (engine-internal) --------------------------------------------

    def to_bytes(self) -> bytes:
        head = np.array(
            [self.ell, self.d, self._n_buf, self.n_rows], dtype=np.int64
        ).tobytes()
        return (
            head
            + np.float64(self.squared_frob).tobytes()
            + np.ascontiguousarray(self._buf[: self._n_buf]).tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "FrequentDirections":
        ell, d, n_buf, n_rows = np.frombuffer(buf, dtype=np.int64, count=4)
        sk = cls(int(ell), int(d))
        sk.squared_frob = float(np.frombuffer(buf, dtype=np.float64, count=1, offset=32)[0])
        sk.n_rows = int(n_rows)
        sk._n_buf = int(n_buf)
        rows = np.frombuffer(buf, dtype=np.float64, offset=40).reshape(int(n_buf), int(d))
        sk._buf[: sk._n_buf] = rows
        return sk


def fd_reduce_ordered(sketches: dict[int, FrequentDirections]) -> FrequentDirections:
    """Fold bucket sketches in ascending bucket order — the canonical
    merge order of the distributed op (determinism contract)."""
    keys = sorted(sketches)
    if not keys:
        raise ValueError("fd_reduce_ordered needs at least one sketch")
    acc = sketches[keys[0]]
    for k in keys[1:]:
        acc = acc.merge(sketches[k])
    return acc
