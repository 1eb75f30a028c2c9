"""t-digest: mergeable quantile sketch over f64 streams.

Follows the reference's merging t-digest
(``/root/reference/datasketches/src/tdigest/sketch.rs``): K_2 scale
function ``w(q) ∝ q(1-q)/normalizer`` with
``normalizer = delta / (4 ln(n/delta) + 24)`` and ``delta = 2K``
(``tdigest/sketch.rs:1324-1340``), default K = 200, NaN/±inf ignored
(``tdigest/sketch.rs:171-183``), centroids as (mean, weight) pairs.

Compression is the *vectorized binning* formulation of the same scale
function: sorted points are assigned to clusters by the integral
``k(q) = normalizer * ln(q/(1-q))`` (whose unit steps reproduce the
K_2 cluster-size bound), then aggregated per cluster with one
``np.add.reduceat`` — no per-centroid Python loop, same accuracy
envelope as the reference's greedy merge. Merging digests = concat
centroid lists + one compression pass; associative and commutative up
to compression, the property the reference relies on for distributed
use (``tdigest/sketch.rs:231-255``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import codec

DEFAULT_K = 200  # tdigest/sketch.rs:39-43


def _k_scale(q: np.ndarray, normalizer: float) -> np.ndarray:
    q = np.clip(q, 1e-15, 1 - 1e-15)
    return normalizer * np.log(q / (1 - q))


def _compress(means: np.ndarray, weights: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """One compression pass: sort, bin by k(q), aggregate."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    n = float(weights.sum())
    delta = 2.0 * k
    z = 4.0 * np.log(max(n / delta, 1.0)) + 24.0
    normalizer = delta / z
    cum = np.cumsum(weights)
    q_mid = (cum - weights / 2) / n
    bins = np.floor(_k_scale(q_mid, normalizer)).astype(np.int64)
    # group consecutive equal bins
    new_group = np.ones(len(bins), dtype=bool)
    new_group[1:] = bins[1:] != bins[:-1]
    starts = np.nonzero(new_group)[0]
    w = np.add.reduceat(weights, starts)
    wm = np.add.reduceat(weights * means, starts)
    return wm / w, w


@dataclass
class TDigest:
    """Mergeable t-digest (always kept compressed between operations)."""

    k: int = DEFAULT_K
    means: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    weights: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    min: float = np.inf
    max: float = -np.inf

    @classmethod
    def from_values(cls, values: np.ndarray, k: int = DEFAULT_K) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]  # NaN/±inf ignored (tdigest/sketch.rs:171-183)
        if len(v) == 0:
            return cls(k)
        m, w = _compress(v, np.ones(len(v)), k)
        return cls(k, m, w, float(v.min()), float(v.max()))

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum())

    def is_empty(self) -> bool:
        return len(self.means) == 0

    def merge(self, *others: "TDigest") -> "TDigest":
        return tdigest_merge([self, *others])

    # -- queries (on the compressed centroid list) -------------------------

    def rank(self, value: float) -> float:
        """Estimated fraction of mass <= value (cdf point)."""
        if self.is_empty():
            return float("nan")
        if value < self.min:
            return 0.0
        if value >= self.max:
            return 1.0
        n = self.total_weight
        cum = np.cumsum(self.weights) - self.weights / 2
        return float(np.interp(value, self.means, cum / n, left=0.0, right=1.0))

    def quantile(self, q: float) -> float:
        if self.is_empty():
            return float("nan")
        q = min(max(q, 0.0), 1.0)
        n = self.total_weight
        cum = (np.cumsum(self.weights) - self.weights / 2) / n
        return float(np.interp(q, cum, self.means, left=self.min, right=self.max))

    def cdf(self, values) -> np.ndarray:
        return np.array([self.rank(v) for v in np.atleast_1d(values)])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in np.atleast_1d(qs)])

    # -- serde -------------------------------------------------------------

    def to_bytes(self) -> bytes:
        head = codec.pack_header(codec.FAMILY_TDIGEST, min(self.k, 255), 0, 1)
        meta = np.array([self.k, len(self.means)], dtype=np.int64)
        mm = np.array([self.min, self.max], dtype=np.float64)
        return head + meta.tobytes() + mm.tobytes() + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigest":
        codec.unpack_header(buf, codec.FAMILY_TDIGEST)
        o = codec.HEADER_SIZE
        k, n = np.frombuffer(buf, np.int64, 2, o)
        mn, mx = np.frombuffer(buf, np.float64, 2, o + 16)
        means = np.frombuffer(buf, np.float64, int(n), o + 32).copy()
        weights = np.frombuffer(buf, np.float64, int(n), o + 32 + 8 * int(n)).copy()
        return cls(int(k), means, weights, float(mn), float(mx))


def to_java_bytes(td: TDigest) -> bytes:
    """Serialize in the DataSketches TDIGEST (family 20) little-endian
    layout (``tdigest/sketch.rs:404-475``; constants
    ``serialization.rs:18-23``): empty and single-value images are one
    preamble long; multi-centroid images add centroid count, min/max
    and (f64 mean, u64 weight) pairs. A reference consumer's
    ``TDigestMut::deserialize`` reads these bytes directly."""
    import struct

    n = len(td.means)
    if n == 0:
        return struct.pack("<BBBHBH", 1, 1, 20, td.k, 1, 0)  # FLAGS_IS_EMPTY
    if n == 1 and td.weights[0] == 1:
        head = struct.pack("<BBBHBH", 1, 1, 20, td.k, 2, 0)  # FLAGS_IS_SINGLE_VALUE
        return head + struct.pack("<d", float(td.means[0]))
    head = struct.pack("<BBBHBH", 2, 1, 20, td.k, 0, 0)
    head += struct.pack("<II", n, 0)
    head += struct.pack("<dd", td.min, td.max)
    cent = np.empty(2 * n, dtype=np.uint64)
    cent[0::2] = np.asarray(td.means, np.float64).view(np.uint64)
    cent[1::2] = np.rint(td.weights).astype(np.uint64)
    return head + cent.tobytes()


def from_java_bytes(buf: bytes, is_f32: bool = False) -> TDigest:
    """Decode a DataSketches family-20 image
    (``tdigest/sketch.rs:497-600``; f32 variant supported); reference-
    implementation big-endian images (zero preamble) auto-detect and
    route to ``from_compat_bytes``."""
    import struct

    pre, ver, family = struct.unpack_from("<BBB", buf, 0)
    if family != 20:
        if pre == 0 and ver == 0 and family == 0:
            return from_compat_bytes(buf)
        raise ValueError(f"family mismatch: expected 20, got {family}")
    if ver != 1:
        raise ValueError(f"unsupported tdigest serial version {ver}")
    (k,) = struct.unpack_from("<H", buf, 3)
    if k < 10:
        raise ValueError(f"k must be at least 10, got {k}")
    flags = buf[5]
    is_empty, is_single = bool(flags & 1), bool(flags & 2)
    if is_empty:
        return TDigest(k)
    if is_single:
        if is_f32:
            (v,) = struct.unpack_from("<f", buf, 8)
        else:
            (v,) = struct.unpack_from("<d", buf, 8)
        return TDigest(k, np.array([v]), np.array([1.0]), v, v)
    n, _ = struct.unpack_from("<II", buf, 8)
    if is_f32:
        mn, mx = struct.unpack_from("<ff", buf, 16)
        arr = np.frombuffer(buf, dtype="<u4", count=2 * n, offset=24)
        means = arr[0::2].view("<f4").astype(np.float64)
        weights = arr[1::2].astype(np.float64)
    else:
        mn, mx = struct.unpack_from("<dd", buf, 16)
        arr = np.frombuffer(buf, dtype="<u8", count=2 * n, offset=32)
        means = arr[0::2].copy().view("<f8").astype(np.float64)
        weights = arr[1::2].astype(np.float64)
    return TDigest(int(k), means, weights, float(mn), float(mx))


def to_compat_bytes(td: TDigest) -> bytes:
    """Encode the reference-implementation big-endian COMPAT_DOUBLE
    (type 1, ``asBytes``) image (``tdigest/sketch.rs:627-676``) —
    round-trippable into tdunning/t-digest consumers and back through
    ``from_compat_bytes``."""
    import struct

    n = len(td.means)
    head = struct.pack(">I", 1)
    head += struct.pack(">ddd", td.min if n else float("inf"), td.max if n else float("-inf"), float(td.k))
    head += struct.pack(">I", n)
    arr = np.empty((n, 2), dtype=">f8")
    arr[:, 0] = td.weights
    arr[:, 1] = td.means
    return head + arr.tobytes()


def from_compat_bytes(buf: bytes) -> TDigest:
    """Decode the t-digest reference-implementation big-endian formats
    (``tdigest/sketch.rs:628-720``): COMPAT_DOUBLE (type 1, asBytes)
    and COMPAT_FLOAT (type 2, asSmallBytes). Cross-implementation
    conformance is asserted against the golden files the reference
    commits (``tests/test_data/tdigest_ref_k100_n10000_*.sk``).
    """
    import struct

    ty = struct.unpack_from(">I", buf, 0)[0]
    if ty == 1:  # COMPAT_DOUBLE
        mn, mx, kf = struct.unpack_from(">ddd", buf, 4)
        (n_cent,) = struct.unpack_from(">I", buf, 28)
        arr = np.frombuffer(buf, dtype=">f8", count=2 * n_cent, offset=32).reshape(n_cent, 2)
        weights = arr[:, 0].astype(np.float64)
        means = arr[:, 1].astype(np.float64)
    elif ty == 2:  # COMPAT_FLOAT
        mn, mx = struct.unpack_from(">dd", buf, 4)
        (kf,) = struct.unpack_from(">f", buf, 20)
        (n_cent,) = struct.unpack_from(">H", buf, 28)
        arr = np.frombuffer(buf, dtype=">f4", count=2 * n_cent, offset=30).reshape(n_cent, 2)
        weights = arr[:, 0].astype(np.float64)
        means = arr[:, 1].astype(np.float64)
    else:
        raise ValueError(f"unknown TDigest compat type {ty}")
    order = np.argsort(means, kind="stable")
    return TDigest(int(kf), means[order], weights[order], float(mn), float(mx))


def tdigest_merge(digests: list[TDigest]) -> TDigest:
    """Concat centroid lists + one compression pass (associative)."""
    live = [d for d in digests if not d.is_empty()]
    if not live:
        return TDigest(digests[0].k if digests else DEFAULT_K)
    k = min(d.k for d in live)
    means = np.concatenate([d.means for d in live])
    weights = np.concatenate([d.weights for d in live])
    m, w = _compress(means, weights, k)
    return TDigest(k, m, w, min(d.min for d in live), max(d.max for d in live))
