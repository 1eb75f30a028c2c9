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
        r = float(np.interp(value, self.means, cum / n, left=0.0, right=1.0))
        # np.interp's slope overflows to inf when adjacent means differ
        # by a subnormal (0.5 / 2e-313 > f64 max); the true rank is
        # always within [0, 1], so clamp (NaN only from inf*0 — treat
        # as the midpoint of the overflowed interval's cum range, which
        # the clamp bounds render as 1.0-side; fall back to 0.5).
        if r != r:
            return 0.5
        return min(1.0, max(0.0, r))

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


def _fma(a: float, b: float, c: float) -> float:
    """Correctly-rounded fused multiply-add a*b+c (one rounding), the
    semantics of Rust's ``f64::mul_add`` used by ``Centroid::add``
    (``tdigest/sketch.rs:1274``). Exact rational arithmetic + one final
    float() rounding; slow but only runs once per merged centroid in
    the sequential parity path."""
    from fractions import Fraction

    return float(Fraction(a) * Fraction(b) + Fraction(c))


class TDigestMut:
    """Construction-faithful sequential t-digest — a transcription of
    the reference's ``TDigestMut`` (``tdigest/sketch.rs``): buffered
    updates (buffer = 4x centroid capacity, capacity = 2k + fudge,
    ``sketch.rs:41,141-145``), the greedy one-pass merge with
    alternating direction (``do_merge``, ``sketch.rs:744-795``), and
    the reference's rank/quantile interpolation (``sketch.rs:1039-1210``).

    This is the parity mode: same centroids as the reference for the
    same update/merge sequence (FMA-exact centroid means). The engine's
    distributed default stays :class:`TDigest` (vectorized binning,
    same accuracy envelope) — the reference itself only guarantees
    byte-stable construction on the sequential path."""

    __slots__ = ("k", "reverse_merge", "min", "max", "_means", "_weights",
                 "centroids_weight", "centroids_capacity", "buffer")

    def __init__(self, k: int = DEFAULT_K):
        if k < 10:
            raise ValueError("k must be at least 10")
        self.k = int(k)
        self.reverse_merge = False
        self.min = float("inf")
        self.max = float("-inf")
        self._means: list[float] = []
        self._weights: list[int] = []  # u64 semantics: exact int weights
        self.centroids_weight = 0
        fudge = 30 if k < 30 else 10
        self.centroids_capacity = 2 * self.k + fudge
        self.buffer: list[float] = []

    # -- updates -----------------------------------------------------------

    def update(self, value: float) -> "TDigestMut":
        if value != value or value in (float("inf"), float("-inf")):
            return self
        if len(self.buffer) == self.centroids_capacity * 4:
            self.compress()
        self.buffer.append(value)
        if value < self.min:
            self.min = value
        if value > self.max:
            self.max = value
        return self

    def update_values(self, values) -> "TDigestMut":
        """Bulk update, identical to calling ``update`` per value (the
        compress trigger fires at the same stream positions)."""
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        cap = self.centroids_capacity * 4
        i = 0
        while i < len(v):
            if len(self.buffer) == cap:
                self.compress()
            take = min(cap - len(self.buffer), len(v) - i)
            chunk = v[i:i + take]
            self.buffer.extend(chunk.tolist())
            cmn, cmx = float(chunk.min()), float(chunk.max())
            if cmn < self.min:
                self.min = cmn
            if cmx > self.max:
                self.max = cmx
            i += take
        return self

    def total_weight(self) -> int:
        return self.centroids_weight + len(self.buffer)

    def is_empty(self) -> bool:
        return not self._means and not self.buffer

    def merge(self, other: "TDigestMut") -> "TDigestMut":
        """Reference merge (``sketch.rs:231-255``): both buffers as
        weight-1 centroids + other's centroids, one greedy pass."""
        if other.is_empty():
            return self
        tmp_m = list(self.buffer) + list(other.buffer) + list(other._means)
        tmp_w = [1] * (len(self.buffer) + len(other.buffer)) + list(other._weights)
        self._do_merge(tmp_m, tmp_w, len(self.buffer) + other.total_weight())
        return self

    def compress(self) -> None:
        if not self.buffer:
            return
        n = len(self.buffer)
        self._do_merge(list(self.buffer), [1] * n, n)

    def _do_merge(self, tmp_means: list[float], tmp_weights: list[int], weight: int) -> None:
        """The greedy one-pass merge (``tdigest/sketch.rs:744-795``):
        stable sort by mean (incoming first, own centroids appended —
        ties keep that order), optional reversal, then a single scan
        that folds a centroid into its predecessor iff the combined
        weight fits under the K_2 bound at both edge quantiles; first
        and last items always start new centroids (tail exactness)."""
        import math

        tmp_means = tmp_means + self._means
        tmp_weights = tmp_weights + self._weights
        order = sorted(range(len(tmp_means)), key=lambda i: tmp_means[i])
        means = [tmp_means[i] for i in order]
        weights = [tmp_weights[i] for i in order]
        if self.reverse_merge:
            means.reverse()
            weights.reverse()
        self.centroids_weight += weight

        cw = float(self.centroids_weight)
        compression = float(2 * self.k)
        normalizer = compression / (4.0 * math.log(cw / compression) + 24.0)
        out_m = [means[0]]
        out_w = [weights[0]]
        n = len(means)
        weight_so_far = 0.0
        for current in range(1, n):
            c_m, c_w = means[current], weights[current]
            proposed = float(out_w[-1] + c_w)
            add_this = False
            if current != 1 and current != n - 1:
                q0 = weight_so_far / cw
                q2 = (weight_so_far + proposed) / cw
                bound = cw * min(q0 * (1.0 - q0) / normalizer, q2 * (1.0 - q2) / normalizer)
                add_this = proposed <= bound
            if add_this:
                sw, ow = float(out_w[-1]), float(c_w)
                out_w[-1] += c_w
                ratio_other = ow / (sw + ow)
                delta = c_m - out_m[-1]
                if math.isfinite(delta):
                    out_m[-1] = _fma(delta, ratio_other, out_m[-1])
                else:
                    out_m[-1] = out_m[-1] * (sw / (sw + ow)) + c_m * ratio_other
            else:
                weight_so_far += float(out_w[-1])
                out_m.append(c_m)
                out_w.append(c_w)
        if self.reverse_merge:
            out_m.reverse()
            out_w.reverse()
        self._means, self._weights = out_m, out_w
        self.min = min(self.min, out_m[0])
        self.max = max(self.max, out_m[-1])
        self.reverse_merge = not self.reverse_merge
        self.buffer.clear()

    # -- queries (reference interpolation, sketch.rs:1039-1210) ------------

    def rank(self, value: float) -> float | None:
        if value != value:
            raise ValueError("value must not be NaN")
        self.compress()
        if not self._means:
            return None
        if value < self.min:
            return 0.0
        if value > self.max:
            return 1.0
        m, w = self._means, self._weights
        n = len(m)
        if n == 1:
            return 0.5
        cw = float(self.centroids_weight)
        if value < m[0]:
            if m[0] - self.min > 0:
                if value == self.min:
                    return 0.5 / cw
                return 1.0 + ((value - self.min) / (m[0] - self.min)) * (w[0] / 2.0 - 1.0)
            return 0.0
        if value > m[-1]:
            if self.max - m[-1] > 0:
                if value == self.max:
                    return 1.0 - 0.5 / cw
                return 1.0 - (1.0 + ((self.max - value) / (self.max - m[-1])) * (w[-1] / 2.0 - 1.0)) / cw
            return 1.0
        from bisect import bisect_left, bisect_right

        lower = bisect_left(m, value)
        if value < m[lower]:
            lower -= 1
        upper = bisect_right(m, value)
        if upper == n or m[upper - 1] >= value:
            upper -= 1
        weight_below = sum(w[:lower]) + w[lower] / 2.0
        weight_delta = sum(w[lower:upper]) - w[lower] / 2.0 + w[upper] / 2.0
        if m[upper] - m[lower] > 0:
            return (weight_below + weight_delta * (value - m[lower]) / (m[upper] - m[lower])) / cw
        return (weight_below + weight_delta / 2.0) / cw

    def quantile(self, rank: float) -> float | None:
        if not 0.0 <= rank <= 1.0:
            raise ValueError("rank must be in [0.0, 1.0]")
        self.compress()
        if not self._means:
            return None
        m, w = self._means, self._weights
        n = len(m)
        if n == 1:
            return m[0]
        cw = float(self.centroids_weight)
        weight = rank * cw
        if weight < 1.0:
            return self.min
        if weight > cw - 1.0:
            return self.max
        first_w = float(w[0])
        if first_w > 1.0 and weight < first_w / 2.0:
            return self.min + ((weight - 1.0) / (first_w / 2.0 - 1.0)) * (m[0] - self.min)
        last_w = float(w[-1])
        if last_w > 1.0 and cw - weight <= last_w / 2.0:
            return self.max + ((cw - weight - 1.0) / (last_w / 2.0 - 1.0)) * (self.max - m[-1])
        weight_so_far = first_w / 2.0
        for i in range(n - 1):
            dw = (w[i] + w[i + 1]) / 2.0
            if weight_so_far + dw > weight:
                left_weight = 0.0
                if w[i] == 1:
                    if weight - weight_so_far < 0.5:
                        return m[i]
                    left_weight = 0.5
                right_weight = 0.0
                if w[i + 1] == 1:
                    if weight_so_far + dw - weight <= 0.5:
                        return m[i + 1]
                    right_weight = 0.5
                w1 = weight - weight_so_far - left_weight
                w2 = weight_so_far + dw - weight - right_weight
                return (m[i] * w1 + m[i + 1] * w2) / (w1 + w2)
            weight_so_far += dw
        w1 = weight - cw - w[-1] / 2.0
        w2 = w[-1] / 2.0 - w1
        return (m[-1] * w1 + self.max * w2) / (w1 + w2)

    # -- serde (family-20 image incl. reverse-merge flag) ------------------

    def serialize(self) -> bytes:
        """Reference ``TDigestMut::serialize`` (``sketch.rs:404-475``):
        compress, then the family-20 LE image with the REVERSE_MERGE
        flag preserved so an unfreeze continues the exact alternating
        merge sequence."""
        import struct

        self.compress()
        tw = self.total_weight()
        if tw == 0:
            return struct.pack("<BBBHBH", 1, 1, 20, self.k, 1, 0)
        if tw == 1:
            flags = 2 | (4 if self.reverse_merge else 0)
            return struct.pack("<BBBHBH", 1, 1, 20, self.k, flags, 0) + struct.pack("<d", self.min)
        flags = 4 if self.reverse_merge else 0
        out = struct.pack("<BBBHBH", 2, 1, 20, self.k, flags, 0)
        out += struct.pack("<II", len(self._means), 0)
        out += struct.pack("<dd", self.min, self.max)
        cent = np.empty(2 * len(self._means), dtype=np.uint64)
        cent[0::2] = np.asarray(self._means, np.float64).view(np.uint64)
        cent[1::2] = np.asarray(self._weights, np.uint64)
        return out + cent.tobytes()

    @classmethod
    def deserialize(cls, buf: bytes) -> "TDigestMut":
        import struct

        pre, ver, family = struct.unpack_from("<BBB", buf, 0)
        if family != 20:
            raise ValueError(f"family mismatch: expected 20, got {family}")
        (k,) = struct.unpack_from("<H", buf, 3)
        flags = buf[5]
        td = cls(k)
        td.reverse_merge = bool(flags & 4)
        if flags & 1:
            return td
        if flags & 2:
            (v,) = struct.unpack_from("<d", buf, 8)
            td._means, td._weights = [v], [1]
            td.centroids_weight = 1
            td.min = td.max = v
            return td
        n, _ = struct.unpack_from("<II", buf, 8)
        td.min, td.max = struct.unpack_from("<dd", buf, 16)
        arr = np.frombuffer(buf, dtype="<u8", count=2 * n, offset=32)
        td._means = arr[0::2].copy().view("<f8").tolist()
        td._weights = [int(x) for x in arr[1::2]]
        td.centroids_weight = sum(td._weights)
        return td

    def freeze(self) -> TDigest:
        """Convert to the engine's vectorized :class:`TDigest` (compressed
        centroid list is shared verbatim)."""
        self.compress()
        return TDigest(
            self.k,
            np.asarray(self._means, np.float64),
            np.asarray(self._weights, np.float64),
            self.min if self._means else float("inf"),
            self.max if self._means else float("-inf"),
        )


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
