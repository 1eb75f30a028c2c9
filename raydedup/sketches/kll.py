"""KLL quantile sketch (Karnin-Lang-Liberty) over f64 streams.

The north_star names KLL for the pipeline's signature-distance
distributions (BASELINE.json: "sketch merge (theta union, KLL
quantiles for signature-distance distributions) ... partition-parallel
reduce"). The reference library ships t-digest as its quantile sketch
(also implemented, ``tdigest.py``); KLL is provided alongside it with
the same partial/merge/finalize surface, following the published KLL
algorithm (Karnin, Lang, Liberty, FOCS 2016; also "KLL±" VLDB 2021 in
PAPERS.md):

- level h holds items of weight 2^h; level capacities shrink
  geometrically ``c_h = ceil(k * (2/3)^(depth-1-h))`` (min 8);
- when total size exceeds total capacity, the lowest over-full level
  is sorted and every other item (deterministic alternating offset) is
  promoted to level h+1 — the classic compaction;
- rank/quantile queries scan the weighted items;
- merge = concatenate levels pairwise + compact to capacity, giving
  the associative/commutative-up-to-compaction behavior the engine's
  tree reduces need.

Determinism: the compaction offset alternates from a counter rather
than RNG, so identical inputs give identical sketches (retry-safe
per SURVEY.md §4.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import codec

DEFAULT_K = 200


def _capacity(k: int, depth: int, h: int) -> int:
    return max(8, int(np.ceil(k * (2.0 / 3.0) ** (depth - 1 - h))))


@dataclass
class KllSketch:
    k: int = DEFAULT_K
    levels: list = field(default_factory=list)  # list[np.ndarray], level h weight 2^h
    n: int = 0
    min: float = np.inf
    max: float = -np.inf
    _compactions: int = 0

    def update_values(self, values: np.ndarray) -> "KllSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if len(v) == 0:
            return self
        self.n += len(v)
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        if not self.levels:
            self.levels.append(np.empty(0, np.float64))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def _total_capacity(self) -> int:
        d = len(self.levels)
        return sum(_capacity(self.k, d, h) for h in range(d))

    def _compress(self) -> None:
        while sum(len(l) for l in self.levels) > self._total_capacity():
            d = len(self.levels)
            for h in range(d):
                if len(self.levels[h]) > _capacity(self.k, d, h):
                    lvl = np.sort(self.levels[h])
                    off = self._compactions & 1
                    self._compactions += 1
                    promoted = lvl[off::2]
                    self.levels[h] = np.empty(0, np.float64)
                    if h + 1 == len(self.levels):
                        self.levels.append(np.empty(0, np.float64))
                    self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
                    break
            else:
                break

    # -- queries -----------------------------------------------------------

    def _items_weights(self):
        items = np.concatenate([l for l in self.levels]) if self.levels else np.empty(0)
        weights = (
            np.concatenate(
                [np.full(len(l), float(1 << h)) for h, l in enumerate(self.levels)]
            )
            if self.levels
            else np.empty(0)
        )
        return items, weights

    def rank(self, value: float) -> float:
        items, weights = self._items_weights()
        if len(items) == 0:
            return float("nan")
        total = weights.sum()
        return float(weights[items <= value].sum() / total)

    def quantile(self, q: float) -> float:
        items, weights = self._items_weights()
        if len(items) == 0:
            return float("nan")
        order = np.argsort(items, kind="stable")
        items, weights = items[order], weights[order]
        cum = np.cumsum(weights)
        target = min(max(q, 0.0), 1.0) * cum[-1]
        idx = int(np.searchsorted(cum, target))
        idx = min(idx, len(items) - 1)
        if q <= 0.0:
            return self.min
        if q >= 1.0:
            return self.max
        return float(items[idx])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in np.atleast_1d(qs)])

    # -- merge / serde -----------------------------------------------------

    def merge(self, other: "KllSketch") -> "KllSketch":
        out = KllSketch(min(self.k, other.k))
        out.n = self.n + other.n
        out.min = min(self.min, other.min)
        out.max = max(self.max, other.max)
        depth = max(len(self.levels), len(other.levels))
        for h in range(depth):
            a = self.levels[h] if h < len(self.levels) else np.empty(0)
            b = other.levels[h] if h < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]))
        out._compress()
        return out

    def to_bytes(self) -> bytes:
        head = codec.pack_header(codec.FAMILY_TDIGEST, 0, codec.FLAG_MERGED, 2)
        meta = np.array([self.k, self.n, len(self.levels), self._compactions], dtype=np.int64)
        mm = np.array([self.min, self.max], dtype=np.float64)
        sizes = np.array([len(l) for l in self.levels], dtype=np.int64)
        body = b"".join(np.ascontiguousarray(l).tobytes() for l in self.levels)
        return head + meta.tobytes() + mm.tobytes() + sizes.tobytes() + body

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KllSketch":
        codec.unpack_header(buf, codec.FAMILY_TDIGEST)
        o = codec.HEADER_SIZE
        k, n, d, comp = np.frombuffer(buf, np.int64, 4, o)
        mn, mx = np.frombuffer(buf, np.float64, 2, o + 32)
        sizes = np.frombuffer(buf, np.int64, int(d), o + 48)
        levels = []
        pos = o + 48 + 8 * int(d)
        for s in sizes:
            levels.append(np.frombuffer(buf, np.float64, int(s), pos).copy())
            pos += 8 * int(s)
        sk = cls(int(k), levels, int(n), float(mn), float(mx))
        sk._compactions = int(comp)
        return sk


def kll_of(ds, column: str, k: int = DEFAULT_K) -> KllSketch:
    """Whole-dataset KLL via per-block partials + driver fold."""
    import pyarrow as pa

    from raydedup.sketches.aggregates import _reduce_sketches

    def partial(col):
        return KllSketch(k).update_values(col.to_numpy(zero_copy_only=False)).to_bytes()

    blob = _reduce_sketches(
        ds, column, partial,
        lambda a, b: KllSketch.from_bytes(a).merge(KllSketch.from_bytes(b)).to_bytes(),
    )
    return KllSketch.from_bytes(blob) if blob else KllSketch(k)


def _kll_kernels(k: int):
    build = lambda v: KllSketch(k).update_values(v).to_bytes()
    merge = lambda a, b: KllSketch.from_bytes(a).merge(KllSketch.from_bytes(b)).to_bytes()
    return build, merge


def kll_of_det(ds, column: str, k: int = DEFAULT_K, n_buckets: int = 64) -> KllSketch:
    """Blocking-independent KLL: value-hash buckets, per-bucket build
    over sorted values, ordered merge — a pure function of the column
    multiset (see ``aggregates.sketch_by_buckets``)."""
    from raydedup.sketches.aggregates import sketch_by_buckets

    build, merge = _kll_kernels(k)
    blob = sketch_by_buckets(ds, column, n_buckets, build, merge)
    return KllSketch.from_bytes(blob) if blob else KllSketch(k)


def kll_column_det(col, k: int = DEFAULT_K, n_buckets: int = 64) -> KllSketch:
    """In-process twin of ``kll_of_det`` (sidecar oracles / tests)."""
    from raydedup.sketches.aggregates import sketch_column_by_buckets

    build, merge = _kll_kernels(k)
    blob = sketch_column_by_buckets(col, n_buckets, build, merge)
    return KllSketch.from_bytes(blob) if blob else KllSketch(k)


def signature_distance_digest(verified, k: int = DEFAULT_K) -> KllSketch:
    """KLL over candidate-pair signature distances (1 - agreement) —
    the north_star's pipeline telemetry: a mergeable per-partition
    summary of how similar the candidate population is."""
    import pyarrow as pa

    def add_dist(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"dist": pc.subtract(1.0, batch["jaccard_sig_est"])})

    return kll_of(verified.map_batches(add_dist, batch_format="pyarrow"), "dist", k)
