"""Suffix array (prefix-doubling, vectorized) + substring queries.

The per-partition exact-substring confirmation structure from the
north_star: when one wrapper document hosts many candidate substrings
(the boilerplate case), building its suffix array once turns each
confirmation into an O(|pattern| log n) binary search instead of an
O(n) scan per probe.

Construction is the classic O(n log^2 n) prefix-doubling algorithm in
NumPy (argsort on (rank, rank-at-offset) pairs per doubling round) —
no per-character Python.
"""

from __future__ import annotations

import numpy as np


def build_suffix_array(data: bytes) -> np.ndarray:
    """Sorted suffix start positions of ``data``."""
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        # secondary key: rank of suffix i+k (or -1 past the end)
        rank2 = np.full(n, -1, dtype=np.int64)
        rank2[: n - k] = rank[k:]
        order = np.lexsort((rank2, rank))
        # recompute ranks: same (rank, rank2) pair → same new rank
        key1 = rank[order]
        key2 = rank2[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (key1[1:] != key1[:-1]) | (key2[1:] != key2[:-1])
        tmp[order] = np.cumsum(new) - 1
        rank, tmp = tmp.copy(), rank
        sa = order
        if rank[sa[-1]] == n - 1:  # all ranks distinct → fully sorted
            break
        k *= 2
    return sa.astype(np.int64)


class SuffixIndex:
    """Substring queries against one document via its suffix array."""

    def __init__(self, data: bytes):
        self.data = data
        self.sa = build_suffix_array(data)

    def _cmp_at(self, pos: int, pattern: bytes) -> int:
        """-1/0/+1 comparison of suffix at pos vs pattern (prefix match = 0)."""
        chunk = self.data[pos : pos + len(pattern)]
        if chunk == pattern:
            return 0
        return -1 if chunk < pattern else 1

    def contains(self, pattern: bytes) -> bool:
        if len(pattern) == 0:
            return True
        lo, hi = 0, len(self.sa)
        while lo < hi:
            mid = (lo + hi) // 2
            c = self._cmp_at(int(self.sa[mid]), pattern)
            if c == 0:
                return True
            if c < 0:
                lo = mid + 1
            else:
                hi = mid
        return False

    def count(self, pattern: bytes) -> int:
        """Number of occurrences (size of the SA range with the prefix)."""
        if len(pattern) == 0:
            return len(self.data)
        data, sa = self.data, self.sa

        def lower(strict_after: bool) -> int:
            lo, hi = 0, len(sa)
            while lo < hi:
                mid = (lo + hi) // 2
                chunk = data[int(sa[mid]) : int(sa[mid]) + len(pattern)]
                go_right = chunk < pattern or (strict_after and chunk == pattern)
                if go_right:
                    lo = mid + 1
                else:
                    hi = mid
            return lo

        return lower(True) - lower(False)


def confirm_substring_batch(wrapper: bytes, patterns: list[bytes]) -> list[bool]:
    """Many patterns against one wrapper: SA pays off after a few probes."""
    if len(patterns) <= 2:
        return [p in wrapper for p in patterns]
    idx = SuffixIndex(wrapper)
    return [idx.contains(p) for p in patterns]
