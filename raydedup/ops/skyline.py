"""Distributed 2-D skyline (Pareto frontier, maximize both axes).

A row is on the skyline iff no other row dominates it, where ``b``
dominates ``a`` iff ``b.x >= a.x and b.y >= a.y`` and at least one is
strict. Exact duplicates dominate neither way, so all copies survive —
matching the SQL ``NOT EXISTS`` formulation an oracle uses.

Scale design (100 TB lens):
- The skyline operator is the textbook local-prune / global-merge
  shape: every block reduces to its LOCAL skyline with one vectorized
  lexsort + prefix-max kernel (no pairwise O(n²) anywhere), and only
  those survivors — O(distinct-x) per block at worst, O(log n)
  expected on non-adversarial data — travel to a single merge task
  that runs the same kernel once more. Any global skyline member is a
  member of its block's local skyline, so the prune is lossless.
- The merge is a deliberate single-block step, NOT a shuffle: the
  small side is the pruned candidate set, never the input. If a
  pathological column pair makes local skylines large (e.g. x strictly
  descending with y ascending), the merge degrades gracefully — it is
  still one lexsort over the candidates — but the operator's
  partitioning assumption (pruned candidates fit one task) should be
  revisited for such inputs (an intermediate fan-in level is the
  standard fix and composes from the same kernel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def skyline_mask(xv: np.ndarray, yv: np.ndarray) -> np.ndarray:
    """Boolean mask of Pareto-maximal points (maximize both), exact
    under ties: keep iff y equals the max y of its x-group AND y is
    strictly above the best y among all strictly-larger x."""
    n = len(xv)
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((-yv, -xv))  # x desc, then y desc within x
    xs, ys = xv[order], yv[order]
    new_x = np.empty(n, bool)
    new_x[0] = True
    new_x[1:] = xs[1:] != xs[:-1]
    grp = np.cumsum(new_x) - 1
    gmax = ys[new_x]  # first y per x-group is that group's max
    prev = np.empty(len(gmax), ys.dtype)
    if np.issubdtype(ys.dtype, np.floating):
        prev[0] = -np.inf
    else:
        prev[0] = np.iinfo(ys.dtype).min
    if len(gmax) > 1:
        np.maximum.accumulate(gmax[:-1], out=prev[1:])
    keep_sorted = (ys == gmax[grp]) & ((grp == 0) | (ys > prev[grp]))
    mask = np.zeros(n, bool)
    mask[order] = keep_sorted
    return mask


def skyline2d(ds, x_col: str, y_col: str):
    """Dataset → Dataset of the rows on the (maximize x, maximize y)
    Pareto frontier, all input columns preserved."""

    def local(batch: pa.Table) -> pa.Table:
        m = skyline_mask(
            batch[x_col].to_numpy(zero_copy_only=False),
            batch[y_col].to_numpy(zero_copy_only=False),
        )
        return batch.filter(pa.array(m))

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local, batch_format="pyarrow")
    )
