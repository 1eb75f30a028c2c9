"""Stream-shaped operators over an ordered event log.

Ray Data is a batch engine with no watermarks (ray_guide.md); windowed
semantics are expressed as deterministic batch transforms over the
(key, ts)-partitioned log:

- **tumbling windows**: a derived ``window_start`` column + plain
  groupby-aggregate — embarrassingly parallel, no ordering assumption.
- **session windows** (gap-based): ``groupby(key).map_groups`` with a
  vectorized sort + gap-cumsum per key group — the ordering assumption
  (events of one key fit one group, sorted in-kernel) is the
  documented partitioning contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum


def tumbling_window_aggregate(events, key: str, ts: str, value: str, width_s: int):
    """(key, window_start) count + sum over fixed-width windows."""

    def add_window(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch[ts], pa.int64())  # us since epoch
        w = pc.multiply(pc.divide(epoch, width_s * 1_000_000), width_s * 1_000_000)
        return batch.append_column("window_start", pc.cast(w, pa.timestamp("us")))

    return (
        events.map_batches(add_window, batch_format="pyarrow")
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum(value, alias_name="total_value"))
    )


def session_windows(events, key: str, ts: str, gap_s: int):
    """Per-key gap-based sessions: (key, session_start, session_end,
    n_events). A new session begins when the gap to the previous event
    of the same key exceeds ``gap_s``."""

    gap_us = gap_s * 1_000_000

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="stable")
        t = g[ts].astype("int64").to_numpy()
        new = np.ones(len(t), dtype=bool)
        new[1:] = (t[1:] - t[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        n_sessions = int(sid[-1]) + 1
        counts = np.bincount(sid)
        # t is sorted, so first/last element per session = min/max
        boundaries = np.nonzero(new)[0]
        starts = t[boundaries]
        ends = t[np.concatenate([boundaries[1:] - 1, [len(t) - 1]])]
        return pd.DataFrame(
            {
                key: np.repeat(g[key].iloc[0], len(counts)),
                "session_start": pd.to_datetime(starts, unit="us"),
                "session_end": pd.to_datetime(ends, unit="us"),
                "n_events": counts,
            }
        )

    return events.groupby(key).map_groups(sessionize, batch_format="pandas")
