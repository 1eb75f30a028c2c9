"""Single-process reference run of the dedup pipeline kernels.

Runs the SAME pure kernels the distributed pipeline runs — the
signature stage (``lsh.SignatureStage``), band explode with the same
coarse bucketing (``lsh.explode_bands``), per-bucket pair emission
(``lsh.emit_pairs_bucket``), payload packing and the vectorized verify
metrics kernel (``verify._pack_payload`` / ``_metrics_from_payloads``)
— over one in-process pyarrow table, with no Ray session. Two uses:

- **sidecar oracles**: the driver's correctness gate compares the
  distributed pipeline's output against this in-process ground truth,
  which checks the Ray-side plumbing (blocking, shuffles, actor
  batching, dedup) rather than re-trusting it;
- **debugging**: a deterministic, single-stack replay of a pipeline
  stage without cluster noise.

Exactness contract: the distributed pipeline's verified-pair output
EQUALS this reference's whenever hot-band salting did not trigger —
the sampled Misra-Gries hot-key pre-pass is blocking-dependent by
construction (``lsh.detect_hot_band_keys`` samples every Nth band row
per block), so ``verified_metrics`` refuses (returns ``None``) when
its own exact full-stream count finds any band key within 2x of the
hot threshold. Below that, no blocking can flag a key hot, both plans
emit identical candidate sets, and the per-pair metrics are pure
functions of the two documents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.config import DedupConfig
from raydedup.pipeline.lsh import SignatureStage, emit_pairs_bucket, explode_bands
from raydedup.pipeline.verify import _metrics_from_payloads, _pack_payload
from raydedup.sketches.hashing import fmix64

U64 = np.uint64


def _max_band_key_count(sigs: pa.Table, cfg: DedupConfig) -> int:
    """Exact max multiplicity over (band, band_hash) keys — the
    full-stream version of what the sampled hot-key pre-pass bounds."""
    import pyarrow.compute as pc

    nonempty = sigs.filter(pc.greater(sigs["n_shingles"], 0))
    n = len(nonempty)
    if n == 0:
        return 0
    bh = np.asarray(
        nonempty["band_hash"].combine_chunks().flatten().to_numpy(zero_copy_only=False),
        dtype=U64,
    ).reshape(n, cfg.bands)
    band_ids = np.tile(np.arange(cfg.bands, dtype=np.int64), n)
    keys = fmix64(bh.reshape(-1) ^ fmix64(band_ids.astype(U64)))
    _, counts = np.unique(keys, return_counts=True)
    return int(counts.max())


def verified_metrics(
    pages: pa.Table, cfg: DedupConfig | None = None, n_buckets: int = 32
) -> pd.DataFrame | None:
    """In-process verified-pair metrics for a (url, text) table, or
    ``None`` when hot-band salting could have triggered distributed
    (in which case the candidate sets need not match — callers fall
    back to a weaker check)."""
    cfg = cfg or DedupConfig()
    sigs = SignatureStage(cfg)(pages.select(["url", "text"]))
    # refuse near the salting threshold: distributed detection is
    # sampled per block (sample_every=16, hot at 4x cap scaled), so
    # any key under half the actual-rate threshold cannot be flagged
    if _max_band_key_count(sigs, cfg) >= 2 * cfg.max_band_group:
        return None

    band_rows = explode_bands(sigs, cfg.bands, n_buckets, hot_keys=None)
    df = band_rows.to_pandas()
    pairs = pd.concat(
        [
            emit_pairs_bucket(sub, cfg.max_band_group)
            for _, sub in df.groupby("bucket", sort=True)
        ],
        ignore_index=True,
    ).drop_duplicates(["ha", "hb"])

    packed = _pack_payload(sigs)
    uh = packed["uh"].to_numpy(zero_copy_only=False).astype(U64)
    order = np.argsort(uh, kind="stable")
    uh_sorted = uh[order]
    urls = np.asarray(packed["url"].to_pylist(), dtype=object)[order]
    pays = np.asarray(packed["vpay"].to_pylist(), dtype=object)[order]

    ha = pairs["ha"].to_numpy().astype(U64)
    hb = pairs["hb"].to_numpy().astype(U64)
    ia = np.searchsorted(uh_sorted, ha)
    ib = np.searchsorted(uh_sorted, hb)
    return _metrics_from_payloads(
        urls[ia], urls[ib], pays[ia], pays[ib], cfg.num_perms, cfg.threshold
    )
