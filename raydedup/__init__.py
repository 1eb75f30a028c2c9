"""raydedup — a Ray-Data-native near-duplicate detection engine.

A from-scratch reimplementation of the query/data-processing
capabilities of the reference (`/root/reference`, Apache DataSketches
Rust, crate ``datasketches`` v0.3.0) as a distributed engine:

- ``raydedup.sketches``: the reference's mergeable-sketch algebra
  (theta, HLL, t-digest, count-min, frequent-items, Bloom, CPC) as
  vectorized NumPy kernels with partial/merge/finalize structure, usable
  as Ray Data aggregations.
- ``raydedup.pipeline``: the near-duplicate detection + clustering
  pipeline (MinHash 128-perm signatures over 5-gram shingles, LSH band
  candidate generation with hot-band salting, exact/theta verification,
  union-find clustering) expressed as ``ray.data.Dataset`` stages.
- ``raydedup.ops``: large-scale training-data operators (exact dedup,
  SimHash, embedding ANN, language ID, quality scoring, token stats).
- ``raydedup.synth``: deterministic Common-Crawl-style corpus generator
  with planted golden duplicate clusters.

Nothing in this package calls ``ray.init``; callers own the session.
"""

from raydedup.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
