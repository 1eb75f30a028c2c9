"""Mergeable-sketch core: the reference's algebra as vectorized kernels.

Public surface (lazy imports keep `import raydedup` light):

>>> from raydedup.sketches import ThetaSketch, HllSketch, CpcSketch
>>> from raydedup.sketches import TDigest, KllSketch, BloomFilter
>>> from raydedup.sketches import CountMinSketch, FrequentItemsSketch
>>> from raydedup.sketches import sketch_from_bytes  # family registry
"""


def __getattr__(name):
    _map = {
        "ThetaSketch": ("raydedup.sketches.theta", "ThetaSketch"),
        "theta_union": ("raydedup.sketches.theta", "theta_union"),
        "theta_intersect": ("raydedup.sketches.theta", "theta_intersect"),
        "HllSketch": ("raydedup.sketches.hll", "HllSketch"),
        "HllHipSketch": ("raydedup.sketches.hll", "HllHipSketch"),
        "hll_union": ("raydedup.sketches.hll", "hll_union"),
        "CpcSketch": ("raydedup.sketches.cpc", "CpcSketch"),
        "cpc_union": ("raydedup.sketches.cpc", "cpc_union"),
        "TDigest": ("raydedup.sketches.tdigest", "TDigest"),
        "tdigest_merge": ("raydedup.sketches.tdigest", "tdigest_merge"),
        "KllSketch": ("raydedup.sketches.kll", "KllSketch"),
        "BloomFilter": ("raydedup.sketches.bloom", "BloomFilter"),
        "CountMinSketch": ("raydedup.sketches.countmin", "CountMinSketch"),
        "FrequentItemsSketch": ("raydedup.sketches.frequencies", "FrequentItemsSketch"),
        "sketch_from_bytes": ("raydedup.sketches.registry", "sketch_from_bytes"),
    }
    if name in _map:
        import importlib

        mod, attr = _map[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'raydedup.sketches' has no attribute {name!r}")
