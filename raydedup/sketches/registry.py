"""Family registry: self-describing sketch images → sketch objects.

The engine-side mirror of the reference's ``Family`` registry
(``codec/family.rs:37-109``): every serialized sketch carries its
family byte, so checkpoints and binary Arrow columns can be decoded
without knowing the producer — the ``CpcWrapper`` read-without-
deserialize pattern generalized (``cpc/wrapper.rs:49-182``).

Extension surface: register a new family id + loader with
``register_family``.
"""

from __future__ import annotations

from raydedup.sketches import codec


def _load_theta(buf):
    from raydedup.sketches.theta import ThetaSketch

    return ThetaSketch.from_bytes(buf)


def _load_hll(buf):
    from raydedup.sketches.hll import HllSketch

    return HllSketch.from_bytes(buf)


def _load_frequency(buf):
    from raydedup.sketches.frequencies import FrequentItemsSketch

    return FrequentItemsSketch.from_bytes(buf)


def _load_cpc(buf):
    from raydedup.sketches.cpc import CpcSketch

    return CpcSketch.from_bytes(buf)


def _load_countmin(buf):
    from raydedup.sketches.countmin import CountMinSketch

    return CountMinSketch.from_bytes(buf)


def _load_quantile(buf):
    # family 20 hosts both quantile sketches, distinguished by the
    # seed-hash header field used as a subtype tag (t-digest=1, KLL=2)
    import struct

    _, _, _, _, subtype, _ = struct.unpack_from("<BBBBHH", buf)
    if subtype == 2:
        from raydedup.sketches.kll import KllSketch

        return KllSketch.from_bytes(buf)
    from raydedup.sketches.tdigest import TDigest

    return TDigest.from_bytes(buf)


def _load_bloom(buf):
    from raydedup.sketches.bloom import BloomFilter

    return BloomFilter.from_bytes(buf)


_LOADERS = {
    codec.FAMILY_THETA: _load_theta,
    codec.FAMILY_HLL: _load_hll,
    codec.FAMILY_FREQUENCY: _load_frequency,
    codec.FAMILY_CPC: _load_cpc,
    codec.FAMILY_COUNTMIN: _load_countmin,
    codec.FAMILY_TDIGEST: _load_quantile,
    codec.FAMILY_BLOOM: _load_bloom,
}


def register_family(family_id: int, loader) -> None:
    _LOADERS[family_id] = loader


def sketch_from_bytes(buf: bytes):
    """Decode any engine sketch image by its family byte."""
    if len(buf) < 1:
        raise codec.InvalidData("empty sketch image")
    family = buf[0]
    loader = _LOADERS.get(family)
    if loader is None:
        raise codec.InvalidData(f"unknown sketch family {family}")
    return loader(buf)


def register_frequent_item_codec(name: str, encode, decode) -> None:
    """Extension surface for FrequentItems wire codecs — the engine
    analog of the reference's generic ``FrequentItemValue`` trait
    (``frequencies/serialization.rs:36-43``). See
    ``frequencies.register_item_codec`` for the signatures."""
    from raydedup.sketches.frequencies import register_item_codec

    register_item_codec(name, encode, decode)
