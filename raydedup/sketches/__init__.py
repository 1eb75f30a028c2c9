"""Mergeable-sketch core: the reference's algebra as vectorized kernels."""
