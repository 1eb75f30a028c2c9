"""Shared mutable state — the one engine niche Ray Data's Dataset API
cannot express (a Dataset is immutable lineage; an online index must
mutate between queries). Components here are raw Ray actors by design;
everything batch-shaped lives in ops/ and pipeline/ as Dataset stages."""
