"""Dataset-level stages of the near-duplicate detection pipeline."""
