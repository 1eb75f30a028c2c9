"""Training-data-pipeline operators beyond the reference's surface."""
