"""Planning helpers: skew-aware partitioning, checkpoint resume, lineage."""
