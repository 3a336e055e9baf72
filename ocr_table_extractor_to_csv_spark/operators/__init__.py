"""DataFrame-level operators: extraction kernel wrapper, dedup, similarity,
text statistics, evaluation metrics."""
