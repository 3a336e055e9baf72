"""Sources: deterministic synthetic corpora + table catalog helpers."""
