"""Column-level helper functions (thin, pure pyspark.sql.functions)."""

from .columns import (  # noqa: F401
    csv_text,
    is_number_like_col,
    normalized_text,
    to_number_col,
    tokens,
)
