"""Corpus curation: the composed keep/drop decision a training-data
pipeline runs per document — language filter, quality threshold, exact-dup
keeper election — plus token accounting for budget planning.

All scoring columns come from the SAME single-spec builders the standalone
operators use (textstats.quality_columns / lang_pred_col / norm_text_col),
computed in ONE select over one scan of ``documents``; keeper election is a
min-over-fingerprint window — the single shuffle.  Per-doc scoring is
embarrassingly parallel; the plan is scan -> project -> window -> filter
(JVM-only, plan-checked in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textstats import lang_pred_col, norm_text_col, quality_columns

DEFAULT_MIN_QUALITY = 0.5
DEFAULT_LANGS = ("en",)


def curate(
    documents: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    langs=DEFAULT_LANGS,
) -> DataFrame:
    """(doc_id, n_tokens, quality_score, lang_pred) for documents that are
    (a) predicted in ``langs``, (b) >= ``min_quality``, and (c) their exact-
    dup group's keeper (min doc_id per normalized-text fingerprint)."""
    q = quality_columns(F.col("text"))
    scored = documents.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["quality_score"].alias("quality_score"),
        lang_pred_col(F.col("text")).alias("lang_pred"),
        F.md5(norm_text_col(F.col("text"))).alias("fp"),
    )
    w = Window.partitionBy("fp")
    return (
        scored.withColumn("_keeper", F.min("doc_id").over(w) == F.col("doc_id"))
        .where(
            F.col("_keeper")
            & (F.col("quality_score") >= F.lit(min_quality))
            & F.col("lang_pred").isin(list(langs))
        )
        .select("doc_id", "n_tokens", "quality_score", "lang_pred")
    )
