"""Corpus curation: the composed keep/drop decision a training-data
pipeline runs per document — language filter, quality threshold, exact-dup
keeper selection — plus token accounting for budget planning.

Pure composition of the existing operators (textstats + dedup), all
JVM-side column expressions (no Python nodes; plan-checked) with one
hash-shuffle groupBy (the dedup keeper election).  The measured plan reads
``documents`` three times — once per operator branch, each pruned to
(doc_id, text) — and Catalyst turns the doc_id equi-joins into broadcasts
at test scale / co-partitioned joins at scale.  Per-doc scoring is
embarrassingly parallel; keeper election is the only shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, textstats

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
    quality = textstats.text_quality(documents).select(
        "doc_id", "n_tokens", "quality_score"
    )
    lang = textstats.lang_id(documents).select("doc_id", "lang_pred")
    keepers = dedup.exact_dedup(documents).select(
        F.col("keeper_id").alias("doc_id")
    )
    return (
        quality.join(lang, "doc_id")
        .join(keepers, "doc_id", "left_semi")
        .where(
            (F.col("quality_score") >= F.lit(min_quality))
            & F.col("lang_pred").isin(list(langs))
        )
        .select("doc_id", "n_tokens", "quality_score", "lang_pred")
    )
