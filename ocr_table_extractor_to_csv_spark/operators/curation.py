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


def curate_neardup(
    documents: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    langs=DEFAULT_LANGS,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """``curate`` with NEAR-duplicate keeper election — the decision a real
    corpus pipeline ships: a doc survives iff it passes the lang + quality
    gates AND is its MinHash-LSH cluster's keeper (min doc_id of the
    connected component, composing ``dedup.dedup_clusters``), so
    boilerplate-mutated near-copies collapse to one survivor, not just
    byte-identical ones.

    Plan shape: per-doc scoring is one pruned scan + project (JVM-only);
    the keeper side is the bounded LSH + O(log d) CC rounds; they meet in a
    single equi-join on doc_id.  The lang/quality filters run BEFORE the
    join, so only gate-survivors shuffle.  Pass ``checkpoint_dir`` on a real
    cluster (see connected_components durability note)."""
    from .dedup import dedup_clusters

    q = quality_columns(F.col("text"))
    scored = documents.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["quality_score"].alias("quality_score"),
        lang_pred_col(F.col("text")).alias("lang_pred"),
    ).where(
        (F.col("quality_score") >= F.lit(min_quality))
        & F.col("lang_pred").isin(list(langs))
    )
    keepers = (
        dedup_clusters(documents, checkpoint_dir=checkpoint_dir)
        .where(F.col("is_keeper"))
        .select("doc_id")
    )
    return scored.join(keepers, "doc_id").select(
        "doc_id", "n_tokens", "quality_score", "lang_pred"
    )
