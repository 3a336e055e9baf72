"""Checkpoint-based resume over a progress table (north_rule requirement).

Batch protocol (exactly-once at the batch granularity, SURVEY.md §4.2):
  1. ``pending = pages LEFT ANTI JOIN progress(status='done') ON url`` —
     Catalyst broadcasts the progress url set when small, sort-merge joins
     otherwise; AQE picks at runtime.
  2. extract ``pending`` and write ``extracted`` partitioned by ``batch_id``
     with dynamic partition overwrite — a re-run of a failed batch REPLACES
     its partition instead of duplicating rows.
  3. append ``(url, batch_id, status, n_rows, error)`` to ``progress`` only
     after the data write commits.

On Iceberg the same protocol maps to ``overwritePartitions()`` + a snapshot
commit; here the warehouse is parquet directories (no Iceberg runtime jar in
this sandbox) with identical semantics via
``spark.sql.sources.partitionOverwriteMode=dynamic``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def read_progress(spark: SparkSession, progress_path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(progress_path)
    except AnalysisException:
        return None  # first run: no progress table yet


def pending_pages(pages: DataFrame, progress: DataFrame | None) -> DataFrame:
    if progress is None:
        return pages
    done = progress.where(F.col("status") == "done").select("url")
    return pages.join(done, "url", "left_anti")


def commit_batch(
    extracted: DataFrame,
    batch_id: int,
    extracted_path: str,
    progress_path: str,
) -> None:
    spark = extracted.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    stamped = extracted.withColumn("batch_id", F.lit(batch_id))
    (
        stamped.write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(extracted_path)
    )
    # progress rows are derived from the COMMITTED output, not the input:
    # re-reading guarantees the anti-join key set reflects durable data only
    committed = spark.read.parquet(extracted_path).where(F.col("batch_id") == batch_id)
    progress = committed.select(
        "url",
        "batch_id",
        F.when(F.col("error").isNull(), F.lit("done")).otherwise(F.lit("failed")).alias("status"),
        "n_rows",
        "error",
        F.current_timestamp().alias("ts"),
    )
    progress.write.mode("append").parquet(progress_path)
