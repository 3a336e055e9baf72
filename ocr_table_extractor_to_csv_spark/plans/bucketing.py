"""Bucketed co-located joins for the resume protocol at 10^12 urls.

The default resume anti-join (plans/resume.py) broadcasts ``progress`` while
it is small; once the progress table holds billions of done-urls, BOTH sides
of ``pages LEFT ANTI JOIN progress ON url`` would shuffle every batch.
Bucketing both tables by ``url`` into the same bucket count makes the join
a zero-shuffle zip of co-located buckets: each task reads pages bucket i and
progress bucket i — no Exchange in the plan (pinned by
tests/test_plan_quality.py::test_bucketed_resume_join_has_no_shuffle).

On Iceberg the same layout is ``bucket(N, url)`` partition transforms +
storage-partitioned joins; here (parquet warehouse) it is Spark native
bucketing via ``bucketBy(...).saveAsTable``.  Use for the steady-state
ingest loop; the plain anti-join stays right for small/ad-hoc runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str = "url",
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """External parquet table bucketed (and sorted) by ``bucket_col``.

    Repartitions on the bucket column first: without it every upstream task
    writes one file per bucket it touches (tasks x n_buckets small files),
    which taxes every later bucket-zip read with file-open overhead."""
    (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(table)
    )


def bucketed_pending(
    spark: SparkSession, pages_table: str, progress_table: str
) -> DataFrame:
    """pages LEFT ANTI JOIN progress(done) ON url over same-bucketed tables:
    shuffle-free when both tables share the bucket spec.  Delegates to the
    canonical resume predicate so the two resume paths cannot drift."""
    from .resume import pending_pages

    return pending_pages(spark.table(pages_table), spark.table(progress_table))
