#!/usr/bin/env python
"""Batch extraction job with checkpoint resume + lineage manifests.

Usage (sandbox; on a real cluster ship via
``spark-submit --py-files engine.zip jobs/extract_job.py ...``):

  python jobs/extract_job.py --pages <parquet dir or table> \
      --out /data/extracted --progress /data/progress \
      --manifests /data/manifests --batch-id 7 \
      [--layout auto] [--giant-threshold 8388608]

Plan (all declarative; Catalyst prunes the page columns not selected):
  pages LEFT ANTI JOIN progress(done) ON url     -- resume
    -> isolate_giants                             -- skew tail split
    -> mapInArrow extraction kernel (2 passes)    -- the only Python stage
    -> write extracted partitioned by batch_id    -- idempotent overwrite
    -> append progress rows derived from the committed output
    -> append per-partition lineage manifests
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ocr_table_extractor_to_csv_spark.operators.extract import extract_pages
from ocr_table_extractor_to_csv_spark.plans.lineage import build_manifests
from ocr_table_extractor_to_csv_spark.plans.partitioning import isolate_giants
from ocr_table_extractor_to_csv_spark.plans.resume import (
    commit_batch,
    pending_pages,
    read_progress,
)
from ocr_table_extractor_to_csv_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--progress", required=True)
    ap.add_argument("--manifests", default=None)
    ap.add_argument("--batch-id", type=int, required=True)
    ap.add_argument("--layout", default="auto")
    ap.add_argument(
        "--per-row-dispatch",
        action="store_true",
        help="use the input's layout/args columns instead of --layout",
    )
    ap.add_argument("--giant-threshold", type=int, default=8 * 1024 * 1024)
    ap.add_argument("--lang", default=None, help="optional lang pushdown filter")
    args = ap.parse_args()

    spark = get_spark(app_name=f"extract-batch-{args.batch_id}")
    pages = spark.read.parquet(args.pages)
    if args.lang:
        # pushdown filter reaches the parquet scan (check .explain PushedFilters)
        pages = pages.where(F.col("lang") == args.lang)
    cols = ["url", "html"] + (["layout", "args"] if args.per_row_dispatch else [])
    pages = pages.select(*cols)

    progress = read_progress(spark, args.progress)
    pending = pending_pages(pages, progress)

    small, giants = isolate_giants(pending, args.giant_threshold)
    extracted = extract_pages(small, layout=args.layout, per_row_dispatch=args.per_row_dispatch)
    if giants.limit(1).count():
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
        extracted = extracted.unionByName(
            extract_pages(
                giants.repartition(spark.sparkContext.defaultParallelism),
                layout=args.layout,
                per_row_dispatch=args.per_row_dispatch,
            )
        )

    commit_batch(extracted, args.batch_id, args.out, args.progress)

    committed = spark.read.parquet(args.out).where(F.col("batch_id") == args.batch_id)
    if args.manifests:
        build_manifests(committed).withColumn("batch_id", F.lit(args.batch_id)).write.mode(
            "append"
        ).parquet(args.manifests)

    stats = committed.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)), F.lit(0)
        ).alias("failed"),
    ).collect()[0]
    print(f"batch {args.batch_id}: {stats.n} pages extracted, {stats.failed} failed")
    spark.stop()


if __name__ == "__main__":
    main()
