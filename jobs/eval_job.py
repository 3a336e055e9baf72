#!/usr/bin/env python
"""Table evaluation job: reference CSV vs predicted CSV, distributed.

Reimplements the reference eval CLI (eval_cli.py:13-51, evaluation.py:76-142)
as DataFrame aggregations: exact-cell text accuracy + masked numeric
MSE/RMSE/R^2 per column and overall.

  python jobs/eval_job.py --reference ref.csv --predicted pred.csv \
      [--numeric-columns NAME ...] [--json out.json] [--report out.csv]

``--numeric-columns`` selects columns by reference-header name (or the
``col_{idx}`` alias, eval_cli.py:19 / evaluation.py:113-115); omitted ->
every column with at least one coercible (ref, pred) pair participates,
exactly like the reference's auto-inference.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ocr_table_extractor_to_csv_spark.operators.evaluation import (
    numeric_metrics,
    text_accuracy,
)


def _read_cells(path: str):
    """All-string read + shape info (evaluation.py:39-43 semantics)."""
    with open(path, newline="", encoding="utf-8-sig") as fh:
        rows = [[(c or "").strip() for c in row] for row in csv.reader(fh)]
    if not rows:
        return [], [], 0
    header, body = rows[0], rows[1:]
    return header, body, max((len(r) for r in rows), default=0)


def evaluate(
    spark,
    reference: str,
    predicted: str,
    numeric_columns: list[str] | None = None,
) -> dict:
    ref_hdr, ref_rows, ref_w = _read_cells(reference)
    prd_hdr, prd_rows, prd_w = _read_cells(predicted)
    width = max(ref_w, prd_w)
    height = max(len(ref_rows), len(prd_rows))

    # pad both tables to a common shape with "" (evaluation.py:86-100)
    def cells(rows):
        out = []
        for r in range(height):
            row = rows[r] if r < len(rows) else []
            for c in range(width):
                out.append((r, c, row[c] if c < len(row) else ""))
        return out

    ref = spark.createDataFrame(cells(ref_rows), "r int, c int, ref string")
    prd = spark.createDataFrame(cells(prd_rows), "r int, c int, pred string")
    aligned = ref.join(prd, ["r", "c"]).cache()

    acc = text_accuracy(aligned).collect()[0]

    # numeric scope: named reference-header columns; the col_{idx} alias
    # applies ONLY to columns beyond the reference header (the reference
    # assigns that name solely to its _ref_dummy_ padding, evaluation.py:113)
    numeric = aligned
    if numeric_columns:
        wanted = set(numeric_columns)
        idxs = [
            i
            for i in range(width)
            if (i < len(ref_hdr) and ref_hdr[i] in wanted)
            or (i >= len(ref_hdr) and f"col_{i}" in wanted)
        ]
        numeric = aligned.where(F.col("c").isin(idxs) if idxs else F.lit(False))

    pairs = numeric.select(
        F.col("c"), F.col("ref").alias("y_true"), F.col("pred").alias("y_pred")
    )
    # per-column groups always have n >= 1 (numeric_metrics masks
    # non-coercible pairs BEFORE the groupBy), which is structurally the
    # reference's skip of no-coercible-pair columns (evaluation.py:121-123)
    per_col = numeric_metrics(pairs, by=["c"]).orderBy("c").collect()
    overall = numeric_metrics(pairs.drop("c")).collect()
    overall_row = overall[0] if overall and overall[0].n else None
    aligned.unpersist()

    return {
        "text_accuracy": acc.text_accuracy,
        "total_cells": acc.total_cells,
        "matched_cells": acc.matched_cells,
        "numeric_by_column": [row.asDict() for row in per_col],
        "numeric_overall": overall_row.asDict() if overall_row else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True)
    ap.add_argument("--predicted", required=True)
    ap.add_argument(
        "--numeric-columns",
        nargs="+",
        default=None,
        help="reference-header names (or col_{idx}) to evaluate numerically; omit to auto-infer",
    )
    ap.add_argument("--json", default=None)
    ap.add_argument("--report", default=None, help="CSV report path (evaluation.py:145-158 format)")
    args = ap.parse_args()

    from ocr_table_extractor_to_csv_spark.session import get_spark

    spark = get_spark(app_name="eval-tables")
    report = evaluate(spark, args.reference, args.predicted, args.numeric_columns)
    print(json.dumps(report, indent=1))
    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=1))
    if args.report:
        # reference write_report row layout (evaluation.py:145-158)
        with open(args.report, "w", newline="", encoding="utf-8") as fh:
            w = csv.writer(fh)
            w.writerow(["Metric", "Column", "Value", "N"])
            w.writerow(["text_accuracy", "-", f"{report['text_accuracy']:.4f}", report["total_cells"]])
            for m in report["numeric_by_column"]:
                for metric in ("mse", "rmse", "r2"):
                    val = m[metric]
                    w.writerow([metric, m["c"], f"{val:.6f}" if val is not None else "nan", m["n"]])
            if report["numeric_overall"]:
                o = report["numeric_overall"]
                for metric in ("mse", "rmse", "r2"):
                    val = o[metric]
                    w.writerow([f"overall_{metric}", "overall", f"{val:.6f}" if val is not None else "nan", o["n"]])
    spark.stop()


if __name__ == "__main__":
    main()
