#!/usr/bin/env python
"""Dataset-builder job — the Spark analogue of the reference's dataset CLI
(dataset_cli.py:70-215), including its explicit ``--pair`` entry point and
pair de-duplication (dataset_cli.py:189-195).

Two input modes, combinable:

  * ``--pair URL:HOCR_PATH`` (repeatable): explicit local documents, exactly
    like the reference's ``--pair IMAGE:HOCR`` (images are out of scope —
    the hOCR already carries the geometry the example builder needs);
  * ``--pages <parquet>``: a pages table (url, html, ...) for the
    distributed path.

Duplicate pairs are dropped on the (url, resolved hocr path) key before any
work, mirroring the reference's ``seen`` set.  Output is the S9 JSONL sink
(``df.write.json``).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_pairs(pair_args: list[str]) -> list[tuple[str, str]]:
    """URL:HOCR_PATH -> deduped (url, path) list (dataset_cli.py:160-195)."""
    seen = set()
    out: list[tuple[str, str]] = []
    for pair in pair_args or []:
        # rsplit: urls contain ':' (the reference splits IMAGE:HOCR from the
        # left because image paths don't; the path side is the colon-free one
        # here)
        url, sep, hocr_path = pair.rpartition(":")
        if not sep or not url or not hocr_path:
            raise SystemExit(f"invalid --pair {pair!r}: use URL:HOCR_PATH")
        key = (url, str(Path(hocr_path).expanduser().resolve()))
        if key in seen:
            continue
        seen.add(key)
        out.append((url, key[1]))
    return out


def run_dataset(
    spark,
    out: str,
    pairs: list[tuple[str, str]] | None = None,
    pages=None,
    expected_n_cols: int | None = None,
    header_regexes=None,
    max_columns: int = 6,
    table_bbox=None,
):
    """Build examples from explicit pairs and/or a pages DataFrame; returns
    the examples DataFrame after writing JSONL to ``out``."""
    from ocr_table_extractor_to_csv_spark.operators.dataset import build_examples

    frames = []
    if pairs:
        rows = [(url, Path(p).read_bytes()) for url, p in pairs]
        frames.append(spark.createDataFrame(rows, "url string, html binary"))
    if pages is not None:
        frames.append(pages.select("url", "html"))
    if not frames:
        raise SystemExit("no input: provide --pair and/or --pages")
    all_pages = frames[0]
    for f in frames[1:]:
        all_pages = all_pages.unionByName(f)

    examples = build_examples(
        all_pages,
        expected_n_cols=expected_n_cols,
        header_regexes=header_regexes,
        max_columns=max_columns,
        table_bbox=table_bbox,
    )
    # keep null fields (error: null) so each JSONL record carries the full
    # example dict like the reference's json.dumps(ex.to_dict())
    examples.write.mode("overwrite").option("ignoreNullFields", "false").json(out)
    return examples


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", action="append", metavar="URL:HOCR_PATH")
    ap.add_argument("--pages", default=None, help="pages parquet dir/table")
    ap.add_argument("--out", required=True, help="JSONL output directory")
    ap.add_argument(
        "--bbox", type=int, nargs=4, metavar=("X1", "Y1", "X2", "Y2"),
        help="optional table bbox crop (dataset_cli.py --bbox)",
    )
    ap.add_argument("--expected-n-cols", type=int, default=None)
    ap.add_argument("--header-regex", action="append", default=None)
    ap.add_argument("--max-columns", type=int, default=6)
    args = ap.parse_args()

    from ocr_table_extractor_to_csv_spark.session import get_spark

    spark = get_spark(app_name="dataset-builder")
    pages = spark.read.parquet(args.pages) if args.pages else None
    examples = run_dataset(
        spark,
        out=args.out,
        pairs=parse_pairs(args.pair),
        pages=pages,
        expected_n_cols=args.expected_n_cols,
        header_regexes=args.header_regex,
        max_columns=args.max_columns,
        table_bbox=tuple(args.bbox) if args.bbox else None,
    )
    # summarize from the WRITTEN output (re-counting the returned DataFrame
    # would re-run the whole extraction pipeline per action); the explicit
    # schema keeps a zero-example build from crashing on schema inference
    # over an empty JSON directory
    stats = (
        spark.read.schema(examples.schema).json(args.out)
        .selectExpr("count(*) AS n", "count_if(error IS NOT NULL) AS n_err")
        .collect()[0]
    )
    print(f"dataset written to {args.out}: {stats.n} examples, {stats.n_err} errors")
    spark.stop()


if __name__ == "__main__":
    main()
