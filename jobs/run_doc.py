#!/usr/bin/env python
"""Single-document debug CLI — mirrors the reference's ``run.py`` flags
(run.py:16-43) so one document can be extracted and byte-compared against
the reference's output without spinning up Spark.

  python jobs/run_doc.py out.csv --hocr_path page.hocr --layout dynamic \
      [--bbox X1 Y1 X2 Y2] [--expected-n-cols N] [--header-regex RX ...]

Differences from the reference CLI (documented divergences):
  * ``--image`` / the OCR step is out of scope (no tesseract here); the
    ``transformers`` layout instead takes ``--hocr_path`` and runs the
    reference's non-model heuristic fallback (layout_transformers.py:516-565)
  * ``--transformer-model`` / ``--transformer-ocr-lang`` are not accepted
    (model inference is out of scope).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ocr_table_extractor_to_csv_spark.kernel import extract_document


def _numeric_variant_path(csv_path: str) -> Path:
    """main.py:32-37 verbatim naming: foo.csv -> foo.num.csv."""
    path = Path(csv_path)
    if path.suffix.lower() != ".csv":
        return path.with_name(f"{path.name}.num.csv")
    return path.with_name(f"{path.stem}.num.csv")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Extract one hOCR/HTML document to CSV.")
    ap.add_argument("csv_path")
    ap.add_argument("--hocr_path", required=True, help="input .hocr/.html file")
    ap.add_argument(
        "--layout",
        default="dynamic",  # run.py:22 default
        choices=["financial", "dynamic", "generic", "professional", "transformers", "html", "auto"],
    )
    ap.add_argument("--bbox", type=int, nargs=4, metavar=("X1", "Y1", "X2", "Y2"))
    ap.add_argument("--expected-n-cols", type=int, default=None)
    ap.add_argument("--header-regex", action="append", default=None)
    ap.add_argument(
        "--transformer-max-cols",
        type=int,
        default=None,
        help="transformers-layout target column cap (run.py --transformer-max-cols)",
    )
    ap.add_argument(
        "--loglevel",
        default="INFO",
        choices=["DEBUG", "INFO", "WARNING", "ERROR"],  # run.py:28-29
    )
    args = ap.parse_args(argv)

    import logging

    logging.basicConfig(
        level=args.loglevel, format="%(asctime)s - %(levelname)s - %(message)s"
    )

    html = Path(args.hocr_path).read_bytes()
    res = extract_document(
        html,
        layout=args.layout,
        table_bbox=tuple(args.bbox) if args.bbox else None,
        expected_n_cols=args.expected_n_cols,
        header_regexes=args.header_regex,
        max_columns=args.transformer_max_cols,
    )
    out = Path(args.csv_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(res.csv)
    if res.csv_numeric is not None:
        _numeric_variant_path(args.csv_path).write_bytes(res.csv_numeric)
    print(
        f"layout={res.layout} rows={res.n_rows} cols={res.n_cols} "
        f"tokens={res.n_tokens} lines={res.n_lines} error={res.error}"
    )
    return 0 if res.error is None else 1


if __name__ == "__main__":
    raise SystemExit(main())
