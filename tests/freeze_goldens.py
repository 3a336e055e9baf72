"""Freeze golden extraction outputs for the fixture corpus.

Run once at fixture-authoring time: ``python tests/freeze_goldens.py``.
Writes tests/goldens/fixture_manifest.json with per-url sha256 of csv /
csv_numeric / main_text plus row/col counts, and full byte samples for one
doc per family (tests/goldens/samples/).

NOTE: bs4/lxml are not installed in this sandbox, so the reference
implementation cannot be replayed here (FIXTURES.md §4 anticipated replay).
These goldens are therefore frozen from the kernel — pinned by the
hand-computed byte tests in test_kernel_layouts.py / test_kernel_export.py —
and serve as the regression + distribution-independence contract for the
Spark engine.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

from ocr_table_extractor_to_csv_spark.kernel import extract_document
from ocr_table_extractor_to_csv_spark.sources.fixtures import generate_corpus

GOLDEN_DIR = Path(__file__).parent / "goldens"
GIANT_TOKENS = 2000  # small in unit fixtures; bench scales this up


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def extract_row(row: dict):
    args = json.loads(row["args"])
    if "table_bbox" in args and args["table_bbox"] is not None:
        args["table_bbox"] = tuple(args["table_bbox"])
    return extract_document(row["html"], layout=row["layout"], **args)


def main() -> None:
    manifest = {}
    samples_done = set()
    sample_dir = GOLDEN_DIR / "samples"
    sample_dir.mkdir(parents=True, exist_ok=True)
    for row in generate_corpus(giant_tokens=GIANT_TOKENS):
        res = extract_row(row)
        manifest[row["url"]] = {
            "family": row["family"],
            "layout": res.layout,
            "csv_sha": sha(res.csv),
            "csv_numeric_sha": sha(res.csv_numeric) if res.csv_numeric is not None else None,
            "main_text_sha": sha(res.main_text.encode()),
            "n_rows": res.n_rows,
            "n_cols": res.n_cols,
        }
        if row["family"] not in samples_done:
            samples_done.add(row["family"])
            stem = sample_dir / row["family"]
            stem.with_suffix(".csv.bin").write_bytes(res.csv)
            if res.csv_numeric is not None:
                stem.with_suffix(".num.csv.bin").write_bytes(res.csv_numeric)
            stem.with_suffix(".txt").write_text(res.main_text)
    out = GOLDEN_DIR / "fixture_manifest.json"
    out.write_text(json.dumps(manifest, indent=1, sort_keys=True))
    print(f"froze {len(manifest)} goldens -> {out}")


if __name__ == "__main__":
    main()
