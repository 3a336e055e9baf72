"""Dataset-builder parity tests (dataset_builder.py semantics)."""

import pytest
from pyspark.sql import functions as F

from ocr_table_extractor_to_csv_spark.kernel.dataset import (
    build_layoutlm_example,
    normalize_box,
)


def _doc(words):
    spans = "".join(
        f'<span class="ocrx_word" title="bbox {x1} {y1} {x2} {y2}">{t}</span>'
        for (t, x1, y1, x2, y2) in words
    )
    return (
        '<?xml version="1.0"?><html><body>'
        f'<div class="ocr_page" title="bbox 0 0 1000 500">{spans}</div>'
        "</body></html>"
    ).encode()


def test_normalize_box_clamped():
    # dataset_builder.py:37-46: round + clamp to [0, 1000]
    assert normalize_box((100, 50, 200, 75), 1000, 500) == [100, 100, 200, 150]
    assert normalize_box((0, 0, 2000, 600), 1000, 500) == [0, 0, 1000, 1000]


def test_example_labels_and_header():
    html = _doc(
        [
            ("Name", 100, 100, 150, 130),
            ("Val", 400, 100, 440, 130),
            ("foo", 100, 160, 130, 190),
            ("9", 400, 160, 410, 190),
        ]
    )
    ex = build_layoutlm_example(html)
    assert ex["labels"] == ["HEADER_COL_0", "HEADER_COL_1", "BODY_COL_0", "BODY_COL_1"]
    assert ex["table_header"] == ["Name", "Val"]
    assert ex["table_rows"] == [["foo", "9"]]
    assert ex["row_ids"] == [0, 0, 1, 1]
    assert ex["is_header"] == [True, True, False, False]
    # page bbox 1000x500 drives normalization
    assert ex["bboxes"][0] == [100, 200, 150, 260]


def test_max_columns_other_label():
    # col index >= max_columns -> OTHER (dataset_builder.py:230-236)
    words = [(f"c{i}", 100 + 200 * i, 100, 150 + 200 * i, 130) for i in range(4)]
    ex = build_layoutlm_example(_doc(words), max_columns=2)
    assert ex["labels"] == ["HEADER_COL_0", "HEADER_COL_1", "OTHER", "OTHER"]


def test_empty_doc_raises():
    with pytest.raises(ValueError):
        build_layoutlm_example(
            b'<?xml version="1.0"?><html><body><div class="ocr_page" title="bbox 0 0 10 10"></div></body></html>'
        )


def test_jsonl_sink(spark, tmp_path):
    from ocr_table_extractor_to_csv_spark.operators.dataset import build_examples
    from ocr_table_extractor_to_csv_spark.sources.pages import fixture_pages

    pages = fixture_pages(spark, scale=0.1).where(F.col("family") == "generic4")
    out = str(tmp_path / "ds")
    ex = build_examples(pages)
    ex.where(F.col("error").isNull()).write.json(out)  # S9 JSONL sink
    back = spark.read.json(out)
    assert back.count() == pages.count()
    assert "words" in back.columns and "bboxes" in back.columns
