"""Deterministic page synthesis from the ``documents`` test table.

``pages_from_documents`` lays each document's normalized tokens onto a
4-column hOCR grid with geometry chosen so the generic-layout extraction is
EXACTLY predictable from the token list alone:

  * tokens: ``re.sub('[^a-z0-9]+',' ', text.lower()).strip().split(' ')``,
    each truncated to 12 chars; docs with < 4 tokens are skipped;
  * token i sits at row ``i // 4``, column ``i % 4``; column anchors
    ``(100, 500, 900, 1300)``; y = 100 + 56*row; box = 8px/char x 30px;
  * gutters (>= 204 px) and row gaps (26 px) are far beyond the reference
    thresholds (>5 px column gap, >2 px row gap), and every token center
    falls inside its own column interval.

Therefore the engine's generic extraction of these pages yields
``header = tokens[0:4]`` and body row r = ``tokens[4r:4r+4]`` — a fact a SQL
oracle (DuckDB) can recompute from ``documents.text`` directly, giving the
driver an end-to-end value-level check of the whole Spark pipeline
(CORRECTNESS gate), complementing the byte-identity pytest goldens.

The same grid in SQL (oracle_sql in __spark_entry__.py) reconstructs the
exact CSV text: rows joined by CRLF with a trailing CRLF, no quoting needed
(tokens are lowercase alnum).
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator, List

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TOKEN_RE = re.compile(r"[^a-z0-9]+")
ANCHORS = (100, 500, 900, 1300)
CHAR_W = 8
TOKEN_H = 30
ROW_PITCH = 56
Y0 = 100
MAX_TOKEN_LEN = 12

PAGES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("url", StringType()),
        StructField("html", BinaryType()),
    ]
)


def grid_tokens(text: str) -> List[str]:
    """The shared normalization spec (must match the SQL oracle verbatim)."""
    norm = TOKEN_RE.sub(" ", (text or "").lower()).strip()
    if not norm:
        return []
    return [t[:MAX_TOKEN_LEN] for t in norm.split(" ")]


def grid_hocr(tokens: List[str]) -> bytes:
    n = (len(tokens) // 4) * 4
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?><html><body>'
        '<div class="ocr_page" title="image; bbox 0 0 1700 100000">'
    ]
    for i in range(n):
        r, c = divmod(i, 4)
        x1 = ANCHORS[c]
        y1 = Y0 + ROW_PITCH * r
        t = tokens[i]
        parts.append(
            f'<span class="ocrx_word" title="bbox {x1} {y1} '
            f"{x1 + CHAR_W * len(t)} {y1 + TOKEN_H}\">{t}</span>"
        )
    parts.append("</div></body></html>")
    return "".join(parts).encode()


def _synth_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in batches:
        ids, urls, htmls = [], [], []
        for i in range(len(batch)):
            toks = grid_tokens(batch["text"].iat[i])
            if len(toks) < 4:
                continue
            doc_id = int(batch["doc_id"].iat[i])
            ids.append(doc_id)
            urls.append(f"doc://{doc_id}")
            htmls.append(grid_hocr(toks))
        yield pd.DataFrame({"doc_id": ids, "url": urls, "html": htmls})


def pages_from_documents(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> pages(doc_id, url, html)."""
    return documents.select("doc_id", "text").mapInPandas(_synth_batches, PAGES_SCHEMA)


def fixture_pages(spark, scale: float = 1.0, giant_tokens: int = 2000) -> DataFrame:
    """The FIXTURES.md corpus as a DataFrame (with layout/args columns for
    per-row dispatch)."""
    from .fixtures import generate_corpus

    rows = [
        (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"], r["family"], r["layout"], r["args"])
        for r in generate_corpus(scale=scale, giant_tokens=giant_tokens)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string, family string, layout string, args string"
    )
