"""Golden regression: the kernel must reproduce the frozen per-url outputs
byte-for-byte (FIXTURES.md §4).  Any semantic drift in parsing, geometry,
layouts, or export shows up here as a hash mismatch."""

import hashlib
import json
from pathlib import Path

import pytest

from ocr_table_extractor_to_csv_spark.sources.fixtures import generate_corpus
from tests.freeze_goldens import GIANT_TOKENS, extract_row

GOLDEN = Path(__file__).parent / "goldens" / "fixture_manifest.json"


def sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


@pytest.fixture(scope="module")
def manifest():
    if not GOLDEN.exists():
        pytest.skip("goldens not frozen; run python tests/freeze_goldens.py")
    return json.loads(GOLDEN.read_text())


def test_every_fixture_matches_golden(manifest):
    seen = 0
    for row in generate_corpus(giant_tokens=GIANT_TOKENS):
        want = manifest[row["url"]]
        res = extract_row(row)
        assert sha(res.csv) == want["csv_sha"], row["url"]
        got_num = sha(res.csv_numeric) if res.csv_numeric is not None else None
        assert got_num == want["csv_numeric_sha"], row["url"]
        assert sha(res.main_text.encode()) == want["main_text_sha"], row["url"]
        assert res.n_rows == want["n_rows"] and res.n_cols == want["n_cols"], row["url"]
        seen += 1
    assert seen == len(manifest)


def test_family_coverage(manifest):
    fams = {v["family"] for v in manifest.values()}
    assert fams == {
        "generic4", "generic_wrap", "generic_hdr_rx", "fin3", "dyn",
        "dyn_fallback", "pro", "lineid", "bbox_crop", "empty", "multipage",
        "weird_numbers", "boiler", "giant",
    }
