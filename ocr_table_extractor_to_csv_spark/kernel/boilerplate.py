"""Main-content extraction for regular (non-hOCR) HTML pages.

The reference operates only on hOCR; the north-star scope adds Common-Crawl
HTML, so this module defines a DETERMINISTIC boilerplate-strip spec in the
spirit of Boilerpipe/jusText (shallow text density + link density):

  * candidate blocks = deepest elements among BLOCK_TAGS that contain text;
  * blocks under nav/header/footer/aside/script/style/noscript/form are
    boilerplate;
  * a block is content iff its normalized text has >= MIN_CHARS chars and
    link_density (chars under <a> descendants / total chars) < MAX_LINK_DENSITY;
  * main_text = content block texts joined with "\n\n".

Plus plain <table> reconstruction: the first table with >= 2 rows and >= 2
columns is emitted through the same byte-exact CSV exporter (header = first
row).  Both rules are frozen as the engine's own golden spec (FIXTURES.md §3
`boiler` family) — there is no reference behavior to match here.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from .export import csv_bytes
from .hocr import _Node

BLOCK_TAGS = frozenset(
    "p div li h1 h2 h3 h4 h5 h6 blockquote pre article section td th dd dt figcaption".split()
)
BOILER_CONTAINERS = frozenset("nav header footer aside script style noscript form".split())

MIN_CHARS = 25
MAX_LINK_DENSITY = 0.33

_WS_RE = re.compile(r"\s+")


def _norm(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


def _tag(node: _Node) -> str:
    # ElementTree may namespace tags as '{uri}tag'
    t = node.tag
    return t.rsplit("}", 1)[-1].lower() if isinstance(t, str) else ""


def _link_chars(node: _Node) -> int:
    total = 0
    if _tag(node) == "a":
        return len(_norm("".join(node.itertext())))
    for c in node.content:
        if isinstance(c, _Node):
            total += _link_chars(c)
    return total


def _collect_blocks(node: _Node, in_boiler: bool, out: List[Tuple[str, float]]) -> bool:
    """Post-order walk; returns True if any descendant block was emitted,
    so ancestors don't double-count nested blocks."""
    tag = _tag(node)
    boiler = in_boiler or tag in BOILER_CONTAINERS
    child_emitted = False
    for c in node.content:
        if isinstance(c, _Node):
            child_emitted |= _collect_blocks(c, boiler, out)
    if child_emitted:
        return True
    if tag in BLOCK_TAGS and not boiler:
        text = _norm("".join(node.itertext()))
        if text:
            n = len(text)
            density = _link_chars(node) / max(1, n)
            out.append((text, density))
            return True
    return False


def extract_main_text(root: _Node) -> str:
    blocks: List[Tuple[str, float]] = []
    _collect_blocks(root, False, blocks)
    keep = [t for (t, d) in blocks if len(t) >= MIN_CHARS and d < MAX_LINK_DENSITY]
    return "\n\n".join(keep)


def extract_first_table(root: _Node) -> Optional[Tuple[List[str], List[List[str]]]]:
    """First <table> with >= 2 rows and >= 2 columns -> (header, body)."""
    for node in root.iter():
        if _tag(node) != "table":
            continue
        rows: List[List[str]] = []
        for tr in node.iter():
            if _tag(tr) != "tr":
                continue
            cells = [
                _norm("".join(td.itertext()))
                for td in tr.iter()
                if _tag(td) in ("td", "th")
            ]
            if cells:
                rows.append(cells)
        if len(rows) >= 2 and max(len(r) for r in rows) >= 2:
            width = max(len(r) for r in rows)
            rows = [(r + [""] * width)[:width] for r in rows]
            return rows[0], rows[1:]
    return None


def extract_html_document(root: _Node) -> Tuple[str, bytes, List[str], List[List[str]]]:
    """(main_text, csv_bytes, header, body) for a regular HTML page.
    No qualifying table -> 0-byte csv (same convention as an empty grid)."""
    main_text = extract_main_text(root)
    table = extract_first_table(root)
    if table is None:
        return main_text, b"", [], []
    header, body = table
    return main_text, csv_bytes(body, header), header, body
