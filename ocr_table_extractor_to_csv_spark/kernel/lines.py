"""Token -> line grouping (reference lines.py:6-63, structures.py:17-20).

Two branches, exactly as the reference:

* **line_id branch** (lines.py:14-26): active when *any* token carries a
  line_id.  Group key is ``(page, line_id or f"inferred_{page}_{int(yc)}")``
  in first-occurrence order; members sorted by x1 (stable); lines sorted by
  ``(page, y1, x1)`` of the union bbox.

* **overlap branch** (lines.py:28-63): tokens sorted by ``(page, yc, x1)``;
  greedy scan joins a token to the current band when
  ``overlap(band, token) / max(1, min(heights)) >= 0.5`` where the band
  expands to the union of member y-extents; a page change always flushes.

Output is a list of ``Line`` views over the columnar TokenArrays — each line
holds the member token indices sorted by x1, so every downstream pass can
slice numpy arrays instead of materializing token objects.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from .hocr import TokenArrays


@dataclass
class Line:
    page: int
    x1: int
    y1: int
    x2: int
    y2: int
    idx: np.ndarray  # member token indices, sorted by x1 (stable)
    line_id: object = None


def _finish(tok: TokenArrays, page: int, members: List[int], line_id=None) -> Line:
    m = np.asarray(members, dtype=np.int64)
    order = np.argsort(tok.x1[m], kind="stable")
    m = m[order]
    return Line(
        page=page,
        x1=int(tok.x1[m].min()),
        y1=int(tok.y1[m].min()),
        x2=int(tok.x2[m].max()),
        y2=int(tok.y2[m].max()),
        idx=m,
        line_id=line_id,
    )


def build_lines(tok: TokenArrays) -> List[Line]:
    n = len(tok)
    if n == 0:
        return []

    if any(tok.line_id[i] is not None for i in range(n)):
        groups: Dict[Tuple[int, str], List[int]] = {}
        yc = (tok.y1 + tok.y2) / 2.0
        for i in range(n):
            lid = tok.line_id[i]
            if not lid:
                lid = f"inferred_{int(tok.page[i])}_{int(yc[i])}"
            groups.setdefault((int(tok.page[i]), lid), []).append(i)
        lines = [
            _finish(tok, page, members, line_id=lid)
            for (page, lid), members in groups.items()
        ]
        lines.sort(key=lambda L: (L.page, L.y1, L.x1))
        return lines

    # overlap-inference branch
    yc = (tok.y1 + tok.y2) / 2.0
    order = np.lexsort((tok.x1, yc, tok.page))  # sort by (page, yc, x1), stable

    lines: List[Line] = []
    current: List[int] = []
    first = int(order[0])
    cur_page = int(tok.page[first])
    band_lo, band_hi = int(tok.y1[first]), int(tok.y2[first])

    for i in order:
        i = int(i)
        if int(tok.page[i]) != cur_page:
            if current:
                lines.append(_finish(tok, cur_page, current))
            current = [i]
            cur_page = int(tok.page[i])
            band_lo, band_hi = int(tok.y1[i]), int(tok.y2[i])
            continue
        t_lo, t_hi = int(tok.y1[i]), int(tok.y2[i])
        inter = max(0, min(band_hi, t_hi) - max(band_lo, t_lo))
        denom = max(1, min(band_hi - band_lo, t_hi - t_lo))
        if inter / denom >= 0.5:
            current.append(i)
            band_lo = min(band_lo, t_lo)
            band_hi = max(band_hi, t_hi)
        else:
            if current:
                lines.append(_finish(tok, cur_page, current))
            current = [i]
            band_lo, band_hi = t_lo, t_hi

    if current:
        lines.append(_finish(tok, cur_page, current))

    lines.sort(key=lambda L: (L.page, L.y1, L.x1))
    return lines
