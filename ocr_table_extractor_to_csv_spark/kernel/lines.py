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


def _finish_lists(
    x1l: List[int], y1l: List[int], x2l: List[int], y2l: List[int],
    page: int, members: List[int], line_id=None,
) -> Line:
    # python-level sort/min/max: members are ~tens of ints, where list ops
    # beat numpy scalar extraction by ~5x
    members = sorted(members, key=x1l.__getitem__)
    return Line(
        page=page,
        x1=x1l[members[0]],  # members are x1-sorted: min(x1) is the first
        y1=min(map(y1l.__getitem__, members)),
        x2=max(map(x2l.__getitem__, members)),
        y2=max(map(y2l.__getitem__, members)),
        idx=np.asarray(members, dtype=np.int64),
        line_id=line_id,
    )


def build_lines(tok: TokenArrays) -> List[Line]:
    n = len(tok)
    if n == 0:
        return []

    x1l = tok.x1.tolist()
    y1l = tok.y1.tolist()
    x2l = tok.x2.tolist()
    y2l = tok.y2.tolist()
    pagel = tok.page.tolist()

    if any(lid is not None for lid in tok.line_id):
        groups: Dict[Tuple[int, str], List[int]] = {}
        for i in range(n):
            lid = tok.line_id[i]
            if not lid:
                lid = f"inferred_{pagel[i]}_{int((y1l[i] + y2l[i]) / 2.0)}"
            groups.setdefault((pagel[i], lid), []).append(i)
        lines = [
            _finish_lists(x1l, y1l, x2l, y2l, page, members, line_id=lid)
            for (page, lid), members in groups.items()
        ]
        lines.sort(key=lambda L: (L.page, L.y1, L.x1))
        return lines

    # overlap-inference branch; sort by (page, yc, x1), stable
    yc = (tok.y1 + tok.y2) / 2.0
    order = np.lexsort((tok.x1, yc, tok.page)).tolist()

    lines: List[Line] = []
    first = order[0]
    current: List[int] = []
    cur_page = pagel[first]
    band_lo, band_hi = y1l[first], y2l[first]

    for i in order:
        if pagel[i] != cur_page:
            if current:
                lines.append(_finish_lists(x1l, y1l, x2l, y2l, cur_page, current))
            current = [i]
            cur_page = pagel[i]
            band_lo, band_hi = y1l[i], y2l[i]
            continue
        t_lo, t_hi = y1l[i], y2l[i]
        # inline conditionals: 2 builtin min/max calls per token measurably
        # show up at 40k tokens/doc
        inter = (band_hi if band_hi < t_hi else t_hi) - (
            band_lo if band_lo > t_lo else t_lo
        )
        bh = band_hi - band_lo
        th = t_hi - t_lo
        denom = bh if bh < th else th
        if denom < 1:
            denom = 1
        if inter > 0 and inter / denom >= 0.5:
            current.append(i)
            if t_lo < band_lo:
                band_lo = t_lo
            if t_hi > band_hi:
                band_hi = t_hi
        else:
            if current:
                lines.append(_finish_lists(x1l, y1l, x2l, y2l, cur_page, current))
            current = [i]
            band_lo, band_hi = t_lo, t_hi

    if current:
        lines.append(_finish_lists(x1l, y1l, x2l, y2l, cur_page, current))

    lines.sort(key=lambda L: (L.page, L.y1, L.x1))
    return lines
