"""Pure-Python per-page algorithms shared by the Spark UDFs and the test
oracle: recursive XY-cut reading order, clipped text extraction, and the
reference's greedy caption assignment.

These run on O(10)-row groups inside Arrow-batched UDFs; keeping them here
(dependency-free) means the oracle and the distributed path execute the
*same* bytes, and byte-identity failures can only come from orchestration.
"""

from __future__ import annotations


# ---------------------------------------------------------------------------
# XY-cut reading order (O6 — a rebuild extension the north star requires;
# the reference keeps model output order, layout_detector.py:171-193)
# ---------------------------------------------------------------------------

def _merge_intervals(intervals: list[tuple[float, float]]) -> list[tuple[float, float]]:
    """Merge overlapping-or-touching intervals; result sorted by start."""
    out: list[list[float]] = []
    for a, b in sorted(intervals):
        if out and a <= out[-1][1]:
            out[-1][1] = max(out[-1][1], b)
        else:
            out.append([a, b])
    return [(a, b) for a, b in out]


def _split_bands(idxs: list[int], lo: list[float], hi: list[float]) -> list[list[int]]:
    """Partition boxes into >=2 bands separated by strictly positive gaps in
    the chosen projection, else return a single band."""
    merged = _merge_intervals([(lo[i], hi[i]) for i in idxs])
    if len(merged) <= 1:
        return [idxs]
    bands: list[list[int]] = [[] for _ in merged]
    for i in idxs:
        for k, (a, b) in enumerate(merged):
            if lo[i] >= a and hi[i] <= b:
                bands[k].append(i)
                break
    return bands


def xy_cut_order(boxes: list[tuple[float, float, float, float]]) -> list[int]:
    """Return the positions of ``boxes`` (x1, y1, x2, y2) in reading order.

    Recursive XY-cut: split by horizontal whitespace bands first (top to
    bottom), then by vertical bands (left to right); a leaf that admits no
    cut is ordered by (y1, x1, input position) — deterministic for any tie.
    """
    x1 = [b[0] for b in boxes]
    y1 = [b[1] for b in boxes]
    x2 = [b[2] for b in boxes]
    y2 = [b[3] for b in boxes]
    order: list[int] = []

    def rec(idxs: list[int]) -> None:
        if len(idxs) <= 1:
            order.extend(idxs)
            return
        bands = _split_bands(idxs, y1, y2)
        if len(bands) > 1:
            for band in bands:
                rec(band)
            return
        cols = _split_bands(idxs, x1, x2)
        if len(cols) > 1:
            for col in cols:
                rec(col)
            return
        order.extend(sorted(idxs, key=lambda i: (y1[i], x1[i], i)))

    rec(list(range(len(boxes))))
    return order


# ---------------------------------------------------------------------------
# clipped text extraction (P7 — figure_extractor.py:89-106:
# page.get_text("text", clip=rect).strip())
# ---------------------------------------------------------------------------

def clip_text(blocks: list[dict], x1: float, y1: float, x2: float, y2: float) -> str:
    """Text of all source blocks with positive-area intersection with the
    clip rect, in block order, newline-joined, stripped — the stub analogue
    of PyMuPDF's clipped text extraction."""
    parts = []
    for blk in blocks:
        bx1, by1, bx2, by2 = blk["bbox"]
        if min(x2, bx2) > max(x1, bx1) and min(y2, by2) > max(y1, by1):
            parts.append(blk["text"])
    return "\n".join(parts).strip()


# ---------------------------------------------------------------------------
# greedy caption assignment (J2 — caption_matcher.py:175-191)
# ---------------------------------------------------------------------------

def greedy_assign(pairs: list[tuple[int, int, float]]) -> dict[int, int]:
    """pairs: (item_key, caption_key, distance) in item-major enumeration
    order. Returns {item_key: caption_key} replicating the reference greedy:
    stable sort by distance (ties keep item-major order), take a pair iff
    neither side is used yet."""
    used_items: set[int] = set()
    used_caps: set[int] = set()
    result: dict[int, int] = {}
    for item, cap, _ in sorted(pairs, key=lambda t: t[2]):
        if item not in used_items and cap not in used_caps:
            result[item] = cap
            used_items.add(item)
            used_caps.add(cap)
    return result
