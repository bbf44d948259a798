"""Single-process reference-algorithm oracle, used ONLY by tests.

A direct semantic port of the reference's per-page functions
(/root/reference/src/doclayout/matching/caption_matcher.py:43-199 and
benchmarks/caption_evaluator/evaluator.py:121-216) so the distributed
implementation can be asserted equal on randomized inputs, including the
greedy chain cases where rank-both-sides heuristics diverge.
"""

from __future__ import annotations

INF = float("inf")


def horizontal_overlap(a: dict, b: dict) -> float:
    overlap = max(0.0, min(a["x2"], b["x2"]) - max(a["x1"], b["x1"]))
    min_width = min(a["x2"] - a["x1"], b["x2"] - b["x1"])
    if min_width <= 0:
        return 0.0
    return overlap / min_width


def vertical_distance(item: dict, cap: dict, direction: str) -> tuple[float, bool]:
    dist_below = cap["y1"] - item["y2"]
    dist_above = item["y1"] - cap["y2"]
    if direction == "below":
        return abs(dist_below), dist_below >= 0
    if direction == "above":
        return abs(dist_above), dist_above >= 0
    if dist_below >= 0:
        return dist_below, True
    if dist_above >= 0:
        return dist_above, True
    return 0.0, True


def is_valid_match(item: dict, cap: dict, direction: str,
                   max_vertical_distance: float = 100.0,
                   min_horizontal_overlap: float = 0.3) -> tuple[bool, float]:
    dist, ok = vertical_distance(item, cap, direction)
    if not ok or dist > max_vertical_distance:
        return False, INF
    if horizontal_overlap(item, cap) < min_horizontal_overlap:
        return False, INF
    return True, dist


def match_items_to_captions(items: list[dict], captions: list[dict],
                            direction: str,
                            max_vertical_distance: float = 100.0,
                            min_horizontal_overlap: float = 0.3
                            ) -> list[tuple[dict, dict | None]]:
    """Greedy matching exactly as caption_matcher.py:133-199."""
    if not items:
        return []
    if not captions:
        return [(item, None) for item in items]
    matches = []
    for item in items:
        for cap in captions:
            ok, dist = is_valid_match(item, cap, direction,
                                      max_vertical_distance, min_horizontal_overlap)
            if ok:
                matches.append((item, cap, dist))
    matches.sort(key=lambda t: t[2])
    used_items: set[int] = set()
    used_caps: set[int] = set()
    assigned: dict[int, dict] = {}
    for item, cap, _ in matches:
        if id(item) not in used_items and id(cap) not in used_caps:
            assigned[id(item)] = cap
            used_items.add(id(item))
            used_caps.add(id(cap))
    return [(item, assigned.get(id(item))) for item in items]


def iou(a: dict, b: dict) -> float:
    x1, y1 = max(a["x1"], b["x1"]), max(a["y1"], b["y1"])
    x2, y2 = min(a["x2"], b["x2"]), min(a["y2"], b["y2"])
    if x2 <= x1 or y2 <= y1:
        return 0.0
    inter = (x2 - x1) * (y2 - y1)
    area_a = (a["x2"] - a["x1"]) * (a["y2"] - a["y1"])
    area_b = (b["x2"] - b["x1"]) * (b["y2"] - b["y1"])
    union = area_a + area_b - inter
    if union <= 0:
        return 0.0
    return inter / union
