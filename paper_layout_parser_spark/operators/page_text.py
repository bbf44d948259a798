"""Per-region clipped text + XY-cut reading order, fused in one cogrouped
pass (P7 + O6 of SURVEY §2.10).

Design note (scale): the page text layer is the page's heaviest column. A
naive plan joins it onto every detection row (~8x duplication through the
shuffle). Instead we cogroup detections with pages on (url, page_no) —
``df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas`` — so each page
payload crosses the wire exactly once and the per-page Python work (tiny
groups) does both the clipped-text extraction (figure_extractor.py:89-106)
and the reading-order ranking in a single Arrow round-trip.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame

from ..algorithms import clip_text, xy_cut_order

ENRICHED_SCHEMA = (
    "url string, page_no int, width int, height int, det_idx int, "
    "class_id int, class_name string, confidence double, "
    "x1 double, y1 double, x2 double, y2 double, "
    "reading_order_rank int, text string"
)


def _process_pages(dets: pd.DataFrame, pages: pd.DataFrame) -> pd.DataFrame:
    """Cogroup function: all detections of one (url, page_no) plus the page
    row. Emits detections + reading_order_rank + clipped text."""
    if dets.empty:
        return pd.DataFrame(
            columns=[c.split()[0] for c in ENRICHED_SCHEMA.split(", ")]
        )
    if pages.empty:
        blocks: list[dict] = []
    else:
        payload = json.loads(bytes(pages["page_payload"].iloc[0]))
        blocks = payload["blocks"]

    dets = dets.sort_values("det_idx", kind="stable").reset_index(drop=True)
    boxes = list(zip(dets["x1"], dets["y1"], dets["x2"], dets["y2"]))
    order = xy_cut_order(boxes)
    ranks = [0] * len(order)
    for rank, pos in enumerate(order):
        ranks[pos] = rank
    texts = [clip_text(blocks, *box) for box in boxes]
    out = dets.copy()
    out["reading_order_rank"] = ranks
    out["text"] = texts
    return out


def enrich_detections(det: DataFrame, rasterized_pages: DataFrame) -> DataFrame:
    """detections x pages -> detections + (reading_order_rank, text).

    ``det``: output of normalize_detections.
    ``rasterized_pages``: output of rasterize (url, page_no, ..., page_payload).
    """
    pages = rasterized_pages.select("url", "page_no", "page_payload")
    return (
        det.groupBy("url", "page_no")
        .cogroup(pages.groupBy("url", "page_no"))
        .applyInPandas(_process_pages, schema=ENRICHED_SCHEMA)
    )
