"""Statistics aggregations (SURVEY A1-A7) — all native Spark SQL.

Mirrors result_processor.py:53-100 (per-document statistics),
result_processor.py:169-211 (cross-document summary report) and
matching/types.py:56-72 (extraction statistics). Rounding uses the
explicit half-up formula shared with the DuckDB oracle so averages are
bit-identical across engines (see functions.geometry.round_half_up).

Two-level rollups are two explicit groupBys (per-url, then global) — the
per-class and per-page breakdowns stay relational (groupBy rows) and are
only folded into maps at the JSON edge, which keeps every aggregation
map-side-combinable at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geometry import round_half_up


def page_detection_counts(det: DataFrame) -> DataFrame:
    """A1: per (url, page_no) detection count (by_page / num_detections)."""
    return det.groupBy("url", "page_no").agg(
        F.count("*").alias("num_detections")
    )


def class_stats(det: DataFrame, per_url: bool = False) -> DataFrame:
    """A2+A3: count and average confidence (4 dp) by class."""
    keys = (["url"] if per_url else []) + ["class_name"]
    return det.groupBy(*keys).agg(
        F.count("*").alias("n_detections"),
        round_half_up(F.avg("confidence"), 4).alias("avg_confidence"),
    )


def doc_stats(det: DataFrame, total_pages: DataFrame | None = None) -> DataFrame:
    """A4: per-document totals. ``average_detections_per_page`` divides by
    the page count (result_processor.py:97-99); pages with zero detections
    never appear in ``det``, so callers that need exact parity with the
    reference (which counts all rasterized pages) pass ``total_pages``
    (url, total_pages) from the probe. Falls back to countDistinct(page_no).
    """
    agg = det.groupBy("url").agg(
        F.count("*").alias("total_detections"),
        F.countDistinct("page_no").alias("pages_seen"),
    )
    if total_pages is not None:
        agg = agg.join(total_pages, "url")
        pages_col = F.col("total_pages")
    else:
        agg = agg.withColumn("total_pages", F.col("pages_seen"))
        pages_col = F.col("total_pages")
    return agg.select(
        "url",
        "total_pages",
        "total_detections",
        F.when(pages_col > 0,
               round_half_up(F.col("total_detections") / pages_col, 2))
        .otherwise(F.lit(0.0))
        .alias("average_detections_per_page"),
    )


def summary_report(doc_stats_df: DataFrame) -> DataFrame:
    """A5: global rollup (result_processor.py:169-211) — one row."""
    return doc_stats_df.agg(
        F.count("*").alias("total_documents"),
        F.sum("total_pages").alias("total_pages"),
        F.sum("total_detections").alias("total_detections"),
    ).select(
        "total_documents",
        "total_pages",
        "total_detections",
        F.when(F.col("total_pages") > 0,
               round_half_up(F.col("total_detections") / F.col("total_pages"), 2))
        .otherwise(F.lit(0.0))
        .alias("average_detections_per_page"),
    )


def extraction_stats(matched: DataFrame) -> DataFrame:
    """A6: per (url, item_type): total items and items with captions.
    The reference counts truthy caption_text (types.py:56-58), so an empty
    extracted string does NOT count as captioned."""
    has_caption = F.col("caption_text").isNotNull() & (F.col("caption_text") != "")
    return matched.groupBy("url", "item_type").agg(
        F.count("*").alias("total_items"),
        F.count(F.when(has_caption, 1)).alias("items_with_captions"),
    )
