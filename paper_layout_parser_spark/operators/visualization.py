"""Visualization draw-spec generation (SURVEY P13 —
src/doclayout/visualization/renderer.py:53-146, styles.py:11-47,108-177).

The reference draws rectangles + labels onto page images with cv2. The
image libraries aren't in this container, so the Spark rebuild splits the
stage the scale-correct way anyway:

  1. ``draw_spec``  — NATIVE: per detection, the complete draw command
     (color from the class palette as a literal map, label text per the
     chosen strategy, rect + label-anchor geometry). This is 99% of the
     reference renderer's logic and is pure column expressions.
  2. rasterizing the spec onto pixels — a pandas-UDF paint step over the
     page image binary, stubbed here (same posture as multimodal.decode).

Color/label tables are lifted from styles.py (BGR tuples packed as a single
int for a compact column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import lit

# styles.py:11-31 (BGR), packed as b<<16 | g<<8 | r
DEFAULT_COLORS: dict[str, tuple[int, int, int]] = {
    "Title": (128, 0, 128),
    "Plain-Text": (0, 180, 0),
    "Text": (0, 255, 255),
    "Abandon": (64, 64, 64),
    "Figure": (0, 255, 0),
    "Figure-Caption": (0, 200, 255),
    "Table": (255, 0, 0),
    "Table-Caption": (255, 100, 0),
    "Table-Footnote": (128, 128, 128),
    "Formula": (255, 0, 255),
    "Isolate-Formula": (255, 0, 255),
    "Formula-Caption": (200, 0, 200),
    "Caption": (0, 165, 255),
    "Footnote": (128, 128, 128),
}
DEFAULT_COLOR = (0, 255, 0)  # styles.py default

# styles.py:42-47
ANNOTATION_PREFIXES = {"figure": "F", "table": "T", "caption": "C"}


def _pack(bgr: tuple[int, int, int]) -> int:
    b, g, r = bgr
    return (b << 16) | (g << 8) | r


def class_color(col) -> "F.Column":
    """Literal palette lookup (element_at over a map literal — P10 shape)."""
    entries = []
    for name, bgr in DEFAULT_COLORS.items():
        entries.extend([lit(name), lit(_pack(bgr))])
    palette = F.create_map(*entries)
    return F.coalesce(F.element_at(palette, col), lit(_pack(DEFAULT_COLOR)))


def draw_spec(det: DataFrame, label_strategy: str = "class_confidence") -> DataFrame:
    """One draw command per detection.

    label strategies (renderer.py / styles.py:108-177):
      * 'class_confidence' — "Figure 0.95" (the default renderer label)
      * 'numbered'         — "F1" / "T2" per-page counters (annotation mode)
    """
    base = det.select(
        "url", "page_no", "det_idx", "class_name",
        "x1", "y1", "x2", "y2", "confidence",
        class_color(F.col("class_name")).alias("color_bgr"),
    )
    if label_strategy == "class_confidence":
        label = F.format_string("%s %.2f", F.col("class_name"), F.col("confidence"))
    elif label_strategy == "numbered":
        from pyspark.sql import Window

        kind = (
            F.when(F.col("class_name") == "Figure", "figure")
            .when(F.col("class_name") == "Table", "table")
            .when(F.col("class_name").contains("Caption"), "caption")
        )
        prefix_entries = []
        for k, v in ANNOTATION_PREFIXES.items():
            prefix_entries.extend([lit(k), lit(v)])
        prefixes = F.create_map(*prefix_entries)
        w = Window.partitionBy("url", "page_no", kind).orderBy("det_idx")
        base = base.withColumn("kind", kind).where(F.col("kind").isNotNull())
        label = F.concat(
            F.element_at(prefixes, F.col("kind")),
            F.row_number().over(w).cast("string"),
        )
    else:
        raise ValueError(f"unknown label strategy {label_strategy!r}")
    return base.withColumn("label", label).withColumn(
        # label anchor: above the box unless clipped at the top (renderer
        # convention), as plain geometry
        "label_y", F.when(F.col("y1") >= 20, F.col("y1") - 5).otherwise(F.col("y1") + 15)
    )


def render_overlays(spec_with_payload: DataFrame, strict: bool = True) -> DataFrame:
    """The pixel paint step — requires cv2/Pillow (not in this container).
    Kept as an explicit NotImplementedError so the draw-spec stage's output
    contract is visible; a cluster deployment implements the paint UDF."""

    def run(it):
        raise NotImplementedError(
            "overlay painting requires cv2/Pillow; consume draw_spec rows "
            "with a paint UDF on a cluster with image libs"
        )

    if strict:
        return spec_with_payload.mapInPandas(run, schema=spec_with_payload.schema)
    return spec_with_payload
