"""VLM request/payload construction (SURVEY §3.2 — the piece the annotate
stage previously delegated wholly to the pluggable client).

Re-expresses, as native column expressions over the detections table:

  * prompt templates, both modes — verbatim from
    benchmarks/vlm_annotator/prompts.py:12-76 (detection mode) and
    :40-45,150-200 (direct mode). The template text IS the artifact
    (exactly like the report layouts in operators/report.py): a rebuild
    that wants the same VLM behavior must send the same words.
  * element classification + per-type numbering — annotator.py:159-161
    (class sets) and :640-672 (split by detection order, ids 1..n per
    type, pre-extracted caption text);
  * ``format_elements_description`` — prompts.py:79-123 (per-type
    header lines, ``{x:.0f}`` positions, 50-char caption preview with
    ``[no text]`` fallback);
  * the vision message payload — litellm_client.py:309-330 (base64 data
    URL + system/user prompt pair).

Spark shape: everything up to the HTTP call is a relational projection —
classification is a ``when`` chain, numbering is a per-(page, kind)
``row_number`` ordered by detection order, the description is a grouped
``array_sort(collect_list(...))`` fold bounded by a single page's
detections, and Python's ``:.0f`` (round-half-even) is ``bround``. The
actual request dict is assembled per batch inside the client UDF
(``request_payload``) — the network edge is the only non-relational step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# --- class sets: annotator.py:159-161 ---
FIGURE_CLASSES = ("Figure",)
TABLE_CLASSES = ("Table",)
CAPTION_CLASSES = ("Figure-Caption", "Table-Caption",
                   "Figure-caption", "Table-caption")

# --- prompt templates: prompts.py:12-34 / :40-45 / :48-76 / :150-200 ---
SYSTEM_PROMPT = """You are an expert document analysis assistant specialized in \
understanding academic papers and technical documents. Your task is to analyze \
document pages and identify which captions belong to which figures or tables.

You will receive:
1. An image of a document page with annotated bounding boxes
2. Information about the detected elements

The bounding boxes are color-coded and labeled:
- GREEN boxes labeled F1, F2, F3... are FIGURES (images, charts, diagrams)
- BLUE boxes labeled T1, T2, T3... are TABLES
- ORANGE boxes labeled C1, C2, C3... are CAPTIONS (figure captions, table captions)

Your task is to determine which caption (C#) corresponds to which figure (F#) or table (T#).

Guidelines for matching:
1. Captions are typically positioned directly below or above their corresponding figure/table
2. Caption text usually starts with "Figure X", "Fig. X", "Table X", or "Tab. X"
3. The caption content should semantically relate to the figure/table it describes
4. A figure/table may have no caption (especially if it spans multiple pages)
5. A caption may have no corresponding figure/table (if the figure is on another page)

Be conservative: if you're not confident about a match, indicate lower confidence."""

DIRECT_SYSTEM_PROMPT = """You are a document analysis expert. Your task is to analyze \
document pages to identify all Figures, Tables, and their Captions, then establish \
matching relationships between them.

You work directly with raw document page images without any pre-processing or detection.
Your analysis serves as ground truth for evaluating automated detection systems."""

_USER_PROMPT_PREFIX = """Analyze this document page and match figures/tables to their captions.

Detected elements on this page:
"""

_USER_PROMPT_SUFFIX = """

Please respond with a JSON object containing:
1. "matches": array of objects with:
   - "figure_id": the figure number (1 for F1, 2 for F2, etc.) or null
   - "figure_type": "figure" or "table"
   - "caption_id": the caption number (1 for C1, 2 for C2, etc.) or null if no match
   - "confidence": your confidence level (0.0 to 1.0)
   - "reasoning": brief explanation of why you made this match

2. "unmatched_captions": array of caption IDs that don't match any figure/table on this page

Example response:
{
  "matches": [
    {"figure_id": 1, "figure_type": "figure", "caption_id": 1, "confidence": 0.95,
      "reasoning": "C1 is directly below F1 and starts with 'Figure 1'"},
    {"figure_id": 2, "figure_type": "figure", "caption_id": null, "confidence": 0.8,
      "reasoning": "F2 appears to be a continuation, caption likely on previous page"},
    {"figure_id": 1, "figure_type": "table", "caption_id": 2, "confidence": 0.9,
      "reasoning": "C2 is above T1 and says 'Table 1'"}
  ],
  "unmatched_captions": [3]
}

Respond ONLY with the JSON object, no additional text."""

DIRECT_USER_PROMPT = """Analyze this document page and complete the following tasks:

1. Identify all visual elements:
   - Figure: images, charts, diagrams, plots, photographs, illustrations, etc.
   - Table: data tables with rows and columns
   - Caption: figure or table captions (typically starting with "Figure X", "Fig. X", \
"Table X", "Tab. X", or similar patterns)

2. For each element, provide its bounding box:
   - Use normalized coordinates in range 0-1000
   - Format: {"x1": left, "y1": top, "x2": right, "y2": bottom}
   - Coordinates are relative to image dimensions (0=top/left edge, 1000=bottom/right edge)

3. Establish matching relationships:
   - Pair each Figure/Table with its corresponding Caption
   - If a Figure/Table has no Caption on this page, mark it as unmatched
   - If a Caption has no corresponding Figure/Table on this page, mark it as unmatched

Important guidelines:
- Captions are typically positioned directly below or above their corresponding figure/table
- Caption text usually contains a numbering pattern like "Figure 1", "Fig. 1", "Table 1"
- Be thorough: identify ALL figures, tables, and captions on the page
- Be accurate: only create matches when you are confident about the relationship
- Provide accurate bounding boxes that tightly enclose each element

Output in JSON format:
{
  "elements": [
    {"id": 1, "type": "figure", "description": "Bar chart showing experimental results", "bbox": {"x1": 100, "y1": 150, "x2": 900, "y2": 500}},
    {"id": 2, "type": "caption", "text": "Figure 1: Experimental results comparison", "bbox": {"x1": 100, "y1": 510, "x2": 900, "y2": 550}},
    {"id": 3, "type": "table", "description": "Data summary table with 5 columns", "bbox": {"x1": 50, "y1": 600, "x2": 950, "y2": 850}},
    {"id": 4, "type": "caption", "text": "Table 1: Summary of experimental data", "bbox": {"x1": 50, "y1": 860, "x2": 950, "y2": 900}}
  ],
  "matches": [
    {"figure_id": 1, "figure_type": "figure", "caption_id": 2},
    {"figure_id": 3, "figure_type": "table", "caption_id": 4}
  ],
  "unmatched_figures": [],
  "unmatched_tables": [],
  "unmatched_captions": []
}

Notes:
- Element IDs should be unique integers starting from 1
- Each element MUST include a "bbox" field with normalized coordinates (0-1000)
- In "matches", figure_id refers to the element ID of a figure or table
- In "matches", figure_type should be "figure" or "table"
- In "matches", caption_id refers to the element ID of the matched caption
- Unmatched lists contain element IDs of items without matches on this page

Respond ONLY with the JSON object, no additional text."""

_HEADERS = {
    "figure": "FIGURES (green boxes):",
    "table": "TABLES (blue boxes):",
    "caption": "CAPTIONS (orange boxes):",
}


def classify_elements(detections: DataFrame) -> DataFrame:
    """Detections -> VLM elements: kind ('figure'/'table'/'caption'),
    per-(page, kind) id numbered 1..n in DETECTION ORDER (annotator.py's
    ``enumerate`` over the per-page split, :655-667 — det_idx is that
    order), caption text carried from the fused clipped-text extraction
    (the reference pre-extracts it at annotator.py:532-555)."""
    kind = (
        F.when(F.col("class_name").isin(*FIGURE_CLASSES), "figure")
        .when(F.col("class_name").isin(*TABLE_CLASSES), "table")
        .when(F.col("class_name").isin(*CAPTION_CLASSES), "caption")
    )
    elems = detections.withColumn("kind", kind).where(F.col("kind").isNotNull())
    w = Window.partitionBy("url", "page_no", "kind").orderBy("det_idx")
    return elems.withColumn("elem_id", F.row_number().over(w))


def _fmt0(col):
    """Python's ``{v:.0f}`` — round-half-even to an integer string
    (``bround``; the reference formats positions through f-strings,
    prompts.py:101,107,118). Coordinates are clamped to >= 0 first — a
    DELIBERATE DIVERGENCE from the reference, which feeds raw values
    through the f-string (a -2.0 prints '-2' there, '0' here; a value in
    (-0.5, 0) prints the artifact '-0' there, '0' here). This engine's
    own detection path only emits page-clipped non-negative boxes, so
    the divergence is unreachable on pipeline output; the clamp exists
    for caller-supplied detection tables, where a silently negative
    prompt coordinate is a data bug we'd rather normalize at the 0
    boundary than format. NULL stays NULL (greatest skips nulls, which
    would fabricate a plausible-looking 0 for a missing coordinate —
    guard it)."""
    return F.when(
        col.isNotNull(), F.bround(F.greatest(col, F.lit(0.0)), 0)
    ).cast("long")


def elements_description(detections: DataFrame) -> DataFrame:
    """prompts.py:79-123 as one grouped projection -> (url, page_no,
    elements_description, n_figures, n_tables, n_captions). Pages with no
    classified elements produce no row (the annotate stage short-circuits
    them before the API anyway — F7)."""
    e = classify_elements(detections)
    preview = F.when(
        F.length(F.coalesce(F.col("text"), F.lit(""))) > 50,
        F.concat(F.substring(F.col("text"), 1, 50), F.lit("...")),
    ).otherwise(
        F.when(F.coalesce(F.col("text"), F.lit("")) == "", "[no text]")
        .otherwise(F.col("text"))
    )
    line = (
        F.when(F.col("kind") == "figure", F.format_string(
            "  - F%d: at position (%d, %d)",
            F.col("elem_id"), _fmt0(F.col("x1")), _fmt0(F.col("y1"))))
        .when(F.col("kind") == "table", F.format_string(
            "  - T%d: at position (%d, %d)",
            F.col("elem_id"), _fmt0(F.col("x1")), _fmt0(F.col("y1"))))
        .otherwise(F.format_string(
            '  - C%d: "%s" at (%d, %d)',
            F.col("elem_id"), preview, _fmt0(F.col("x1")), _fmt0(F.col("y1"))))
    )
    blocks = (
        e.groupBy("url", "page_no", "kind")
        .agg(F.array_sort(F.collect_list(F.struct("elem_id", line.alias("line"))))
             .alias("ls"))
        .select(
            "url", "page_no", "kind", F.size("ls").alias("n"),
            # header then item lines, in detection order
            F.array_join(
                F.concat(
                    F.array(F.element_at(
                        F.create_map(*[F.lit(x) for kv in _HEADERS.items()
                                       for x in kv]),
                        F.col("kind"))),
                    F.transform(F.col("ls"), lambda s: s["line"]),
                ),
                "\n",
            ).alias("block"),
        )
    )
    pivoted = blocks.groupBy("url", "page_no").agg(*[
        F.max(F.when(F.col("kind") == k, F.col("block"))).alias(f"__b_{k}")
        for k in _HEADERS
    ], *[
        F.coalesce(F.max(F.when(F.col("kind") == k, F.col("n"))), F.lit(0))
        .cast("int").alias(f"n_{k}s")
        for k in _HEADERS
    ])
    return pivoted.select(
        "url", "page_no",
        # prompts.py:95-123: blocks appended in figure/table/caption order;
        # concat_ws skips the kinds absent from the page
        F.concat_ws("\n", "__b_figure", "__b_table", "__b_caption")
        .alias("elements_description"),
        "n_figures", "n_tables", "n_captions",
    )


def build_vlm_requests(
    detections: DataFrame,
    rasterized: DataFrame,
    mode: str = "detection",
    media_type: str = "image/png",
) -> DataFrame:
    """The complete per-page VLM request surface, ready for any client:
    (url, page_no, system_prompt, user_prompt, image_media_type,
    image_data_url).

    ``mode='detection'`` (annotator.py:489-599 + litellm_client.py:278-330):
    pages carrying at least one figure or table (the F7 short-circuit,
    annotator.py:674-680), user prompt = template around the formatted
    elements description. ``mode='direct'`` (annotator.py:194-303 +
    litellm_client.py:380-423): every page, constant prompts.

    The data URL is ``data:<media_type>;base64,<image>`` exactly as
    litellm_client.py:322-326 builds it; the page payload stands in for
    the rendered PNG in this sandbox (P10's suffix->MIME lookup collapses
    to a parameter in the table-native design — pages are not files)."""
    data_url = F.concat(
        F.lit(f"data:{media_type};base64,"), F.base64(F.col("page_payload"))
    )
    pages = rasterized.select("url", "page_no", data_url.alias("image_data_url"))
    if mode == "direct":
        return pages.select(
            "url", "page_no",
            F.lit(DIRECT_SYSTEM_PROMPT).alias("system_prompt"),
            F.lit(DIRECT_USER_PROMPT).alias("user_prompt"),
            F.lit(media_type).alias("image_media_type"),
            "image_data_url",
        )
    if mode != "detection":
        raise ValueError(f"unknown mode {mode!r}")
    desc = elements_description(detections)
    eligible = desc.where((F.col("n_figures") > 0) | (F.col("n_tables") > 0))
    return eligible.join(pages, ["url", "page_no"]).select(
        "url", "page_no",
        F.lit(SYSTEM_PROMPT).alias("system_prompt"),
        F.concat(F.lit(_USER_PROMPT_PREFIX), F.col("elements_description"),
                 F.lit(_USER_PROMPT_SUFFIX)).alias("user_prompt"),
        F.lit(media_type).alias("image_media_type"),
        "image_data_url",
    )


def request_payload(system_prompt: str, user_prompt: str,
                    image_data_url: str, model: str,
                    max_tokens: int = 4096,
                    temperature: float = 0.0) -> dict:
    """The completion-call kwargs dict exactly as litellm_client.py:316-338
    assembles them — the one Python-side step, run per request inside the
    client UDF at the network edge."""
    return {
        "model": model,
        "messages": [
            {"role": "system", "content": system_prompt},
            {
                "role": "user",
                "content": [
                    {"type": "image_url",
                     "image_url": {"url": image_data_url}},
                    {"type": "text", "text": user_prompt},
                ],
            },
        ],
        "max_tokens": max_tokens,
        "temperature": temperature,
    }
