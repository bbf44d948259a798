"""File-based benchmark evaluation pipeline — the Spark twin of the
reference's ``python -m benchmarks evaluate`` flow (benchmarks/cli.py +
caption_evaluator/batch.py:94-214).

Reference flow: dataset.json manifest -> per-document
caption_annotations.json (ground truth, dataset.py:88-120) + resolved
predictions file (extraction_metadata.json / result.json,
batch.py:216-242) -> per-doc evaluation -> cross-doc rollup -> JSON +
Markdown reports (reporter.py).

Spark shape: the manifest's document list is a DataFrame; annotation and
prediction JSONs are read with ``spark.read.json`` under EXPLICIT schemas
(multiline documents); everything downstream is the same relational
evaluator (operators.evaluate) the in-memory path uses — one code path for
metrics no matter where the inputs came from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BBOX = "struct<x1: double, y1: double, x2: double, y2: double>"

GT_FILE_SCHEMA = (
    f"pdf_name string, annotator string, pages array<struct<"
    f"page_number int, matches array<struct<"
    f"figure_id string, figure_type string, figure_bbox {_BBOX}, "
    f"caption_id string, caption_bbox {_BBOX}, caption_text string, "
    f"confidence double>>>>"
)

_PRED_ITEM = (
    f"struct<id string, page_number int, item_bbox {_BBOX}, "
    f"caption_bbox {_BBOX}>"
)
PRED_FILE_SCHEMA = (
    f"figures array<{_PRED_ITEM}>, tables array<{_PRED_ITEM}>"
)


def load_ground_truth_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    """caption_annotations.json files -> GT rows in compare_matches shape
    (url = pdf_name). Explicit schema + multiLine (the files are
    indent-2 JSON documents, not JSON-lines)."""
    raw = spark.read.schema(GT_FILE_SCHEMA).option("multiLine", True).json(paths)
    pages = raw.select(
        F.col("pdf_name").alias("url"), F.explode("pages").alias("pg")
    )
    m = pages.select("url", F.col("pg.page_number").alias("page_number"),
                     F.explode("pg.matches").alias("m"))
    return m.select(
        "url",
        F.col("m.figure_id").alias("figure_id"),
        F.col("m.figure_type").alias("figure_type"),
        "page_number",
        F.col("m.figure_bbox.x1").alias("gt_x1"),
        F.col("m.figure_bbox.y1").alias("gt_y1"),
        F.col("m.figure_bbox.x2").alias("gt_x2"),
        F.col("m.figure_bbox.y2").alias("gt_y2"),
        F.col("m.caption_bbox.x1").alias("gcap_x1"),
        F.col("m.caption_bbox.y1").alias("gcap_y1"),
        F.col("m.caption_bbox.x2").alias("gcap_x2"),
        F.col("m.caption_bbox.y2").alias("gcap_y2"),
        F.col("m.caption_id").alias("cap_id"),
        F.col("m.confidence").alias("confidence"),
    )


def load_prediction_files(spark: SparkSession,
                          resolved: DataFrame) -> DataFrame:
    """extraction_metadata.json / result.json files -> prediction rows in
    compare_matches shape. ``resolved`` is resolve_prediction_paths output
    (name, resolved_path non-null). The file carries no document name, so
    the path->name association rides via input_file_name().

    The resolved path list is collected to the driver — bounded by the
    BENCHMARK size (eval sets are thousands of docs, not the training
    corpus); for corpus-scale inputs use the table-native pipeline path
    (plans.pipeline), never per-doc JSON files."""
    rows = [(r["name"], r["resolved_path"])
            for r in resolved.where(F.col("resolved_path").isNotNull())
            .select("name", "resolved_path").collect()]
    if not rows:
        return spark.createDataFrame(
            [],
            "url string, item_type string, item_id string, page_number int, "
            "item_x1 double, item_y1 double, item_x2 double, item_y2 double, "
            "cap_x1 double, cap_y1 double, cap_x2 double, cap_y2 double",
        )
    paths = [p for _, p in rows]
    raw = (
        spark.read.schema(PRED_FILE_SCHEMA).option("multiLine", True)
        .json(paths)
        .withColumn("__file", F.input_file_name())
    )
    path_to_name = spark.createDataFrame(rows, "name string, p string").select(
        "name", F.regexp_replace("p", "^/+", "/").alias("__path")
    )
    # input_file_name() yields a percent-encoded URI (spaces, '#', '?',
    # non-ASCII all encode), so a raw string compare silently drops those
    # documents' predictions. Normalize natively: protect literal '+'
    # (url_decode is form-decoding and would turn it into a space), decode
    # the percent escapes, strip the file: scheme, collapse authority
    # slashes ('file:///x' and 'file:/x' both mean '/x').
    decoded = F.url_decode(F.regexp_replace("__file", r"\+", "%2B"))
    norm = F.regexp_replace(
        F.regexp_replace(decoded, "^file:", ""), "^/+", "/"
    )
    raw = raw.join(
        F.broadcast(path_to_name), norm == F.col("__path"),
    )
    items = raw.select(
        F.col("name").alias("url"),
        F.explode(
            F.concat(
                F.transform(F.coalesce("figures", F.array()),
                            lambda x: F.struct(F.lit("figure").alias("t"), x.alias("i"))),
                F.transform(F.coalesce("tables", F.array()),
                            lambda x: F.struct(F.lit("table").alias("t"), x.alias("i"))),
            )
        ).alias("e"),
    )
    return items.select(
        "url",
        F.col("e.t").alias("item_type"),
        F.col("e.i.id").alias("item_id"),
        F.col("e.i.page_number").alias("page_number"),
        F.col("e.i.item_bbox.x1").alias("item_x1"),
        F.col("e.i.item_bbox.y1").alias("item_y1"),
        F.col("e.i.item_bbox.x2").alias("item_x2"),
        F.col("e.i.item_bbox.y2").alias("item_y2"),
        F.col("e.i.caption_bbox.x1").alias("cap_x1"),
        F.col("e.i.caption_bbox.y1").alias("cap_y1"),
        F.col("e.i.caption_bbox.x2").alias("cap_x2"),
        F.col("e.i.caption_bbox.y2").alias("cap_y2"),
    )


def run_benchmark_eval(
    spark: SparkSession,
    benchmark_dir: str,
    predictions_dir: str | None = None,
    output_dir: str | None = None,
    confidence_threshold: float = 0.7,
    created_at: str = "",
    generated_at: str = "",
) -> dict:
    """Full ``benchmarks evaluate`` flow: manifest -> J7 path resolution ->
    file loads -> relational evaluation -> rollups -> JSON/Markdown reports
    (written under ``output_dir`` when given). Returns the summary dict."""
    import os

    from ..operators.evaluate import compare_matches
    from ..operators.report import build_reports
    from ..sources.manifest import load_manifest, resolve_prediction_paths

    meta, docs = load_manifest(spark, benchmark_dir)
    resolved = resolve_prediction_paths(docs, benchmark_dir, predictions_dir)
    gt_paths = [
        os.path.join(benchmark_dir, r["annotation_path"])
        for r in docs.select("annotation_path").collect()
    ]
    gt = load_ground_truth_files(spark, gt_paths)
    preds = load_prediction_files(spark, resolved)
    cmp_df = compare_matches(gt, preds, confidence_threshold=confidence_threshold)
    summary, js, md = build_reports(
        cmp_df,
        dataset_name=meta["name"], dataset_version=meta["version"],
        evaluator_config={"confidence_threshold": confidence_threshold},
        created_at=created_at, generated_at=generated_at,
    )
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "benchmark_report.json"), "w",
                  encoding="utf-8") as f:
            f.write(js)
        with open(os.path.join(output_dir, "benchmark_report.md"), "w",
                  encoding="utf-8") as f:
            f.write(md)
    return summary
