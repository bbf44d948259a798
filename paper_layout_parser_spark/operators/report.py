"""Evaluation report sinks (SURVEY K6 + A5's per-document list).

Re-expresses the reference's report rendering:
  * JSON report   — caption_evaluator/reporter.py:22-42 serializing
    BenchmarkSummary.to_dict (batch.py:66-91);
  * Markdown      — reporter.py:44-183 (dataset info, overall metrics,
    detailed counts, per-type tables, per-document table, errors, config);
  * per-doc list  — result_processor.py:169-211: the summary carries a
    per-document array, assembled here relationally and folded only at the
    report edge.

Spark shape: ALL aggregation happens in DataFrames (evaluate.py /
stats.py); this module only folds the already-tiny rollup rows into the
human-readable artifact on the driver. ``generated_at`` / ``created_at``
are injected parameters, never now() (determinism — SURVEY §1.2).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


DEFAULT_MAX_EMBEDDED_DOCS = 100_000


def summary_with_documents(
    doc_stats_df: DataFrame,
    max_documents: int = DEFAULT_MAX_EMBEDDED_DOCS,
) -> DataFrame:
    """A5: the global rollup (stats.summary_report) PLUS the per-document
    array of (url, total_pages, total_detections, average_detections_per_page)
    sorted by url — the reference summary's ``documents`` list
    (result_processor.py:169-211). One output row.

    SCALE CONTRACT: the embedded array is a BENCHMARK-scale artifact
    (the reference folds its whole eval set into one report). At corpus
    scale a single row holding 10⁹ structs breaks (2 GB row limit /
    driver collect downstream), so the embedded list is capped at the
    FIRST ``max_documents`` urls — capped with a distributed top-N
    (orderBy+limit plans as TakeOrderedAndProject; the fold only ever sees
    ≤ max_documents rows, so no unbounded state exists anywhere in the
    plan). The scalar totals always cover ALL documents; for corpus-scale
    per-doc output keep the relational doc_stats table instead of the
    embedded array."""
    from ..functions.geometry import round_half_up

    totals = doc_stats_df.agg(
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
    folded = (
        doc_stats_df.orderBy("url").limit(max_documents)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(
                    "url", "total_pages", "total_detections",
                    "average_detections_per_page",
                ))
            ).alias("documents"),
        )
    )
    # both sides are exactly one row; the cross join is a literal append
    return totals.crossJoin(folded)


def benchmark_summary(
    rollup_row: dict,
    per_type_rows: list[dict],
    per_doc_rows: list[dict],
    dataset_name: str = "synthetic",
    dataset_version: str = "1.0.0",
    evaluator_config: dict | None = None,
    created_at: str = "",
    n_evaluated: int | None = None,
) -> dict:
    """Assemble the reference's BenchmarkSummary.to_dict shape
    (batch.py:66-91) from collected rollup rows:

      * ``rollup_row``    — one evaluate.batch_rollup row (as dict);
      * ``per_type_rows`` — evaluate.per_type_metrics rows;
      * ``per_doc_rows``  — per-url evaluation_summary rows (possibly a
        capped prefix; pass ``n_evaluated`` so successful_evaluations still
        reports the full count).
    """
    # an empty evaluation (no GT rows survive the confidence filter) rolls
    # up to NULL sums — report zeros, like the reference's empty summary
    rollup_row = {k: (v if v is not None else 0) for k, v in rollup_row.items()}
    by_type = {r["figure_type"]: r for r in per_type_rows}

    def type_metrics(t: str) -> dict:
        r = by_type.get(t)
        if r is None:
            return {"precision": 0.0, "recall": 0.0, "f1": 0.0}
        return {"precision": r["precision"], "recall": r["recall"], "f1": r["f1"]}

    return {
        "dataset": {"name": dataset_name, "version": dataset_version},
        "summary": {
            "total_documents": int(rollup_row["total_documents"]),
            "successful_evaluations": (
                n_evaluated if n_evaluated is not None else len(per_doc_rows)
            ),
            "precision": rollup_row["precision"],
            "recall": rollup_row["recall"],
            "f1": rollup_row["f1"],
        },
        "per_type_metrics": {
            "figure": type_metrics("figure"),
            "table": type_metrics("table"),
        },
        "detailed_counts": {
            "true_positives": int(rollup_row["tp"]),
            "false_positives": int(rollup_row["fp"]),
            "false_negatives": int(rollup_row["fn"]),
        },
        "evaluator_config": evaluator_config or {},
        "created_at": created_at,
        "document_results": [
            {
                "name": r["url"],
                "evaluation": {
                    "precision": r["precision"],
                    "recall": r["recall"],
                    "f1": r["f1"],
                    "true_positives": int(r["tp"]),
                    "false_positives": int(r["fp"]),
                    "false_negatives": int(r["fn"]),
                },
                "error": None,
            }
            for r in sorted(per_doc_rows, key=lambda r: r["url"])
        ],
    }


def render_json_report(summary: dict) -> str:
    """K6 JSON sink (reporter.py:22-42): indent=2, non-ASCII preserved."""
    return json.dumps(summary, indent=2, ensure_ascii=False)


def render_markdown_report(summary: dict, generated_at: str = "") -> str:
    """K6 Markdown sink — section-for-section the reference's layout
    (reporter.py:44-183). ``generated_at`` replaces datetime.now() so the
    artifact is deterministic."""
    s = summary["summary"]
    c = summary["detailed_counts"]
    lines = [
        "# Caption Matching Benchmark Report",
        "",
        f"**Generated:** {generated_at}",
        "",
        "## Dataset Information",
        "",
        f"- **Name:** {summary['dataset']['name']}",
        f"- **Version:** {summary['dataset']['version']}",
        f"- **Total Documents:** {s['total_documents']}",
        f"- **Successful Evaluations:** {s['successful_evaluations']}",
        "",
        "## Overall Metrics",
        "",
        "| Metric | Value |",
        "|--------|-------|",
        f"| Precision | {s['precision']:.4f} |",
        f"| Recall | {s['recall']:.4f} |",
        f"| F1 Score | {s['f1']:.4f} |",
        "",
        "## Detailed Counts",
        "",
        "| Count | Value |",
        "|-------|-------|",
        f"| True Positives | {c['true_positives']} |",
        f"| False Positives | {c['false_positives']} |",
        f"| False Negatives | {c['false_negatives']} |",
        "",
        "## Per-Type Metrics",
        "",
        "### Figure Matching",
        "",
        "| Metric | Value |",
        "|--------|-------|",
    ]
    for key, value in summary["per_type_metrics"]["figure"].items():
        lines.append(f"| {key.capitalize()} | {value:.4f} |"
                     if isinstance(value, float) else f"| {key.capitalize()} | {value} |")
    lines.extend(["", "### Table Matching", "", "| Metric | Value |", "|--------|-------|"])
    for key, value in summary["per_type_metrics"]["table"].items():
        lines.append(f"| {key.capitalize()} | {value:.4f} |"
                     if isinstance(value, float) else f"| {key.capitalize()} | {value} |")
    lines.extend([
        "",
        "## Per-Document Results",
        "",
        "| Document | Precision | Recall | F1 | Status |",
        "|----------|-----------|--------|-----|--------|",
    ])
    for doc in summary["document_results"]:
        if doc["evaluation"]:
            e = doc["evaluation"]
            lines.append(
                f"| {doc['name']} | {e['precision']:.4f} | "
                f"{e['recall']:.4f} | {e['f1']:.4f} | OK |"
            )
        else:
            error = doc["error"] or "Unknown error"
            if len(error) > 30:
                error = error[:27] + "..."
            lines.append(f"| {doc['name']} | - | - | - | Error: {error} |")
    errors = [d for d in summary["document_results"] if d["error"]]
    if errors:
        lines.extend(["", "## Errors", ""])
        for doc in errors:
            lines.append(f"- **{doc['name']}:** {doc['error']}")
    lines.extend(["", "## Evaluator Configuration", ""])
    for key, value in summary["evaluator_config"].items():
        lines.append(f"- **{key}:** {value}")
    lines.extend(["", "---", "", f"*Report generated at {summary['created_at']}*"])
    return "\n".join(lines)


def build_reports(
    comparisons: DataFrame,
    dataset_name: str = "synthetic",
    dataset_version: str = "1.0.0",
    evaluator_config: dict | None = None,
    created_at: str = "",
    generated_at: str = "",
    max_documents: int = DEFAULT_MAX_EMBEDDED_DOCS,
) -> tuple[dict, str, str]:
    """Convenience: comparisons DF -> (summary dict, json report, markdown
    report).

    SCALE CONTRACT: the per-document table in the rendered report is a
    BENCHMARK-scale artifact; the driver collect of per-doc rows is capped
    at the first ``max_documents`` urls (distributed top-N, so neither the
    shuffle nor the driver ever holds more). ``successful_evaluations`` and
    every aggregate metric still cover ALL documents — only the rendered
    per-doc listing truncates. For corpus-scale per-doc output, persist
    evaluation_summary(per_url=True) as a table instead."""
    from .evaluate import batch_rollup, evaluation_summary, per_type_metrics

    per_doc = evaluation_summary(comparisons, per_url=True)
    rollup = batch_rollup(per_doc).first().asDict()
    per_type = [r.asDict() for r in per_type_metrics(comparisons).collect()]
    # batch_rollup already counted the per-doc rows — a separate count()
    # would recompute the whole evaluation aggregation a third time
    n_evaluated = int(rollup["total_documents"] or 0)
    per_doc_rows = [
        r.asDict() for r in per_doc.orderBy("url").limit(max_documents).collect()
    ]
    summary = benchmark_summary(
        rollup, per_type, per_doc_rows,
        dataset_name=dataset_name, dataset_version=dataset_version,
        evaluator_config=evaluator_config, created_at=created_at,
        n_evaluated=n_evaluated,
    )
    return summary, render_json_report(summary), render_markdown_report(
        summary, generated_at
    )
