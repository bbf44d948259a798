"""Benchmark dataset manifest load/save (SURVEY S6) + prediction-path
resolution (J7).

Reference: caption_evaluator/manifest.py:67-112 (dataset.json round-trip:
name/version/annotator/created_at/statistics + documents[]), and
batch.py:216-242 (``_find_predictions`` fallback chain:
manifest extraction_path -> <predictions_dir>/<name>/extractions/
extraction_metadata.json -> <predictions_dir>/<name>/result.json).

Spark shape: the manifest itself is a small JSON artifact (driver-side
round-trip, like the reference); the DOCUMENTS list becomes a DataFrame so
downstream joins against it are relational, and the J7 fallback resolution
runs as an Arrow-batched UDF over candidate path arrays — existence checks
happen on the executors where the (distributed) filesystem is mounted,
never in a driver loop.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = "name string, annotation_path string, extraction_path string"


def save_manifest(
    path: str,
    documents: list[dict] | DataFrame,
    name: str = "unknown",
    version: str = "1.0.0",
    annotator: str = "unknown",
    created_at: str = "",
) -> str:
    """Write dataset.json under ``path`` (manifest.py:98-112). ``documents``
    rows carry name/annotation_path/extraction_path (extraction_path omitted
    from the serialized entry when null, like DocumentEntry.to_dict)."""
    if isinstance(documents, DataFrame):
        documents = [r.asDict() for r in documents.collect()]
    doc_entries = []
    for d in documents:
        entry = {"name": d["name"], "annotation_path": d["annotation_path"]}
        if d.get("extraction_path"):
            entry["extraction_path"] = d["extraction_path"]
        doc_entries.append(entry)
    payload = {
        "name": name,
        "version": version,
        "annotator": annotator,
        "created_at": created_at,
        "statistics": {
            "total_documents": len(doc_entries),
            "total_figures": 0,   # matches the reference's (unpopulated)
            "total_tables": 0,    # statistics block, manifest.py:50-63
        },
        "documents": doc_entries,
    }
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "dataset.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=2, ensure_ascii=False)
    return out


def load_manifest(spark: SparkSession, path: str) -> tuple[dict, DataFrame]:
    """Read dataset.json from ``path`` -> (metadata dict, documents DF).
    Raises FileNotFoundError like the reference (manifest.py:80-84)."""
    f = os.path.join(path, "dataset.json")
    if not os.path.exists(f):
        raise FileNotFoundError(f"Dataset file not found: {f}")
    with open(f, encoding="utf-8") as fh:
        data = json.load(fh)
    meta = {
        "name": data.get("name", "unknown"),
        "version": data.get("version", "1.0.0"),
        "annotator": data.get("annotator", "unknown"),
        "created_at": data.get("created_at", ""),
    }
    rows = [
        (d["name"], d["annotation_path"], d.get("extraction_path"))
        for d in data.get("documents", [])
    ]
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA) if rows else \
        spark.createDataFrame([], DOCUMENTS_SCHEMA)
    return meta, docs


def build_from_annotations(
    spark: SparkSession,
    annotation_paths: list[str],
    output_dir: str,
    name: str = "caption-matching-v1",
    version: str = "1.0.0",
    copy_files: bool = True,
    created_at: str = "",
) -> tuple[dict, DataFrame]:
    """S6 DatasetBuilder: assemble caption_annotations.json files into the
    benchmark layout + manifest (reference: caption_evaluator/builder.py:31-105
    ``DatasetBuilder.build_from_annotations``).

    Mirrors the reference behavior: missing files are skipped with a
    warning; ``pdf_name`` comes from the file (falling back to the parent
    directory name); the dataset ``annotator`` is the first file's; a
    sibling ``extractions/extraction_metadata.json`` is picked up as the
    document's extraction_path; ``copy_files=False`` references the
    originals by absolute path instead of copying.

    Spark shape: the per-file JSON headers are parsed DISTRIBUTED
    (spark.read.json with an explicit schema, associated back to paths via
    normalized input_file_name); only the layout assembly (copies +
    manifest write) is driver-side — it is benchmark-scale file plumbing,
    bounded by the eval set, same as save_manifest. ``created_at`` is an
    injected parameter, never now() (determinism — SURVEY §1.2).

    Returns (manifest metadata dict, documents DataFrame) — the same shape
    ``load_manifest`` yields, so the built dataset feeds
    ``plans.evaluation.run_benchmark_eval`` directly.
    """
    import shutil
    import urllib.parse
    import warnings

    existing = [p for p in annotation_paths if os.path.exists(p)]
    for p in annotation_paths:
        if p not in existing:
            warnings.warn(f"Annotation file not found: {p}", stacklevel=2)
    ann_dir = os.path.join(output_dir, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    if not existing:
        save_manifest(output_dir, [], name=name, version=version,
                      created_at=created_at)
        meta, docs = load_manifest(spark, output_dir)
        return meta, docs

    raw = (
        spark.read.schema("pdf_name string, annotator string")
        .option("multiLine", True).json(existing)
        .withColumn("__file", F.input_file_name())
        .collect()
    )

    def norm(uri: str) -> str:
        p = urllib.parse.unquote(uri)
        if p.startswith("file:"):
            p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
        return p

    by_path = {norm(r["__file"]): (r["pdf_name"], r["annotator"]) for r in raw}

    documents = []
    annotator = "unknown"
    for ann_path in existing:
        pdf_name, file_annotator = by_path.get(
            os.path.abspath(ann_path), (None, None)
        )
        pdf_name = pdf_name or os.path.basename(os.path.dirname(ann_path))
        if annotator == "unknown" and file_annotator:
            annotator = file_annotator
        if copy_files:
            doc_dir = os.path.join(ann_dir, pdf_name)
            os.makedirs(doc_dir, exist_ok=True)
            shutil.copy(ann_path, os.path.join(doc_dir, "caption_annotations.json"))
            ann_rel = f"annotations/{pdf_name}/caption_annotations.json"
        else:
            ann_rel = os.path.abspath(ann_path)
        # sibling extraction metadata (builder.py:80-92)
        ext_src = os.path.join(os.path.dirname(ann_path), "extractions",
                               "extraction_metadata.json")
        ext_rel = None
        if os.path.exists(ext_src):
            if copy_files:
                shutil.copy(ext_src,
                            os.path.join(ann_dir, pdf_name,
                                         "extraction_metadata.json"))
                ext_rel = f"annotations/{pdf_name}/extraction_metadata.json"
            else:
                ext_rel = os.path.abspath(ext_src)
        documents.append({"name": pdf_name, "annotation_path": ann_rel,
                          "extraction_path": ext_rel})

    save_manifest(output_dir, documents, name=name, version=version,
                  annotator=annotator, created_at=created_at)
    return load_manifest(spark, output_dir)


def build_from_output_dir(
    spark: SparkSession,
    output_dir: str,
    benchmark_dir: str,
    **kwargs,
) -> tuple[dict, DataFrame]:
    """builder.py:107-141: discover ``*/caption_annotations.json`` under an
    extraction output directory and assemble the benchmark from them.
    Raises ValueError when none are found, like the reference."""
    import glob

    paths = sorted(glob.glob(os.path.join(output_dir, "*",
                                          "caption_annotations.json")))
    if not paths:
        raise ValueError(
            f"No caption_annotations.json files found in {output_dir}"
        )
    return build_from_annotations(spark, paths, benchmark_dir, **kwargs)


def resolve_prediction_paths(
    documents: DataFrame,
    base_path: str,
    predictions_dir: str | None = None,
) -> DataFrame:
    """J7: per document, the first EXISTING path in the reference's fallback
    chain (batch.py:216-242); resolved_path is NULL when nothing exists.

    The candidate list is built natively (array column); only the existence
    probe is a pandas UDF — and it runs per executor against whatever
    filesystem the cluster mounts."""
    candidates = F.array_compact(F.array(
        F.when(
            F.col("extraction_path").isNotNull(),
            F.concat_ws("/", F.lit(base_path), F.col("extraction_path")),
        ),
        *([
            F.concat_ws("/", F.lit(predictions_dir), F.col("name"),
                        F.lit("extractions"), F.lit("extraction_metadata.json")),
            F.concat_ws("/", F.lit(predictions_dir), F.col("name"),
                        F.lit("result.json")),
        ] if predictions_dir else []),
    ))
    with_cand = documents.withColumn("__cands", candidates)

    def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resolved = [
                next((p for p in cands if os.path.exists(p)), None)
                for cands in pdf["__cands"]
            ]
            out = pdf.drop(columns=["__cands"]).copy()
            out["resolved_path"] = resolved
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in documents.schema.fields
    ) + ", resolved_path string"
    return with_cand.mapInPandas(probe, schema=schema)
