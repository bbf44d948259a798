#!/usr/bin/env python
"""Cluster job entrypoint: resumable end-to-end extraction.

Usage (via scripts/submit_example.sh):
    run_extraction_job.py <pages_table_or_path> <warehouse_root>

Reads the pages table, processes only not-yet-committed urls (left-anti
against the warehouse snapshot), checkpoints doc_text / matched / stats with
per-partition lineage rows.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

from paper_layout_parser_spark.plans.pipeline import run_pipeline
from paper_layout_parser_spark.sources.catalog import Catalog


def main(pages_path: str, warehouse: str) -> None:
    spark = SparkSession.builder.getOrCreate()  # conf comes from spark-submit
    cat = Catalog(spark, warehouse)
    pages = (
        spark.read.table(pages_path) if "." in pages_path and "/" not in pages_path
        else spark.read.parquet(pages_path)
    )
    todo = cat.pending_inputs(pages, "doc_text", key="url")
    if todo.limit(1).count() == 0:
        print("nothing pending; all inputs committed")
        return
    out = run_pipeline(todo)
    cat.checkpoint_stage(out.doc_text, "doc_text", page_col=None)
    cat.checkpoint_stage(out.matched, "extracted_items", page_col="page_number")
    cat.checkpoint_stage(out.doc_stats, "doc_stats", page_col=None)
    if out.quarantine is not None:
        cat.append(out.quarantine, "quarantine")
    out.enriched.unpersist()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
