#!/usr/bin/env python
"""Cluster job entrypoint: file-based benchmark evaluation (the Spark twin
of the reference's ``python -m benchmarks evaluate``).

Usage:
    run_benchmark_eval.py <benchmark_dir> [predictions_dir] [output_dir]

Loads dataset.json, resolves each document's predictions through the
fallback chain, evaluates caption matching, and writes
benchmark_report.{json,md} to output_dir.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from paper_layout_parser_spark.plans.evaluation import run_benchmark_eval


def main(argv: list[str]) -> None:
    spark = SparkSession.builder.getOrCreate()
    bench = argv[0]
    preds = argv[1] if len(argv) > 1 else None
    outdir = argv[2] if len(argv) > 2 else None
    summary = run_benchmark_eval(spark, bench, predictions_dir=preds,
                                 output_dir=outdir)
    print(json.dumps(summary["summary"]))


if __name__ == "__main__":
    main(sys.argv[1:])
