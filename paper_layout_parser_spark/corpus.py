"""Build the synthetic Common-Crawl-style ``pages`` table as a Spark DataFrame.

Schema (BASELINE.json::input_hint): url string, warc_ts timestamp,
html binary, text string, lang string. Derived deterministically from the
driver's ``documents.parquet`` via the shared spec in synthdata.py, so the
DuckDB oracle can regenerate the same content independently.

Generation runs in mapInPandas (Arrow-batched); it is test scaffolding, not
the graded pipeline path — the pipeline only ever sees the resulting table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import synthdata as sd

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _gen_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    epoch = pd.Timestamp(sd.WARC_EPOCH)
    for pdf in it:
        doc_ids = pdf["doc_id"].astype("int64")
        langs = pdf["lang"].astype(str)
        yield pd.DataFrame({
            "url": [sd.url_of(d) for d in doc_ids],
            "warc_ts": [epoch + pd.Timedelta(seconds=int(d)) for d in doc_ids],
            "html": [sd.doc_html(int(d)) for d in doc_ids],
            "text": [sd.doc_text(int(d)) for d in doc_ids],
            "lang": langs,
        })


def build_pages(spark: SparkSession, sf_dir: str, num_partitions: int | None = None) -> DataFrame:
    """pages table derived from {sf_dir}/documents.parquet."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    if num_partitions:
        docs = docs.repartition(num_partitions)
    return docs.mapInPandas(_gen_batches, schema=PAGES_SCHEMA)
