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


def build_pages(spark: SparkSession, sf_dir: str, num_partitions: int | None = None,
                replicate: int = 1) -> DataFrame:
    """pages table derived from {sf_dir}/documents.parquet.

    ``replicate`` > 1 synthesizes a k-times-larger corpus by re-keying
    copies (doc_id + i*1_000_000) — used by the scaling benchmark so the
    job is long enough for a meaningful N-vs-4N throughput comparison."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    if replicate > 1:
        docs = docs.withColumn(
            "doc_id",
            F.explode(F.array(*[F.col("doc_id") + 1000000 * i for i in range(replicate)])),
        )
    if num_partitions is None:
        # the driver parquet is a single row-group -> one scan partition;
        # spread generation across the cluster
        num_partitions = spark.sparkContext.defaultParallelism * 2
    return docs.repartition(num_partitions).mapInPandas(_gen_batches, schema=PAGES_SCHEMA)


def build_ground_truth(matched: DataFrame) -> DataFrame:
    """Synthetic VLM-style ground-truth table derived from the matcher output
    with native column arithmetic — the Spark twin of
    synthdata.ground_truth_cte (same variant formulas, independently
    implemented)."""
    from pyspark.sql import functions as F

    doc_id = F.regexp_extract("url", r"([0-9]+)$", 1).cast("long")
    g = F.floor((doc_id + F.col("page_number")) / 2).cast("long") % 4
    shift = (
        F.when(g == 1, F.lit(10.0)).when(g == 2, F.lit(150.0)).otherwise(F.lit(0.0))
    )
    wrong_cap = g == 3
    return matched.select(
        "url",
        F.col("page_number"),
        F.concat(F.lit("gt_"), F.col("item_id")).alias("figure_id"),
        F.col("item_type").alias("figure_type"),
        F.when((doc_id * 3 + F.col("page_number") * 11) % 7 == 0, F.lit(0.5))
        .otherwise(F.lit(0.75))
        .alias("confidence"),
        (F.col("item_x1") + shift).alias("gt_x1"),
        (F.col("item_y1") + shift).alias("gt_y1"),
        (F.col("item_x2") + shift).alias("gt_x2"),
        (F.col("item_y2") + shift).alias("gt_y2"),
        F.when(wrong_cap, F.lit(600.0)).otherwise(F.col("cap_x1")).alias("gcap_x1"),
        F.when(wrong_cap, F.lit(420.0)).otherwise(F.col("cap_y1")).alias("gcap_y1"),
        F.when(wrong_cap, F.lit(800.0)).otherwise(F.col("cap_x2")).alias("gcap_x2"),
        F.when(wrong_cap, F.lit(460.0)).otherwise(F.col("cap_y2")).alias("gcap_y2"),
        F.when(
            wrong_cap | F.col("cap_x1").isNotNull(),
            F.concat(F.lit("cap_"), F.col("item_id")),
        ).alias("cap_id"),
    )
