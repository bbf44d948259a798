"""Doc -> pages flatMap (reference: pdf_converter.py:59-145), skew-aware.

The reference rasterizes one whole PDF at a time in a Python loop. At 100 TB
a single giant document (10^4 pages) hidden inside one row becomes a
straggler task, so the Spark version splits work at the (url, page_range)
grain BEFORE the expensive stage:

  1. ``probe_pages``     — cheap metadata probe (page count only; the real
                           backend is ``fitz.open(...).page_count``).
  2. ``plan_splits``     — explode each doc into page-range chunks and
                           hash-repartition on (url, chunk) so giant docs
                           spread across the cluster.
  3. ``rasterize_pages`` — mapInPandas over chunks, emitting one row per
                           page. The page payload column stands in for the
                           rendered pixmap + text layer (pdf_converter.py:84-96
                           renders at zoom = dpi/72).

All three stages are Arrow-batched; no per-row Python outside the UDFs.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CHUNK_PAGES = 16

PAGE_SCHEMA = (
    "url string, page_no int, width int, height int, page_payload binary"
)


def _probe_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        counts = []
        for payload in pdf["html"]:
            doc = json.loads(bytes(payload))
            counts.append(len(doc["pages"]))
        yield pd.DataFrame({"url": pdf["url"], "total_pages": counts})


def probe_pages(pages: DataFrame) -> DataFrame:
    """(url, total_pages) — the S3 metadata probe (pdf_converter.py:29-57)."""
    return pages.select("url", "html").mapInPandas(
        _probe_batches, schema="url string, total_pages int"
    )


def plan_splits(pages: DataFrame, chunk_pages: int = DEFAULT_CHUNK_PAGES,
                num_partitions: int | None = None) -> DataFrame:
    """Explode each document into (url, html, page_start, page_end) chunks
    and spread them with a hash repartition — the giant-PDF skew defense.

    ``page_end`` is exclusive-upper clamped by the rasterizer itself, so the
    plan does not need the exact page count for the common (single-chunk)
    case; only docs whose payload advertises more pages than one chunk get
    extra chunks. We derive chunk count from the probe to avoid decoding the
    payload twice.
    """
    counts = probe_pages(pages)
    planned = (
        pages.join(counts, "url")  # small join; AQE broadcasts the probe side
        .withColumn(
            "page_start",
            F.explode(F.sequence(F.lit(1), F.col("total_pages"), F.lit(chunk_pages))),
        )
        .withColumn(
            "page_end",
            F.least(F.col("page_start") + F.lit(chunk_pages), F.col("total_pages") + 1),
        )
        .select("url", "html", "page_start", "page_end")
    )
    if num_partitions is None:
        num_partitions = pages.sparkSession.sparkContext.defaultParallelism * 2
    # hash on (url, page_start): chunks of one giant doc land on different tasks
    return planned.repartition(num_partitions, F.xxhash64("url", "page_start"))


def _rasterize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        urls, page_nos, widths, heights, payloads = [], [], [], [], []
        for url, payload, start, end in zip(
            pdf["url"], pdf["html"], pdf["page_start"], pdf["page_end"]
        ):
            doc = json.loads(bytes(payload))
            for pg in doc["pages"]:
                if not (start <= pg["page_no"] < end):
                    continue
                urls.append(url)
                page_nos.append(pg["page_no"])
                widths.append(pg["width"])
                heights.append(pg["height"])
                payloads.append(json.dumps(pg, separators=(",", ":")).encode())
        yield pd.DataFrame({
            "url": urls, "page_no": page_nos, "width": widths,
            "height": heights, "page_payload": payloads,
        })


def rasterize_pages(planned: DataFrame) -> DataFrame:
    """(url, html, page_start, page_end) -> one row per page (P1)."""
    return planned.mapInPandas(_rasterize_batches, schema=PAGE_SCHEMA)


def rasterize(pages: DataFrame, chunk_pages: int = DEFAULT_CHUNK_PAGES,
              num_partitions: int | None = None) -> DataFrame:
    """Convenience: plan + rasterize."""
    return rasterize_pages(plan_splits(pages, chunk_pages, num_partitions))
