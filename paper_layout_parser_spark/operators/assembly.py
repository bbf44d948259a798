"""Document text re-assembly (SURVEY A13 + north-star byte-identity target).

Input: enriched detections (url, page_no, reading_order_rank, class_name,
text). Output: one row per url with the document's main-content text —
non-boilerplate blocks (class 'Abandon' stripped, the HTML-boilerplate
analogue) in (page_no, reading_order_rank) order, newline-joined.

Pure native Spark: groupBy + collect_list of compact structs + array_sort +
transform + array_join — the sort happens JVM-side after the single shuffle,
and struct ordering on (page_no, rank) is total so the output is
deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_doc_text(enriched: DataFrame, text_col: str = "doc_text") -> DataFrame:
    blocks = enriched.where(F.col("class_name") != "Abandon").select(
        "url",
        F.struct(
            F.col("page_no").alias("p"),
            F.col("reading_order_rank").alias("r"),
            F.col("text").alias("t"),
        ).alias("blk"),
    )
    return blocks.groupBy("url").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("blk")), lambda b: b["t"]),
            "\n",
        ).alias(text_col)
    )
