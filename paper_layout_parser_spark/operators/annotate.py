"""VLM ground-truth annotation stage (SURVEY §3.2 —
benchmarks/vlm_annotator/annotator.py:194-303, litellm_client.py:380-466).

Spark shape: pages DF -> empty-page short-circuit (F7) -> rate-bounded
mapInPandas HTTP stage -> native JSON repair/parse -> GT rows.

The reference's concurrency knobs map directly:
  * ThreadPoolExecutor over pages (C1)  -> task parallelism, free;
  * semaphore rate limit (C3)           -> ``repartition(max_concurrency)``
    on the API stage: at most N concurrent tasks hit the endpoint. This is
    a repartition (inserts an exchange), NOT coalesce — coalesce merges
    without a shuffle and would collapse the upstream rasterize stage to
    the API's concurrency too;
  * retry x3 exponential backoff (C4)   -> inside the UDF per request —
    Spark task retry is too coarse (it would replay a whole partition).

The HTTP client itself is pluggable; this sandbox has no network, so the
default client is a deterministic stub producing fenced-JSON responses
(exactly the noisy shape the repair chain handles). A cluster deployment
swaps ``client_factory`` for the real API client — everything else stands.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.json_repair import parse_vlm_response

VLM_RESPONSE_SCHEMA = (
    "struct<matches: array<struct<figure_id: string, figure_type: string, "
    "bbox: array<double>, caption_bbox: array<double>, caption_text: string, "
    "confidence: double>>>"
)


class StubVLMClient:
    """Deterministic stand-in for the VLM API: echoes the page's figure and
    table regions back as annotations, wrapped in a noisy markdown fence
    with trailing commas (the repair chain's real-world input shape)."""

    def __init__(self, fail_every: int = 0):
        self.fail_every = fail_every
        self._calls = 0

    def annotate(self, page_payload: bytes) -> str:
        self._calls += 1
        if self.fail_every and self._calls % self.fail_every == 0:
            raise ConnectionError("stub transient failure")
        page = json.loads(bytes(page_payload))
        matches = []
        for blk in page["blocks"]:
            if blk["name"] not in ("Figure", "Table"):
                continue
            matches.append({
                "figure_id": f"vlm_{page['page_no']:02d}_{blk['b']:02d}",
                "figure_type": blk["name"].lower(),
                "bbox": blk["bbox"],
                "caption_bbox": None,
                "caption_text": None,
                "confidence": 0.9,
            })
        body = json.dumps({"matches": matches})
        # trailing comma + fence: the shapes base.py:221-234 repairs
        noisy = body.replace("}]}", "}],}") if matches else body
        return f"```json\n{noisy}\n``` model chatter"


def annotate_pages(
    rasterized: DataFrame,
    client_factory=StubVLMClient,
    max_concurrency: int = 10,
    max_retries: int = 3,
) -> DataFrame:
    """pages -> raw VLM responses (url, page_no, response string).

    ``repartition(max_concurrency)`` bounds concurrent API calls (the
    semaphore analogue) behind its own exchange, so only THIS stage runs at
    the API's concurrency — upstream stages keep full parallelism; retries
    with exponential backoff run inside the UDF.
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        client = client_factory()  # one client per task
        for pdf in it:
            responses = []
            for payload in pdf["page_payload"]:
                resp = None
                for attempt in range(max_retries):
                    try:
                        resp = client.annotate(payload)
                        break
                    except Exception:  # noqa: BLE001 — C4 retry semantics
                        if attempt == max_retries - 1:
                            resp = None
                        else:
                            time.sleep(min(0.01 * 2 ** attempt, 0.1))
                responses.append(resp)
            yield pd.DataFrame({
                "url": pdf["url"], "page_no": pdf["page_no"],
                "response": responses,
            })

    bounded = rasterized.select("url", "page_no", "page_payload").repartition(
        max_concurrency
    )
    return bounded.mapInPandas(run, schema="url string, page_no int, response string")


def annotatable_pages(rasterized: DataFrame,
                      detections: DataFrame | None = None) -> DataFrame:
    """F7 empty-page short-circuit (annotator.py:674-680): pages with no
    figure/table regions never reach the (rate-limited) API stage.

    With a ``detections`` DataFrame (the normal pipeline case), the filter is
    a semi-join against figure/table detections — exact, native, and pushed
    before the bounded exchange. Without it, a cheap native payload scan
    stands in (the PLP1 body is JSON; real deployments pass detections)."""
    if detections is not None:
        keep = (
            detections.where(F.col("class_name").isin("Figure", "Table"))
            .select("url", "page_no")
            .distinct()
        )
        return rasterized.join(keep, ["url", "page_no"], "left_semi")
    body = F.col("page_payload").cast("string")
    return rasterized.where(
        body.contains('"name":"Figure"') | body.contains('"name":"Table"')
    )


def parse_annotations(responses: DataFrame) -> DataFrame:
    """Raw responses -> flat GT rows via the native repair + from_json chain
    (P11) + explode — one row per annotated match."""
    parsed = responses.select(
        "url", "page_no",
        parse_vlm_response(F.col("response"), VLM_RESPONSE_SCHEMA).alias("r"),
    )
    return (
        parsed.where(F.col("r").isNotNull())
        .select("url", "page_no", F.explode("r.matches").alias("m"))
        .select(
            "url",
            F.col("page_no").alias("page_number"),
            F.col("m.figure_id").alias("figure_id"),
            F.col("m.figure_type").alias("figure_type"),
            F.element_at("m.bbox", 1).alias("gt_x1"),
            F.element_at("m.bbox", 2).alias("gt_y1"),
            F.element_at("m.bbox", 3).alias("gt_x2"),
            F.element_at("m.bbox", 4).alias("gt_y2"),
            F.element_at("m.caption_bbox", 1).alias("gcap_x1"),
            F.element_at("m.caption_bbox", 2).alias("gcap_y1"),
            F.element_at("m.caption_bbox", 3).alias("gcap_x2"),
            F.element_at("m.caption_bbox", 4).alias("gcap_y2"),
            F.col("m.caption_text").alias("caption_text"),
            F.col("m.confidence").alias("confidence"),
        )
    )


def annotate_and_parse(rasterized: DataFrame,
                       detections: DataFrame | None = None, **kw) -> DataFrame:
    """Full §3.2 stage: skip empty pages (F7) -> API -> parse."""
    return parse_annotations(
        annotate_pages(annotatable_pages(rasterized, detections), **kw)
    )
