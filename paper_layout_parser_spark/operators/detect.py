"""Page -> detections flatMap (reference: layout_detector.py:96-194).

Batched model inference as mapInPandas with the iterator-init pattern: the
backend (model) is constructed ONCE per task, then fed whole Arrow batches —
the reference's ``detect_batch`` (layout_detector.py:96-109) is a sequential
per-image loop; this version is genuinely batched and, on a real cluster,
pinned to GPU executors via a resource profile.

Backends are pluggable behind one schema:
  * StubDetectorBackend — deterministic: decodes the synthetic page payload
    (tests / oracle parity).
  * YoloDetectorBackend — real DocLayout-YOLO; gated behind import-try since
    the model/libs are not in this container.

Post-processing (class-name normalization P3, output rounding P4) is native
Spark SQL, not Python.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RAW_DETECTION_SCHEMA = (
    "url string, page_no int, width int, height int, det_idx int, "
    "class_id int, raw_name string, confidence double, "
    "x1 double, y1 double, x2 double, y2 double"
)

# thresholds from the reference config (config/config.yaml:7-12; main.py:204-205)
DEFAULT_CONF = 0.25
DEFAULT_IOU = 0.45
DEFAULT_IMGSZ = 1024


class StubDetectorBackend:
    """Deterministic detector: reads detections straight out of the synthetic
    page payload, in model-output order, applying the confidence threshold
    exactly as the real model invocation does (layout_detector.py:162-169).
    NMS stays inside the model (stub payloads are already non-overlapping)."""

    def __init__(self, conf: float = DEFAULT_CONF, iou: float = DEFAULT_IOU,
                 imgsz: int = DEFAULT_IMGSZ):
        self.conf = conf
        self.iou = iou
        self.imgsz = imgsz

    def detect_page(self, page: dict) -> list[dict]:
        """Detections of one PARSED page dict — the single source of the
        stub's detection contract (threshold, field mapping); used by
        detect_batch and by the fused pipeline stage's dict fast path."""
        return [
            {
                "class_id": blk["class_id"],
                "raw_name": blk["name"],
                "confidence": blk["conf"],
                "bbox": blk["bbox"],
            }
            for blk in page["blocks"]
            if blk["conf"] >= self.conf
        ]

    def detect_batch(self, payloads: list[bytes]) -> list[list[dict]]:
        return [self.detect_page(json.loads(bytes(p))) for p in payloads]


class YoloDetectorBackend:
    """Real DocLayout-YOLO backend (layout_detector.py:125-194). The model
    weights / ultralytics stack are not available in this sandbox; the class
    exists so a cluster deployment only swaps the backend factory."""

    def __init__(self, model_path: str, conf: float = DEFAULT_CONF,
                 iou: float = DEFAULT_IOU, imgsz: int = DEFAULT_IMGSZ):
        try:
            from doclayout_yolo import YOLOv10  # type: ignore
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "DocLayout-YOLO is not installed in this environment; "
                "use StubDetectorBackend or deploy with the model wheels."
            ) from exc
        self._model = YOLOv10(model_path)  # pragma: no cover
        self.conf, self.iou, self.imgsz = conf, iou, imgsz

    def detect_batch(self, payloads: list[bytes]) -> list[list[dict]]:  # pragma: no cover
        raise NotImplementedError("decode pixmap bytes -> model.predict batch")


def detect_layout(pages: DataFrame, backend_factory=StubDetectorBackend,
                  profile=None) -> DataFrame:
    """pages (url, page_no, width, height, page_payload) -> raw detections,
    one row per detection, det_idx = model output order within the page (P2).
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = backend_factory()  # once per task, never per row/batch
        for pdf in it:
            rows: dict[str, list] = {
                "url": [], "page_no": [], "width": [], "height": [],
                "det_idx": [], "class_id": [], "raw_name": [],
                "confidence": [], "x1": [], "y1": [], "x2": [], "y2": [],
            }
            results = backend.detect_batch(list(pdf["page_payload"]))
            for url, page_no, w, h, dets in zip(
                pdf["url"], pdf["page_no"], pdf["width"], pdf["height"], results
            ):
                for i, d in enumerate(dets):
                    rows["url"].append(url)
                    rows["page_no"].append(page_no)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["det_idx"].append(i)
                    rows["class_id"].append(d["class_id"])
                    rows["raw_name"].append(d["raw_name"])
                    rows["confidence"].append(d["confidence"])
                    x1, y1, x2, y2 = d["bbox"]
                    rows["x1"].append(x1)
                    rows["y1"].append(y1)
                    rows["x2"].append(x2)
                    rows["y2"].append(y2)
            yield pd.DataFrame(rows)

    return pages.mapInPandas(run, schema=RAW_DETECTION_SCHEMA, profile=profile)


def detect_enrich_layout(pages: DataFrame,
                         backend_factory=StubDetectorBackend,
                         profile=None) -> DataFrame:
    """Fused detect + clipped-text + XY-cut pass (P2 + P7 + O6).

    The rasterized chunk row already holds both the pixmap stand-in and the
    page's text layer, so running inference, per-region text extraction and
    reading-order ranking in ONE mapInPandas stage avoids a shuffle, a
    cogroup and a second decode of the page payload. This is the pipeline's
    default hot path; the unfused operators remain for detections sourced
    externally. Emits RAW names/values — run normalize_detections after.
    """
    from ..algorithms import clip_text, xy_cut_order

    schema = (RAW_DETECTION_SCHEMA
              + ", reading_order_rank int, text string, error string")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = backend_factory()
        for pdf in it:
            cols: dict[str, list] = {
                "url": [], "page_no": [], "width": [], "height": [],
                "det_idx": [], "class_id": [], "raw_name": [],
                "confidence": [], "x1": [], "y1": [], "x2": [], "y2": [],
                "reading_order_rank": [], "text": [], "error": [],
            }

            def emit_error(url, page_no, w, h, exc):
                # C6 error containment (main.py:336-354): a bad page becomes
                # a quarantine row, never a failed job
                cols["url"].append(url)
                cols["page_no"].append(page_no)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["det_idx"].append(-1)
                cols["class_id"].append(-1)
                cols["raw_name"].append(None)
                cols["confidence"].append(None)
                for c in ("x1", "y1", "x2", "y2"):
                    cols[c].append(None)
                cols["reading_order_rank"].append(-1)
                cols["text"].append(None)
                cols["error"].append(f"{type(exc).__name__}: {exc}")

            payloads = list(pdf["page_payload"])
            try:
                # batched inference is the hot path; fall back to per-page
                # only when the whole batch fails (isolates the bad page)
                results = backend.detect_batch(payloads)
            except Exception:  # noqa: BLE001
                results = None
            for idx, (url, page_no, w, h, payload) in enumerate(zip(
                pdf["url"], pdf["page_no"], pdf["width"], pdf["height"], payloads
            )):
                try:
                    dets = (results[idx] if results is not None
                            else backend.detect_batch([payload])[0])
                    blocks = json.loads(bytes(payload))["blocks"]
                    boxes = [tuple(d["bbox"]) for d in dets]
                    order = xy_cut_order(boxes)
                    ranks = [0] * len(order)
                    for rank, pos in enumerate(order):
                        ranks[pos] = rank
                    texts = [clip_text(blocks, *d["bbox"]) for d in dets]
                except Exception as exc:  # noqa: BLE001 — quarantine semantics
                    emit_error(url, page_no, w, h, exc)
                    continue
                for i, d in enumerate(dets):
                    cols["url"].append(url)
                    cols["page_no"].append(page_no)
                    cols["width"].append(w)
                    cols["height"].append(h)
                    cols["det_idx"].append(i)
                    cols["class_id"].append(d["class_id"])
                    cols["raw_name"].append(d["raw_name"])
                    cols["confidence"].append(d["confidence"])
                    x1, y1, x2, y2 = d["bbox"]
                    cols["x1"].append(x1)
                    cols["y1"].append(y1)
                    cols["x2"].append(x2)
                    cols["y2"].append(y2)
                    cols["reading_order_rank"].append(ranks[i])
                    cols["text"].append(texts[i])
                    cols["error"].append(None)
            yield pd.DataFrame(cols)

    # profile: stage-level scheduling — pin this stage to GPU executors via
    # session.gpu_task_profile() on a GPU cluster (None on local[N])
    return pages.mapInPandas(run, schema=schema, profile=profile)


def rasterize_detect_enrich(planned: DataFrame,
                            backend_factory=StubDetectorBackend,
                            profile=None) -> DataFrame:
    """r9 hot path: plan chunks -> ONE mapInPandas stage doing rasterize
    (real render work, checksum semantics identical to
    rasterize._render_page) + detection + clipped text + XY-cut.

    Versus the two-stage rasterize_pages |> detect_enrich_layout chain
    this removes a full JVM->Python->JVM round trip of the page table
    (one Arrow (de)serialization of ~1 KB page payloads per page each
    way) and the per-page ``json.dumps`` + double ``json.loads`` of the
    page payload between the stages (guide §4.1: every Python boundary
    costs a transpose + serialization both ways). With the default
    StubDetectorBackend the detections are read straight off the parsed
    page dict — value-identical to ``detect_batch(json.dumps(page))``
    because the stub's parse of the serialized page is the page (pinned
    by tests/test_pipeline.py's fused-vs-unfused parity and the
    pipeline oracle queries); any other backend still receives
    serialized page payloads through its documented ``detect_batch``
    contract, batched per Arrow batch with the same whole-batch-then-
    per-page fallback as detect_enrich_layout.

    Emits RAW names/values plus ``reading_order_rank``/``text`` and the
    quarantine columns ``stage``/``error`` ('rasterize' for chunk-decode
    and render failures, 'detect' for inference/enrichment failures —
    the same split the two-stage chain produced). Run
    normalize_detections after dropping ``stage``."""
    from ..algorithms import clip_text, xy_cut_order
    from .rasterize import _render_page

    schema = (RAW_DETECTION_SCHEMA
              + ", reading_order_rank int, text string, "
              "stage string, error string")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = backend_factory()  # once per task, never per row/batch
        stub_fast = type(backend) is StubDetectorBackend
        for pdf in it:
            cols: dict[str, list] = {
                "url": [], "page_no": [], "width": [], "height": [],
                "det_idx": [], "class_id": [], "raw_name": [],
                "confidence": [], "x1": [], "y1": [], "x2": [], "y2": [],
                "reading_order_rank": [], "text": [], "stage": [],
                "error": [],
            }

            def emit_error(url, page_no, w, h, stage, exc):
                # C6 error containment: a bad chunk/page becomes a
                # quarantine row, never a failed job
                cols["url"].append(url)
                cols["page_no"].append(int(page_no))
                cols["width"].append(w)
                cols["height"].append(h)
                cols["det_idx"].append(-1)
                cols["class_id"].append(-1)
                cols["raw_name"].append(None)
                cols["confidence"].append(None)
                for c in ("x1", "y1", "x2", "y2"):
                    cols[c].append(None)
                cols["reading_order_rank"].append(-1)
                cols["text"].append(None)
                cols["stage"].append(stage)
                cols["error"].append(f"{type(exc).__name__}: {exc}")

            # rasterize leg: decode chunks, render pages (error rows keep
            # the two-stage chain's 'rasterize' stage label)
            pages: list[tuple] = []   # (url, page dict) for rendered pages
            for url, payload, start, end in zip(
                pdf["url"], pdf["html"], pdf["page_start"], pdf["page_end"]
            ):
                try:
                    doc = json.loads(bytes(payload)[8:])  # skip PLP1 header
                    in_range = [pg for pg in doc["pages"]
                                if start <= pg["page_no"] < end]
                except Exception as exc:  # noqa: BLE001 — C6 quarantine
                    emit_error(url, int(start), 0, 0, "rasterize", exc)
                    continue
                for pg in in_range:
                    try:
                        _render_page(pg)
                        pages.append((url, pg))
                    except Exception as exc:  # noqa: BLE001
                        emit_error(url, pg.get("page_no", int(start)), 0, 0,
                                   "rasterize", exc)

            # detect leg: batched inference (generic backends get the
            # serialized payload contract; the stub reads the parsed dict
            # PER PAGE inside the containment try below, so a malformed
            # block quarantines that page exactly like the two-stage
            # chain's whole-batch-then-per-page fallback did)
            results = None
            if not stub_fast:
                payloads = [
                    json.dumps(pg, separators=(",", ":")).encode()
                    for _url, pg in pages
                ]
                try:
                    results = backend.detect_batch(payloads)
                except Exception:  # noqa: BLE001 — isolate the bad page
                    results = None

            for idx, (url, pg) in enumerate(pages):
                page_no, w, h = pg["page_no"], pg["width"], pg["height"]
                try:
                    if stub_fast:
                        dets = backend.detect_page(pg)
                    else:
                        dets = (results[idx] if results is not None
                                else backend.detect_batch([payloads[idx]])[0])
                    blocks = pg["blocks"]
                    boxes = [tuple(d["bbox"]) for d in dets]
                    order = xy_cut_order(boxes)
                    ranks = [0] * len(order)
                    for rank, pos in enumerate(order):
                        ranks[pos] = rank
                    texts = [clip_text(blocks, *d["bbox"]) for d in dets]
                except Exception as exc:  # noqa: BLE001 — quarantine
                    emit_error(url, page_no, w, h, "detect", exc)
                    continue
                for i, d in enumerate(dets):
                    cols["url"].append(url)
                    cols["page_no"].append(page_no)
                    cols["width"].append(w)
                    cols["height"].append(h)
                    cols["det_idx"].append(i)
                    cols["class_id"].append(d["class_id"])
                    cols["raw_name"].append(d["raw_name"])
                    cols["confidence"].append(d["confidence"])
                    x1, y1, x2, y2 = d["bbox"]
                    cols["x1"].append(x1)
                    cols["y1"].append(y1)
                    cols["x2"].append(x2)
                    cols["y2"].append(y2)
                    cols["reading_order_rank"].append(ranks[i])
                    cols["text"].append(texts[i])
                    cols["stage"].append(None)
                    cols["error"].append(None)
            yield pd.DataFrame(cols)

    return planned.mapInPandas(run, schema=schema, profile=profile)


def normalize_detections(raw: DataFrame) -> DataFrame:
    """Native post-processing: class-name normalization exactly as
    layout_detector.py:143-146 (``name.replace('_','-').title().replace(' ','-')``
    == translate to spaces -> initcap -> translate back), confidence rounded
    to 4 dp and bbox to 2 dp (layout_detector.py:46-58). Pure column exprs —
    whole-stage codegen, no Python. Passes through enrichment columns
    (reading_order_rank, text) when the fused detect path produced them."""
    extra = [c for c in ("reading_order_rank", "text", "error") if c in raw.columns]
    return raw.select(
        "url",
        "page_no",
        "width",
        "height",
        "det_idx",
        "class_id",
        F.translate(F.initcap(F.translate(F.translate("raw_name", "_", "-"), "-", " ")), " ", "-")
        .alias("class_name"),
        F.round("confidence", 4).alias("confidence"),
        F.round("x1", 2).alias("x1"),
        F.round("y1", 2).alias("y1"),
        F.round("x2", 2).alias("x2"),
        F.round("y2", 2).alias("y2"),
        *extra,
    )
