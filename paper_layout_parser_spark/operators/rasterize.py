"""Doc -> pages flatMap (reference: pdf_converter.py:59-145), skew-aware.

The reference rasterizes one whole PDF at a time in a Python loop. At 100 TB
a single giant document (10^4 pages) hidden inside one row becomes a
straggler task, so the Spark version splits work at the (url, page_range)
grain BEFORE the expensive stage:

  1. ``probe_pages``     — cheap metadata probe (page count only; the real
                           backend is ``fitz.open(...).page_count``).
  2. ``plan_splits``     — explode each doc into page-range chunks and
                           hash-repartition on (url, chunk) so giant docs
                           spread across the cluster. Each chunk row carries
                           ONLY its own pages' bytes (payload ∝ chunk pages):
                           shipping the whole document per chunk would
                           amplify the heaviest column by the very skew
                           factor the split defends against (a 10^4-page doc
                           at 16 pages/chunk = 625 copies through the
                           exchange). The synthetic PLP1 container is
                           page-sliceable; for real PDFs the chunk payload
                           becomes an object-store reference + page range
                           (fitz opens lazily per range) instead of bytes.
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
    "url string, page_no int, width int, height int, page_payload binary, "
    "render_checksum long, error string"
)


def _probe_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..synthdata import html_page_count

    for pdf in it:
        counts = [html_page_count(bytes(p)) for p in pdf["html"]]
        yield pd.DataFrame({"url": pdf["url"], "total_pages": counts})


def probe_pages(pages: DataFrame) -> DataFrame:
    """(url, total_pages) — the S3 metadata probe (pdf_converter.py:29-57)."""
    return pages.select("url", "html").mapInPandas(
        _probe_batches, schema="url string, total_pages int"
    )


def _slice_chunk(pages_list: list[dict], start: int, end: int) -> bytes:
    """Re-wrap pages[start:end) (1-indexed page_no) in the PLP1 container —
    the chunk payload holds only its own pages' bytes."""
    import struct

    chunk = [pg for pg in pages_list if start <= pg["page_no"] < end]
    body = json.dumps({"v": 1, "pages": chunk}, separators=(",", ":")).encode()
    return b"PLP1" + struct.pack(">I", len(chunk)) + body


def _plan_batches_factory(chunk_pages: int):
    from ..synthdata import html_page_count

    def _plan_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            urls, htmls, starts, ends = [], [], [], []
            for url, payload in zip(pdf["url"], pdf["html"]):
                payload = bytes(payload)
                total = html_page_count(payload)  # header: page count
                if total <= chunk_pages:
                    # single-chunk fast path: ship the original bytes as-is,
                    # no parse (the common case — median docs are small)
                    urls.append(url)
                    htmls.append(payload)
                    starts.append(1)
                    ends.append(total + 1)
                    continue
                # multi-chunk doc: parse ONCE, slice per chunk so each chunk
                # row carries only its own pages through the shuffle. The
                # WHOLE parse+slice is inside the try: a body that is valid
                # JSON but whose page entries are malformed (header claims 64
                # pages, body is {"pages":[1,2,3]}) raises inside
                # _slice_chunk, not the stage. Slices buffer locally so a
                # mid-slice failure never emits a partial chunk set.
                try:
                    pages_list = json.loads(payload[8:])["pages"]
                    sliced = []
                    for start in range(1, total + 1, chunk_pages):
                        end = min(start + chunk_pages, total + 1)
                        sliced.append((_slice_chunk(pages_list, start, end),
                                       start, end))
                except Exception:  # noqa: BLE001 — C6: never fail the stage
                    # corrupt body or page entries: ship the original bytes
                    # as ONE chunk so the rasterize stage turns it into a
                    # quarantine row (same containment path as any other
                    # bad page)
                    urls.append(url)
                    htmls.append(payload)
                    starts.append(1)
                    ends.append(total + 1)
                    continue
                for chunk_payload, start, end in sliced:
                    urls.append(url)
                    htmls.append(chunk_payload)
                    starts.append(start)
                    ends.append(end)
            yield pd.DataFrame({
                "url": urls, "html": htmls,
                "page_start": starts, "page_end": ends,
            })
    return _plan_batches


def plan_splits(pages: DataFrame, chunk_pages: int = DEFAULT_CHUNK_PAGES,
                num_partitions: int | None = None) -> DataFrame:
    """Explode each document into (url, html, page_start, page_end) chunks
    and spread them with a hash repartition — the giant-PDF skew defense.

    One mapInPandas pass does the metadata probe AND the chunk fan-out
    (a join against a separate probe would recompute the upstream lineage
    twice and shuffle the html payloads an extra time). The real backend's
    probe is fitz's page_count — cheap relative to rendering. Chunk payload
    is sliced to the chunk's own pages (payload ∝ pages, never ∝ doc).
    """
    planned = pages.select("url", "html").mapInPandas(
        _plan_batches_factory(chunk_pages),
        schema="url string, html binary, page_start int, page_end int",
    )
    if num_partitions is None:
        num_partitions = pages.sparkSession.sparkContext.defaultParallelism * 2
    # hash on (url, page_start): chunks of one giant doc land on different tasks
    return planned.repartition(num_partitions, F.xxhash64("url", "page_start"))


_RENDER_PASSES = 40  # calibrated to ~6 ms/page (fitz at 200 DPI: 20-50 ms)


def _render_page(pg: dict) -> int:
    """Actually render the page bitmap (the reference renders at
    zoom = dpi/72, pdf_converter.py:84-96) and return a deterministic
    checksum. The pixmap itself is not shipped (intermediate, like the
    reference's PNG files — SURVEY K3), but the render cost is real:
    block rect fills plus cache-resident smoothing/compositing passes at
    quarter resolution, deliberately CPU-bound (in-place float math on an
    L2-resident buffer) so throughput and N-vs-4N scaling numbers reflect
    the actual workload's compute profile rather than a no-op stub."""
    import numpy as np

    img = np.zeros((pg["height"] // 4, pg["width"] // 4), dtype=np.float32)
    for blk in pg["blocks"]:
        x1, y1, x2, y2 = (int(v) // 4 for v in blk["bbox"])
        img[y1:y2, x1:x2] = blk["conf"]
    for _ in range(_RENDER_PASSES):
        img[1:, :] += img[:-1, :]
        img[:, 1:] += img[:, :-1]
        img *= 0.25
        np.sqrt(img, out=img)
    return int(img.sum() * 1000) % (1 << 31)


def _rasterize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        cols: dict[str, list] = {
            "url": [], "page_no": [], "width": [], "height": [],
            "page_payload": [], "render_checksum": [], "error": [],
        }

        def emit(url, page_no, w, h, payload, cks, err):
            cols["url"].append(url)
            cols["page_no"].append(page_no)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["page_payload"].append(payload)
            cols["render_checksum"].append(cks)
            cols["error"].append(err)

        for url, payload, start, end in zip(
            pdf["url"], pdf["html"], pdf["page_start"], pdf["page_end"]
        ):
            try:
                doc = json.loads(bytes(payload)[8:])  # skip the PLP1 header
                # materialize the page filter inside the try: a valid-JSON
                # body whose entries aren't page dicts (C6) must quarantine
                # the doc chunk, not fail the task
                in_range = [pg for pg in doc["pages"]
                            if start <= pg["page_no"] < end]
            except Exception as exc:  # noqa: BLE001 — C6 quarantine semantics
                emit(url, int(start), 0, 0, None, -1,
                     f"{type(exc).__name__}: {exc}")
                continue
            for pg in in_range:
                try:
                    emit(url, pg["page_no"], pg["width"], pg["height"],
                         json.dumps(pg, separators=(",", ":")).encode(),
                         _render_page(pg), None)
                except Exception as exc:  # noqa: BLE001
                    emit(url, pg.get("page_no", int(start)), 0, 0, None, -1,
                         f"{type(exc).__name__}: {exc}")
        yield pd.DataFrame(cols)


def rasterize_pages(planned: DataFrame) -> DataFrame:
    """(url, html, page_start, page_end) -> one row per page (P1)."""
    return planned.mapInPandas(_rasterize_batches, schema=PAGE_SCHEMA)


def rasterize(pages: DataFrame, chunk_pages: int = DEFAULT_CHUNK_PAGES,
              num_partitions: int | None = None) -> DataFrame:
    """Convenience: plan + rasterize."""
    return rasterize_pages(plan_splits(pages, chunk_pages, num_partitions))
