"""Crop sink (K4) + coordinate helper (P5/P6/P9) tests."""

import base64

import pytest
from pyspark.sql import functions as F

from paper_layout_parser_spark import synthdata as sd
from paper_layout_parser_spark.corpus import build_pages
from paper_layout_parser_spark.operators.crop import (
    StubCropCodec,
    crop_bounds,
    crops_base64,
    normalized_to_pixel,
    pixel_to_pdf,
    render_crops,
)
from paper_layout_parser_spark.plans.pipeline import run_pipeline

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def out(spark):
    pages = build_pages(spark, SF_SMALL).where(
        F.regexp_extract("url", r"([0-9]+)$", 1).cast("long") < 10
    ).persist()
    return run_pipeline(pages)


def _ref_crop(bbox, page_w, page_h, dpi=200.0, padding=10.0):
    """Straight transcription of figure_extractor.py:56-72,108-142."""
    scale = 72.0 / dpi
    x0, y0 = bbox[0] * scale, bbox[1] * scale
    x1, y1 = bbox[2] * scale, bbox[3] * scale
    pad = padding * scale
    return (
        max(0.0, x0 - pad),
        max(0.0, y0 - pad),
        min(page_w * scale, x1 + pad),
        min(page_h * scale, y1 + pad),
    )


def test_bounds_match_reference_math(spark):
    # includes edge items that exercise BOTH clamps (x/y at 0, x/y at rect max)
    rows = [
        ("u", "figure", "fig_01_01", 1, 100.0, 200.0, 300.0, 400.0),
        ("u", "figure", "fig_01_02", 1, 5.0, 3.0, 60.0, 90.0),        # clamps at 0
        ("u", "table", "table_01_01", 1, 1000.0, 1500.0, 1224.0, 1584.0),  # clamps at rect
    ]
    df = spark.createDataFrame(
        rows,
        "url string, item_type string, item_id string, page_number int, "
        "item_x1 double, item_y1 double, item_x2 double, item_y2 double",
    )
    got = {r["item_id"]: r for r in crop_bounds(df, 1224.0, 1584.0).collect()}
    for _, _, iid, _, a, b, c, d in rows:
        exp = _ref_crop((a, b, c, d), 1224.0, 1584.0)
        r = got[iid]
        for k, e in zip(("pdf_x0", "pdf_y0", "pdf_x1", "pdf_y1"), exp):
            assert abs(r[k] - e) < 1e-9, (iid, k, r[k], e)
        # pixel rect = pdf rect * dpi/72
        for k, e in zip(("px_x0", "px_y0", "px_x1", "px_y1"), exp):
            assert abs(r[k] - e * 200.0 / 72.0) < 1e-6
    # clamp actually engaged
    assert got["fig_01_02"]["pdf_x0"] == 0.0
    assert got["table_01_01"]["pdf_x1"] == pytest.approx(1224.0 * 72.0 / 200.0)


def test_bounds_clamp_per_page_rect(spark):
    """Default (no scalar dims): the SAME bbox on pages of different sizes
    clamps against each page's own rect — figure_extractor.py:117-133 reads
    page.rect per page, never a corpus constant."""
    bbox = (1150.0, 1500.0, 1220.0, 1575.0)
    rows = [
        ("u", "figure", "fig_01_01", 1, 1224, 1584, *bbox),   # clamps
        ("u", "figure", "fig_02_01", 2, 1654, 2339, *bbox),   # doesn't
    ]
    df = spark.createDataFrame(
        rows,
        "url string, item_type string, item_id string, page_number int, "
        "width int, height int, "
        "item_x1 double, item_y1 double, item_x2 double, item_y2 double",
    )
    got = {r["item_id"]: r for r in crop_bounds(df).collect()}
    for iid, (w, h) in (("fig_01_01", (1224, 1584)), ("fig_02_01", (1654, 2339))):
        exp = _ref_crop(bbox, float(w), float(h))
        for k, e in zip(("pdf_x0", "pdf_y0", "pdf_x1", "pdf_y1"), exp):
            assert abs(got[iid][k] - e) < 1e-9, (iid, k)
    # the two pages disagree exactly where the small page's rect binds
    assert got["fig_01_01"]["pdf_x1"] == pytest.approx(1224.0 * 72.0 / 200.0)
    assert got["fig_01_01"]["pdf_y1"] == pytest.approx(1584.0 * 72.0 / 200.0)
    assert got["fig_02_01"]["pdf_x1"] == pytest.approx(1220.0 * 72.0 / 200.0 + 3.6)
    assert got["fig_02_01"]["pdf_y1"] == pytest.approx(1575.0 * 72.0 / 200.0 + 3.6)


def test_pipeline_corpus_mixes_page_sizes(out):
    """The synthetic corpus itself exercises the per-page path: matched rows
    carry width/height and more than one distinct page size flows into the
    default crop_bounds."""
    dims = {(r["width"], r["height"])
            for r in out.matched.select("width", "height").distinct().collect()}
    assert len(dims) >= 2
    assert dims <= set(sd.PAGE_SIZES)


def test_normalized_to_pixel_truncates_like_reference(spark):
    # annotator.py:461-483 uses int() truncation: 999 * 1224 / 1000 = 1222.776 -> 1222
    df = spark.createDataFrame([(999.0,), (500.0,), (1.0,), (0.0,)], "v double")
    got = [r["px"] for r in
           df.select(normalized_to_pixel(F.col("v"), 1224).alias("px"))
           .orderBy(F.desc("v")).collect()]
    ref = [int(v * 1224 / 1000) for v in (999, 500, 1, 0)]
    assert got == ref


def test_pixel_pdf_roundtrip(spark):
    df = spark.createDataFrame([(123.45,)], "v double")
    r = df.select(
        (pixel_to_pdf(F.col("v")) * 200.0 / 72.0).alias("back")
    ).first()
    assert r["back"] == pytest.approx(123.45, abs=1e-12)


def test_render_is_deterministic_and_schema_stable(spark, out):
    b = crop_bounds(out.matched, float(sd.PAGE_W), float(sd.PAGE_H))
    crops = render_crops(b, out.rasterized)
    rows1 = {r["item_id"] + r["url"]: bytes(r["crop"]) for r in crops.collect()}
    rows2 = {r["item_id"] + r["url"]: bytes(r["crop"]) for r in crops.collect()}
    assert rows1 == rows2
    assert len(rows1) == out.matched.count()  # one crop per item, none dropped
    blob = next(iter(rows1.values()))
    assert blob[:5] == b"CROP1"


def test_crop_dims_consistent_with_bounds(spark, out):
    # the bounds columns ride through the render UDF, so the sink row is
    # self-consistent without any re-join
    b = crop_bounds(out.matched, float(sd.PAGE_W), float(sd.PAGE_H))
    j = render_crops(b, out.rasterized)
    bad = j.where(
        (F.col("crop_w") != F.floor(F.col("px_x1") - F.col("px_x0")).cast("int"))
        | (F.col("crop_h") != F.floor(F.col("px_y1") - F.col("px_y0")).cast("int"))
    ).count()
    assert bad == 0


def test_base64_roundtrip(spark, out):
    b = crop_bounds(out.matched, float(sd.PAGE_W), float(sd.PAGE_H)).limit(20)
    crops = render_crops(b, out.rasterized).persist()
    b64df = crops_base64(crops)
    raw = {r["item_id"] + r["url"]: bytes(r["crop"]) for r in crops.collect()}
    enc = {r["item_id"] + r["url"]: r["crop_b64"] for r in b64df.collect()}
    assert set(raw) == set(enc) and len(raw) > 0
    for k, blob in raw.items():
        assert base64.standard_b64decode(enc[k]) == blob


from hypothesis import given, settings
from hypothesis import strategies as st

RECT = st.tuples(
    st.floats(0, 1200), st.floats(0, 1560),
    st.floats(1, 400), st.floats(1, 400),
).map(lambda t: (t[0], t[1], min(t[0] + t[2], 1224.0), min(t[1] + t[3], 1584.0)))


class TestCropProperties:
    @settings(max_examples=30, deadline=None)
    @given(rects=st.lists(RECT, min_size=1, max_size=8),
           padding=st.floats(0, 50))
    def test_bounds_always_inside_page_rect(self, spark, rects, padding):
        """Invariants from figure_extractor.py:108-142 for arbitrary boxes:
        crop rect stays inside [0, page_rect]; padding only grows the rect
        (up to the clamp); pixel rect is the pdf rect at dpi/72."""
        rows = [("u", "figure", f"fig_01_{i:02d}", 1, *r)
                for i, r in enumerate(rects)]
        df = spark.createDataFrame(
            rows,
            "url string, item_type string, item_id string, page_number int, "
            "item_x1 double, item_y1 double, item_x2 double, item_y2 double",
        )
        got = crop_bounds(df, 1224.0, 1584.0, padding=padding).collect()
        rect_w, rect_h = 1224.0 * 72.0 / 200.0, 1584.0 * 72.0 / 200.0
        zero_pad = {r["item_id"]: r for r in
                    crop_bounds(df, 1224.0, 1584.0, padding=0.0).collect()}
        for r in got:
            assert 0.0 <= r["pdf_x0"] <= r["pdf_x1"] <= rect_w + 1e-4
            assert 0.0 <= r["pdf_y0"] <= r["pdf_y1"] <= rect_h + 1e-4
            z = zero_pad[r["item_id"]]
            assert r["pdf_x0"] <= z["pdf_x0"] + 1e-9
            assert r["pdf_x1"] >= z["pdf_x1"] - 1e-9
            assert abs(r["px_x1"] - r["pdf_x1"] * 200.0 / 72.0) < 2e-2


def test_fitz_codec_gated():
    from paper_layout_parser_spark.operators.crop import FitzCropCodec

    try:
        import fitz  # type: ignore  # noqa: F401
        pytest.skip("fitz available — gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        FitzCropCodec()
