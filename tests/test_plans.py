"""Physical-plan regression guards: the properties documented in
docs/PLANS.md must survive refactors — pushdown reaching the scan, the
single pre-rasterize repartition, the top-k group-limit pushdown, and cache
reuse of the enriched hub."""

import pytest
from pyspark.sql import functions as F

from paper_layout_parser_spark.corpus import build_pages
from paper_layout_parser_spark.operators.similarity import brute_force_topk
from paper_layout_parser_spark.plans.pipeline import run_pipeline

from .conftest import SF_SMALL


def plan_of(spark, df, mode="formatted") -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_filter_and_projection_reach_parquet_scan(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = plan_of(spark, docs.where(F.col("lang") == "en").select("doc_id", "n_chars"))
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>" in plan


def test_single_repartition_before_rasterize(spark, tmp_path):
    # production shape: the pipeline reads a pages TABLE (the generator's
    # own repartition is scaffolding, excluded by materializing first)
    path = str(tmp_path / "pages.parquet")
    build_pages(spark, SF_SMALL).limit(50).write.parquet(path)
    out = run_pipeline(spark.read.parquet(path), persist_enriched=False)
    plan = plan_of(spark, out.detections, "simple")
    # exactly one explicit repartition (the skew spread) upstream of detect
    assert plan.count("REPARTITION_BY_NUM") == 1
    assert "xxhash64(url" in plan


def test_topk_uses_window_group_limit(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = emb.where(F.col("vec_id") % 50 == 0)
    plan = plan_of(spark, brute_force_topk(emb, q, 5), "simple")
    # row_number() <= k recognized as a group limit, applied map-side too
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final


def test_branches_reuse_persisted_enriched(spark):
    pages = build_pages(spark, SF_SMALL).where(
        F.regexp_extract("url", r"([0-9]+)$", 1).cast("long") < 5
    )
    out = run_pipeline(pages)  # persist_enriched=True default
    out.enriched.count()       # materialize the cache
    plan = plan_of(spark, out.doc_text, "simple")
    assert "InMemoryTableScan" in plan
    # the UDF chain must NOT appear again above the cached scan
    assert "MapInPandas" not in plan.split("InMemoryRelation")[0]


def test_per_page_crop_math_is_pure_projection(spark):
    """Per-page clamping must not cost a plan shape: width/height ride as
    columns on matched (carried from the rasterized page), so crop_bounds
    and to_percent_coords compile to a single Project — no join-back
    against the pages table, no exchange."""
    from paper_layout_parser_spark.operators.crop import crop_bounds
    from paper_layout_parser_spark.operators.export import to_percent_coords

    matched = spark.createDataFrame(
        [("u", "figure", "fig_01_01", 1, 1224, 1584,
          100.0, 200.0, 300.0, 400.0, None, None, None, None)],
        "url string, item_type string, item_id string, page_number int, "
        "width int, height int, "
        "item_x1 double, item_y1 double, item_x2 double, item_y2 double, "
        "cap_x1 double, cap_y1 double, cap_x2 double, cap_y2 double",
    )
    for df in (crop_bounds(matched), to_percent_coords(matched)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1200]
        assert "Join" not in plan, plan[:1200]
