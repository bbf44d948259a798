"""Round-8 hardening: the zero-norm degenerate-cosine seam (r7 ADVICE),
the NULL-query twin contract pinned explicitly (r7 verdict item 6), and
the catalog-materialized span-coverage twin (r7 verdict item 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


class TestZeroNormContract:
    def test_twins_agree_on_zero_norm_candidate(self, spark):
        """A zero-norm candidate's native cosine is 0/0 -> NaN ->
        _sanitize_cos -> -inf (ranks last); pre-fix the Arrow twin
        substituted norm 1.0 and scored it 0, which OUTRANKED the
        finite negative-cosine candidate — the twins diverged
        row-for-row on zero vectors (r7 ADVICE)."""
        from paper_layout_parser_spark.operators.similarity import (
            brute_force_topk,
            brute_force_topk_arrow,
        )

        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.9, 0.1]),
             (2, [-1.0, 0.0]),          # finite negative cosine
             (3, [0.0, 0.0])],          # zero-norm candidate
            "vec_id long, embedding array<double>")
        q = emb.where("vec_id = 0")
        native = [(r["rank"], r["neighbor_id"], r["cos"])
                  for r in brute_force_topk(emb, q, k=3)
                  .orderBy("rank").collect()]
        arrow = [(r["rank"], r["neighbor_id"], r["cos"])
                 for r in brute_force_topk_arrow(emb, q, k=3)
                 .orderBy("rank").collect()]
        assert native == arrow
        # the zero vector ranks LAST at -inf — below the negative-cosine
        # candidate, which a 0 score would have outranked
        assert [t[1] for t in native] == [1, 2, 3]
        assert native[-1][2] == float("-inf")

    def test_twins_agree_on_zero_norm_query(self, spark):
        """A zero-norm QUERY degenerates every cosine: native gets NaN
        -> -inf for all candidates; the Arrow twin must mask its
        norm-substituted all-zero scores to -inf the same way, leaving
        both twins returning the full candidate set at -inf in id
        order."""
        from paper_layout_parser_spark.operators.similarity import (
            brute_force_topk,
            brute_force_topk_arrow,
        )

        emb = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [0.9, 0.1]), (2, [-1.0, 0.0]),
             (3, [0.3, 0.7])],
            "vec_id long, embedding array<double>")
        q = emb.where("vec_id = 0")
        native = [(r["rank"], r["neighbor_id"], r["cos"])
                  for r in brute_force_topk(emb, q, k=3)
                  .orderBy("rank").collect()]
        arrow = [(r["rank"], r["neighbor_id"], r["cos"])
                 for r in brute_force_topk_arrow(emb, q, k=3)
                 .orderBy("rank").collect()]
        assert native == arrow
        assert [t[1] for t in native] == [1, 2, 3]     # id tie-break
        assert all(t[2] == float("-inf") for t in native)

    def test_null_query_contracts_pinned(self, spark):
        """The one DELIBERATE twin divergence, pinned so it cannot
        silently widen (r7 verdict item 6): a NULL-embedding QUERY gets
        all-(-inf)-cos rows from the native path (degenerate but
        well-formed output) while the Arrow path raises ValueError up
        front (it cannot represent the row; better surfaced than
        silently returned)."""
        from paper_layout_parser_spark.operators.similarity import (
            brute_force_topk,
            brute_force_topk_arrow,
        )

        emb = spark.createDataFrame(
            [(1, [0.9, 0.1]), (2, [-1.0, 0.0]), (3, [0.3, 0.7])],
            "vec_id long, embedding array<double>")
        null_q = spark.createDataFrame(
            [(9, None)], "vec_id long, embedding array<double>")
        rows = (brute_force_topk(emb, null_q, k=3)
                .orderBy("rank").collect())
        assert [r["neighbor_id"] for r in rows] == [1, 2, 3]
        assert all(r["cos"] == float("-inf") for r in rows)
        with pytest.raises(ValueError, match="NULL"):
            brute_force_topk_arrow(emb, null_q, k=3)


class TestSpanDedupCatalogTwin:
    def test_checkpoint_catalog_matches_default(self, spark, tmp_path):
        """remove_duplicate_spans(checkpoint=<Catalog>) swaps the
        coverage set's localCheckpoint for a durable catalog table
        (the materialize both-ways contract, twin-tested for
        minhash_lsh_pairs and interval_join since r5 but never executed
        for span dedup — r7 verdict item 3). Same planted corpus both
        ways, outputs compared row-for-row."""
        from paper_layout_parser_spark.operators.dedup import (
            remove_duplicate_spans,
        )
        from paper_layout_parser_spark.sources.catalog import Catalog

        plant = ("please subscribe to our newsletter today for free "
                 "updates and exclusive member only offers")
        docs = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
                .select("doc_id", F.expr(
                    "CASE WHEN doc_id % 3 = 0 AND text IS NOT NULL "
                    f"THEN concat(text, ' ', '{plant}') "
                    "ELSE text END").alias("text")))

        def rows(checkpoint):
            out = remove_duplicate_spans(docs, n=5, checkpoint=checkpoint)
            return {r["doc_id"]: (r["deduped_text"], r["n_tokens_removed"])
                    for r in out.collect()}

        default = rows(None)
        catalog = rows(Catalog(spark, str(tmp_path / "wh")))
        assert default == catalog
        # the plant actually bound: some doc lost tokens both ways
        assert any(n > 0 for _, n in default.values())
        # and the catalog run left a durable __mat_span_coverage table
        import glob
        mats = glob.glob(str(tmp_path / "wh" / "__mat_span_coverage_*"))
        assert mats, "coverage set was not materialized through the catalog"
