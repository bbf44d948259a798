"""Round-7 hardening: IVF index reuse (centroids= / assigned=) and the
span-dedup touched-docs gate's plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestIvfIndexReuse:
    def test_pretrained_index_matches_default_path(self, spark):
        """ivf_topk(centroids=, assigned=) — the production shape where
        one trained index serves many query batches — must return
        exactly what the train-inside call returns for the same
        (deterministic) training configuration."""
        from paper_layout_parser_spark.operators.similarity import (
            assign_clusters,
            ivf_topk,
            train_ivf_centroids,
        )

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = emb.where("vec_id < 4")
        kw = dict(k=5, num_centroids=8, nprobe=3, dim=64, max_iter=2)
        want = {(r["query_id"], r["rank"], r["neighbor_id"], r["cos"])
                for r in ivf_topk(emb, q, **kw).collect()}
        cents = train_ivf_centroids(emb, num_centroids=8, max_iter=2,
                                    dim=64)
        idx = assign_clusters(emb, cents, "embedding", "cluster")
        got = {(r["query_id"], r["rank"], r["neighbor_id"], r["cos"])
               for r in ivf_topk(emb, q, centroids=cents, assigned=idx,
                                 **kw).collect()}
        assert got == want and got
        # centroids= alone (assignment recomputed) also matches
        got2 = {(r["query_id"], r["rank"], r["neighbor_id"], r["cos"])
                for r in ivf_topk(emb, q, centroids=cents,
                                  **kw).collect()}
        assert got2 == want

    def test_assigned_requires_centroids(self, spark):
        from paper_layout_parser_spark.operators.similarity import (
            ivf_topk,
        )

        emb = spark.createDataFrame(
            [(0, [1.0, 0.0], 0)],
            "vec_id long, embedding array<double>, cluster int")
        with pytest.raises(ValueError, match="centroids"):
            ivf_topk(emb, emb, assigned=emb, dim=2)


class TestSpanDedupGatePlan:
    def test_untouched_corpus_reassembles_nothing(self, spark):
        """With zero duplicated windows, the gate's semi-join drives
        the reassembly legs to an empty set: output equals input text
        byte-for-byte for every row and nothing is removed."""
        from paper_layout_parser_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        docs = spark.createDataFrame(
            [(i, f"entirely unique text number{i} alpha{i} beta{i} "
                 f"gamma{i} delta{i} epsilon{i} zeta{i} eta{i}")
             for i in range(20)],
            "doc_id long, text string",
        )
        out = remove_duplicate_spans(docs, n=5)
        rows = {r["doc_id"]: r for r in out.collect()}
        src = {r["doc_id"]: r["text"] for r in docs.collect()}
        assert all(rows[i]["deduped_text"] == src[i] for i in src)
        assert all(rows[i]["n_tokens_removed"] == 0 for i in src)
