"""Round-6 registry rotation: host_cap and registrable_domain seated as
driver-gate queries (VERDICT r5 ask #1), token_count merged into quality.
The cross-engine hash parity runs in the driver gate (and
scripts/check_correctness.py); these tests pin the SEMANTICS of the new
query surfaces so a gate-green-but-wrong fixture cannot hide."""

from __future__ import annotations

import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, ".")

import __spark_entry__ as e  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con


class TestHostCapQuery:
    def test_cap_binds_per_host(self, spark):
        out = e.q_host_cap(spark, SF)
        per_host = out.groupBy("host").count().collect()
        assert per_host  # non-vacuous
        assert all(r["count"] <= e._HOSTCAP_CAP for r in per_host)
        # every host present in the corpus keeps at least one doc: the
        # cap selects within hosts, it never eliminates a host
        n_hosts_in = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("source").distinct().count()
        )
        assert len(per_host) == n_hosts_in

    def test_matches_duckdb(self, spark, duck):
        got = {r["doc_id"] for r in e.q_host_cap(spark, SF).collect()}
        want = {r[0] for r in duck.sql(e.oracle_sql()["host_cap"]).fetchall()}
        assert got == want and got


class TestRegistrableDomainQuery:
    def test_domain_semantics_by_host_shape(self, spark):
        rows = e.q_registrable_domain(spark, SF).collect()
        by_mod = {}
        for r in rows:
            by_mod.setdefault(r["doc_id"] % 5, []).append(r)
        # mod 0: w{k}.{source}.co.uk -> {source}.co.uk (multi-label
        # suffix wins over bare 'uk')
        assert all(
            r["domain"] == ".".join(r["host"].split(".")[1:])
            and r["domain"].endswith(".co.uk")
            and not r["domain"].startswith("w")
            for r in by_mod[0]
        )
        # mod 1: {source}.com is already eTLD+1 — maps to itself
        assert all(r["domain"] == r["host"] for r in by_mod[1])
        # mod 2: a.b.{source}.github.io -> {source}.github.io (the
        # private-section suffix, not plain 'io')
        assert all(
            r["domain"] == ".".join(r["host"].split(".")[2:])
            and r["domain"].endswith(".github.io")
            for r in by_mod[2]
        )
        # mod 3: intranet host matches no suffix -> NULL
        assert all(r["domain"] is None for r in by_mod[3])
        # mod 4: bare suffix 'com' -> NULL (a suffix is not a domain)
        assert all(r["domain"] is None for r in by_mod[4])

    def test_matches_duckdb(self, spark, duck):
        got = {(r["doc_id"], r["domain"])
               for r in e.q_registrable_domain(spark, SF).collect()}
        want = {(r[0], r[2]) for r in
                duck.sql(e.oracle_sql()["registrable_domain"]).fetchall()}
        assert got == want and got


class TestQualityTokenMerge:
    def test_quality_carries_token_counts(self, spark):
        out = e.q_quality(spark, SF)
        assert {"ws_tokens", "re_tokens", "quality_score"} <= set(out.columns)
        r = out.where(F.col("ws_tokens") > 0).first()
        # BPE-ish tokens split punctuation off words: never fewer than
        # whitespace tokens on non-empty text
        assert r["re_tokens"] >= r["ws_tokens"]
