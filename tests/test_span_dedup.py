"""remove_duplicate_spans (corpus-wide duplicate n-gram span removal —
the Lee-et-al exact-substring-dedup analog): cross-engine DuckDB twin
lives HERE because the driver registry is frozen at its 50-entry
oracle-first contract — same oracle rigor, executed in pytest (the
host_cap/deterministic_shuffle pattern)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from paper_layout_parser_spark.operators.dedup import remove_duplicate_spans

SF = "/root/testdata/sf0.01"
N = 5

# a boilerplate sentence planted into every third document — the
# cross-document duplicated span the operator exists to remove
PLANT = "please subscribe to our newsletter today for free updates"
# text IS NOT NULL guard keeps the plant NULL-symmetric across engines
# (DuckDB concat skips NULL args, Spark concat NULL-propagates)
SPARK_TEXT = (
    "CASE WHEN doc_id % 3 = 0 AND text IS NOT NULL "
    "THEN concat(text, ' ', '" + PLANT + "') ELSE text END"
)


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", F.expr(SPARK_TEXT).alias("text")))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents_raw AS "
            f"SELECT * FROM '{SF}/documents.parquet'")
    con.sql("CREATE VIEW documents AS SELECT doc_id, "
            f"CASE WHEN doc_id % 3 = 0 AND text IS NOT NULL "
            f"THEN concat(text, ' ', '{PLANT}') "
            "ELSE text END AS text FROM documents_raw")
    return con


def _oracle_sql(n: int, min_count: int) -> str:
    # shared builder — the graded registry twin (__spark_entry__) uses
    # the same one, so the two DuckDB checks cannot drift (both are
    # DuckDB-side; Spark/oracle independence is unaffected)
    from paper_layout_parser_spark.synthdata import span_dedup_oracle_sql

    return span_dedup_oracle_sql(n, min_count, docs_table="documents")


class TestRemoveDuplicateSpans:
    @pytest.mark.parametrize("min_count", [2, 3])
    def test_matches_duckdb(self, docs, duck, min_count):
        got = {r["doc_id"]: (r["deduped_text"], r["n_tokens_removed"])
               for r in remove_duplicate_spans(
                   docs, n=N, min_count=min_count).collect()}
        want = {r[0]: (r[1], r[2])
                for r in duck.sql(_oracle_sql(N, min_count)).fetchall()}
        assert got == want
        # non-vacuous: the planted boilerplate was actually removed
        removed = sum(1 for _, (_, nr) in got.items() if nr > 0)
        assert removed >= len(got) // 3

    def test_planted_span_removed_everywhere(self, docs):
        out = remove_duplicate_spans(docs, n=N)
        survivors = out.where(
            F.col("deduped_text").contains(PLANT)).count()
        assert survivors == 0
        # documents without the plant keep their text only if none of
        # their own windows repeat corpus-wide; every row is present
        assert out.count() == docs.count()

    def test_short_null_and_within_doc_repeats(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"),               # < n words: untouched
             (2, None),                             # NULL untouched -> NULL
             (3, "x y z w v x y z w v tail"),       # within-doc repeat
             (4, "unique words only here today now"),
             # leading \n + trailing \t: F.trim would leave phantom ''
             # boundary tokens (trim strips only ASCII spaces) that
             # could turn a 4-word repeat into a 5-window match — the
             # filter-empties tokenization must see exactly 6 words
             (5, "\nquick brown foxes jumping over fences\t"),
             (6, "quick brown foxes jumping over fences"),
             (None, "rows with a null id keep their text verbatim ok")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: (r["deduped_text"], r["n_tokens_removed"])
               for r in remove_duplicate_spans(df, n=5).collect()}
        assert out[1] == ("alpha beta gamma", 0)
        # NULL text yields no windows -> untouched -> passes through
        # byte-identical, i.e. stays NULL (not coerced to '')
        assert out[2] == (None, 0)
        # 'x y z w v' occurs twice within doc 3 -> both spans removed
        assert out[3] == ("tail", 10)
        assert out[4] == ("unique words only here today now", 0)
        # docs 5 and 6 share all 6 words -> every window duplicated;
        # the whitespace-wrapped twin must dedup IDENTICALLY to the
        # clean one (phantom tokens would desynchronize the windows)
        assert out[5] == ("", 6) and out[6] == ("", 6)
        # NULL id: one ordinary group (null-safe joins), text kept —
        # a plain equi-join would silently empty it
        assert out[None] == ("rows with a null id keep their text verbatim ok", 0)

    def test_untouched_docs_byte_identical(self, spark):
        """The touched-docs gate contract: documents with zero covered
        positions come back with deduped_text == text byte-for-byte —
        internal multi-space runs, newlines, tabs, and leading/trailing
        whitespace all preserved (the pre-gate implementation
        whitespace-normalized EVERY document, breaking the pipeline's
        byte-identity north star for 95%+ of the corpus)."""
        gnarly = "para one\n\n  indented\tline   wide gaps \n trailing "
        df = spark.createDataFrame(
            [(1, gnarly),
             (2, "spam spam spam spam spam unique one"),
             (3, "spam spam spam spam spam unique two"),
             (4, " nbsp　ideographic space kept verbatim ")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: (r["deduped_text"], r["n_tokens_removed"])
               for r in remove_duplicate_spans(df, n=5).collect()}
        # untouched: byte-identical, including the trailing space
        assert out[1] == (gnarly, 0)
        assert out[4] == (" nbsp　ideographic space kept "
                          "verbatim ", 0)
        # touched docs still reassemble single-spaced ('spam'x5 AND
        # 'spam'x4+'unique' windows are both shared -> 6 tokens covered)
        assert out[2] == ("one", 6)
        assert out[3] == ("two", 6)

    def test_partitioning_invariance(self, docs):
        a = {r["doc_id"]: r["deduped_text"]
             for r in remove_duplicate_spans(docs, n=N).collect()}
        b = {r["doc_id"]: r["deduped_text"]
             for r in remove_duplicate_spans(
                 docs.repartition(13), n=N).collect()}
        assert a == b


def test_curate_documents_span_ngrams(spark):
    """span_ngrams= composes into the curation funnel after line dedup:
    a boilerplate sentence pasted MID-LINE into several documents (so
    line dedup cannot see it) is removed corpus-wide, and the output
    contract (one row per surviving doc, split column) holds."""
    from paper_layout_parser_spark.plans.corpus_build import (
        curate_documents,
    )

    # marker-free tokens: any English stopword would flip predicted_lang
    # to 'en' and the funnel's lang rule (lang='und') would drop the doc
    plant = "zeta omega sigma delta kappa lambda upsilon theta"
    rows = [(f"https://s{i}.example/d/{i}",
             f"document{i} corpus{i} body{i} begins {plant} ends "
             f"uniquely token{i} tail{i}")
            for i in range(6)]
    rows += [(f"https://s{i}.example/d/{i}",
              f"standalone document{i} holding entirely unique content "
              f"topic{i} solo{i}")
             for i in range(6, 10)]
    docs = spark.createDataFrame(rows, "url string, doc_text string")
    _, curated, _ = curate_documents(
        docs, lang="und", min_quality=0.0, span_ngrams=5)
    got = curated.collect()
    assert len(got) == 10
    assert all("split" in r.asDict() for r in got)
    assert all(plant not in r["clean_text"] for r in got)
    # untouched docs keep their text verbatim (single-line, no dup spans)
    solo = {r["url"]: r for r in got if "standalone" in r["clean_text"]}
    assert len(solo) == 4 and all(
        r["n_tokens_removed"] == 0 for r in solo.values())


def test_null_id_touched_doc_matches_oracle(spark):
    """A NULL-id document that CONTAINS a duplicated span must
    reassemble on BOTH engines (r7 review finding: the oracle formerly
    joined touched/clean USING (doc_id), which never matches NULL, so
    it silently routed touched NULL-id docs to the untouched branch
    while the operator's eqNullSafe joins reassembled them)."""
    import duckdb as _dd

    rows = [(1, "shared boilerplate sentence repeated across documents one"),
            (None, "shared boilerplate sentence repeated across documents two"),
            (3, "completely different unique content in this third row")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["deduped_text"], r["n_tokens_removed"])
           for r in remove_duplicate_spans(df, n=5).collect()}
    con = _dd.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2])
            for r in con.sql(_oracle_sql(5, 2)).fetchall()}
    assert got == want
    # and the NULL-id doc really was touched (non-vacuous)
    assert got[None][1] > 0


@pytest.mark.parametrize("seed,n", [(0, 3), (1, 5), (2, 4)])
def test_random_corpus_matches_duckdb(spark, seed, n):
    """Seeded randomized corpora over a TINY vocabulary (4 words, doc
    lengths 0-18) so duplicated windows arise naturally and interact:
    overlapping covered spans, within-doc repeats, fully-covered docs,
    sub-n docs, NULL/empty/whitespace-only texts and a NULL id all in
    one corpus — the full output (text + removal count) must match the
    shared DuckDB oracle row-for-row. Catches reassembly edge cases no
    hand-planted fixture enumerates."""
    import random

    import duckdb as _dd

    rng = random.Random(seed)
    # 4-word vocabulary: 4^5=1024 possible 5-grams against ~500 windows
    # in the corpus, so duplicated windows are near-certain at every n
    # (an 8-word vocab left seed 1 with zero repeated 5-grams and the
    # non-vacuity guard below failed)
    vocab = ["ab", "cd", "ef", "gh"]
    rows = []
    for i in range(40):
        r = rng.random()
        if r < 0.05:
            text = None
        elif r < 0.10:
            text = ""
        elif r < 0.15:
            text = " \t\n"
        else:
            words = [rng.choice(vocab)
                     for _ in range(rng.randrange(0, 19))]
            # random gnarly whitespace wrapping on a fifth of docs:
            # untouched ones must come back byte-identical anyway
            text = " ".join(words)
            if rng.random() < 0.2:
                text = "\n " + text.replace(" ", "  ", 1) + "\t"
        rows.append((None if i == 17 else i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["deduped_text"], r["n_tokens_removed"])
           for r in remove_duplicate_spans(df, n=n).collect()}
    con = _dd.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2])
            for r in con.sql(_oracle_sql(n, 2)).fetchall()}
    assert got == want
    # non-vacuous: the tiny vocabulary must actually produce removals
    assert any(nr > 0 for _, nr in got.values())
