"""Randomized unicode fuzz of the quality/token surface: the Spark side
computes char-class counts with ``translate`` char-maps (the r8
curate-scaling rework) while the DuckDB oracle uses ``regexp_replace``
with ASCII classes — two genuinely independent formulations whose
equivalence was argued from 'the deletion sets are exactly the regex
classes' and verified only on the (ASCII) graded corpus. This fuzz
feeds both engines hostile unicode — NBSP, zero-width space, combining
accents, CJK, non-BMP emoji, vertical tab — and requires every feature
column to match exactly, reusing the graded oracle SQL verbatim
(``__spark_entry__._quality_sql`` over a registered ``documents``
table) so there is no third formula to drift."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from paper_layout_parser_spark.functions import text as tfn

# word pool: stopwords (exercise stopword_ratio), plain ASCII, digits,
# punctuation clusters, and the unicode hazards the ASCII corpus never
# contains.   NBSP and ​ ZWSP are NOT Java-\s or RE2-\s, so
# they must count as word characters on BOTH engines;  vertical
# tab IS in both \s sets; é is a combining accent (2 codepoints);
# the emoji are non-BMP (surrogate pairs in UTF-16, 1 codepoint each).
POOL = [
    "the", "a", "and", "of", "to", "in", "is",
    "word", "Common", "CRAWL", "xyzzy",
    "1234", "42", "3.14",
    "!!!", "?!", "...", "—", "«»",
    "café", "naïve", "Ωμέγα", "日本語テキスト", "🎉🚀",
    "x y", "a​b", "é", "tab\there",
]
WS = [" ", "  ", " \x0b ", "\n", " \t", "\f", "\r\n"]


def _random_text(rng: random.Random) -> str | None:
    r = rng.random()
    if r < 0.04:
        return None
    if r < 0.08:
        return ""
    if r < 0.12:
        return rng.choice([" ", "\t\n", "", " "])
    k = rng.randrange(1, 25)
    out = []
    for i in range(k):
        if i:
            out.append(rng.choice(WS))
        out.append(rng.choice(POOL))
    # leading/trailing NBSP locks the trim contract: Spark's F.trim
    # strips ASCII space only, so the oracle must pin trim(text, ' ')
    # (DuckDB's default trim also strips unicode whitespace — found by
    # the fingerprint fuzz, where an NBSP-leading doc lost its first
    # word's NBSP on the DuckDB side and every shingle shifted)
    if rng.random() < 0.25:
        out.insert(0, "\xa0")
    if rng.random() < 0.25:
        out.append("\xa0")
    return "".join(out)


@pytest.mark.parametrize("seed", [0, 1])
def test_quality_features_match_duckdb_on_unicode(spark, seed):
    rng = random.Random(seed)
    rows = [(i, _random_text(rng)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = tfn.quality_features(F.col("text"))
    counts = tfn.token_counts(F.col("text"))
    out = df.select(
        "doc_id",
        *[v.alias(k) for k, v in feats.items()],
        counts["ws_tokens"].cast("long").alias("ws_tokens"),
        counts["re_tokens"].cast("long").alias("re_tokens"),
    ).withColumn(
        "quality_score",
        tfn.score_from_features(
            F.col("stopword_ratio"), F.col("alpha_ratio"),
            F.col("punct_ratio"),
        ),
    )
    got = {r["doc_id"]: r.asDict() for r in out.collect()}

    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    cols = None
    want = {}
    for rec in con.sql(entry._quality_sql()).fetchall():
        if cols is None:
            cols = [d[0] for d in con.sql(entry._quality_sql()).description]
        want[rec[0]] = dict(zip(cols, rec))
    assert set(got) == set(want)
    for doc_id, g in got.items():
        w = want[doc_id]
        for c in cols:
            assert g[c] == w[c], (
                f"doc {doc_id} col {c}: spark={g[c]!r} duck={w[c]!r} "
                f"text={dict(rows)[doc_id]!r}")
    # non-vacuous: the pool actually produced unicode-bearing docs with
    # nonzero punct and stopword signal
    assert any((g["punct_ratio"] or 0) > 0 for g in got.values())
    assert any((g["stopword_ratio"] or 0) > 0 for g in got.values())
