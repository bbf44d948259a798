"""Rounding-primitive fuzz: ``round_half_up`` (Spark) and
``sql_round_half_up`` (DuckDB) share one explicit floor-based formula
precisely so engine-native ROUND semantics (banker's vs half-up vs
decimal-context) can never leak into an oracle comparison. This fuzz
holds the two engines to bit-identical doubles on hostile values —
exact .5 ties (positive and negative), dyadic and non-dyadic
fractions, large magnitudes, float dust near ties — at every digits
level the oracles use (2, 4, 6). Both engines evaluate the same IEEE
double expression, so equality is exact, not approximate."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from paper_layout_parser_spark.functions.geometry import round_half_up
from paper_layout_parser_spark.synthdata import sql_round_half_up

EDGE = [
    0.5, -0.5, 1.5, -1.5, 2.5, -2.5,
    0.125, -0.125, 0.005, -0.005, 0.0050000001, 0.0049999999,
    0.445, 0.4449999999999999, 0.44500000000000001,
    123456.789, -123456.789, 1e12 + 0.5, -1e12 - 0.5,
    0.0, -0.0, 1 / 3, -1 / 3, 2 / 3, 0.1 + 0.2,
]


@pytest.mark.parametrize("digits", [2, 4, 6])
def test_round_half_up_matches_duckdb(spark, digits):
    rng = random.Random(digits)
    vals = EDGE + [rng.uniform(-1e6, 1e6) for _ in range(200)] + [
        # values engineered to land ON the tie at this digits level
        round(rng.randrange(-10**6, 10**6) / 2, digits + 1)
        for _ in range(100)
    ]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, x double")
    got = {r["i"]: r["y"] for r in df.select(
        "i", round_half_up(F.col("x"), digits).alias("y")).collect()}
    con = duckdb.connect()
    con.sql("CREATE TABLE t (i BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {r[0]: r[1] for r in con.sql(
        f"SELECT i, {sql_round_half_up('x', digits)} FROM t").fetchall()}
    for i, v in rows:
        # exact IEEE equality — same formula, same doubles, no epsilon
        assert got[i] == want[i], (
            f"x={v!r} digits={digits}: spark={got[i]!r} duck={want[i]!r}")
