"""Randomized interval-join twin vs plain DuckDB range predicates:
seeded points/intervals over a tiny key pool and coarse grid so closed
boundaries (ts == start, ts == end), zero-width intervals, inverted
intervals, NULL keys and NULL endpoints, overlapping intervals, and
bucket-boundary spans (bucket_seconds far below interval width) all
occur densely. Both ``how`` modes run; 'left' also re-runs with the
caller-supplied ``id_col`` fast path, which must be row-identical."""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pytest

from paper_layout_parser_spark.operators.temporal import interval_join

BASE = dt.datetime(2026, 4, 1, 0, 0, 0)


def _corpus(rng: random.Random):
    users = [1, 2, None]
    grid = [BASE + dt.timedelta(seconds=15 * k) for k in range(10)]
    points = [(i, rng.choice(users), rng.choice(grid)) for i in range(50)]
    ivs = []
    for j in range(25):
        u = rng.choice(users)
        s = rng.choice(grid) if rng.random() > 0.07 else None
        if rng.random() < 0.15:
            e = s                              # zero-width
        elif rng.random() < 0.12 and s is not None:
            e = s - dt.timedelta(seconds=30)   # inverted: matches nothing
        elif rng.random() < 0.1:
            e = None
        else:
            e = (s or BASE) + dt.timedelta(seconds=15 * rng.randrange(0, 6))
        ivs.append((u, s, e, (j + 1) * 10))
    return points, ivs


def _duck(points, ivs, how):
    con = duckdb.connect()
    con.sql("CREATE TABLE p (i BIGINT, u BIGINT, ts TIMESTAMP)")
    con.sql("CREATE TABLE iv (u BIGINT, s TIMESTAMP, e TIMESTAMP, v BIGINT)")
    con.executemany("INSERT INTO p VALUES (?,?,?)", points)
    con.executemany("INSERT INTO iv VALUES (?,?,?,?)", ivs)
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return sorted((r[0], r[1]) for r in con.sql(f"""
SELECT p.i, iv.v FROM p {join} iv
ON p.u = iv.u AND iv.s <= p.ts AND p.ts <= iv.e
""").fetchall())


@pytest.mark.parametrize("seed,how", [(0, "inner"), (0, "left"),
                                      (1, "left")])
def test_interval_join_matches_duckdb(spark, seed, how):
    rng = random.Random(seed)
    points, ivs = _corpus(rng)
    pdf = spark.createDataFrame(points, "i long, u long, ts timestamp")
    idf = spark.createDataFrame(
        ivs, "u long, start timestamp, end timestamp, v long")
    out = interval_join(pdf, idf, on=["u"], ts_col="ts",
                        bucket_seconds=30, how=how)
    got = sorted((r["i"], r["v"]) for r in out.select("i", "v").collect())
    want = _duck(points, ivs, how)
    assert got == want
    # non-vacuous: matched pairs exist; left mode also has unmatched and
    # multi-interval points
    assert any(v is not None for _, v in got)
    if how == "left":
        assert any(v is None for _, v in got)
        ids = [i for i, _ in got]
        assert len(ids) > len(set(ids))

    if how == "left":
        fast = interval_join(pdf, idf, on=["u"], ts_col="ts",
                             bucket_seconds=30, how="left", id_col="i")
        got_fast = sorted((r["i"], r["v"])
                          for r in fast.select("i", "v").collect())
        assert got_fast == got
