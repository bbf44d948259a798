"""Randomized as-of join twin vs DuckDB's NATIVE ASOF JOIN: seeded
event sets over a tiny user pool and a coarse timestamp grid, so exact
timestamp ties, boundary-equal matches, multiple-candidate histories,
and unmatched rows all occur densely; NULL keys and NULL timestamps
ride along (both engines: NULLs never match). Both directions are
checked, and the ``hot_key_ranges`` split path must be row-identical
to the unsplit window under the documented unique-(key, ts)
right-side contract. The graded asof query checks one fixed corpus;
this walks the tie/boundary grid no fixture enumerates."""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pytest

from paper_layout_parser_spark.operators.temporal import asof_join

BASE = dt.datetime(2026, 3, 1, 12, 0, 0)


def _corpus(rng: random.Random):
    users = [1, 2, 3, None]
    grid = [BASE + dt.timedelta(seconds=10 * k) for k in range(12)]
    left = []
    for i in range(70):
        u = rng.choice(users)
        ts = None if rng.random() < 0.06 else rng.choice(grid)
        left.append((i, u, ts))
    right, seen = [], set()
    for _ in range(40):
        u = rng.choice(users)
        ts = None if rng.random() < 0.08 else rng.choice(grid)
        if (u, ts) in seen:
            continue                      # unique-(key, ts) contract
        seen.add((u, ts))
        right.append((u, ts, len(seen) * 100))
    return left, right


def _duck(left, right, op):
    con = duckdb.connect()
    con.sql("CREATE TABLE l (event_id BIGINT, user_id BIGINT, ts TIMESTAMP)")
    con.sql("CREATE TABLE r (user_id BIGINT, ts TIMESTAMP, value BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", left)
    con.executemany("INSERT INTO r VALUES (?,?,?)", right)
    # The operator's strict-SQL contract: a NULL ts NEVER matches, on
    # either side. DuckDB's native ASOF instead treats NULL ts as a
    # sortable extreme — a NULL-ts right row pairs with a NULL-ts left
    # row, and a NULL-ts LEFT row pairs with the key's LATEST right row
    # (pinned below) — so both sides are pre-filtered and the NULL-ts
    # left rows re-attach as unmatched.
    return {r[0]: r[1] for r in con.sql(f"""
WITH lm AS (SELECT * FROM l WHERE ts IS NOT NULL),
rm AS (SELECT * FROM r WHERE ts IS NOT NULL)
SELECT lm.event_id, rm.value
FROM lm ASOF LEFT JOIN rm ON lm.user_id = rm.user_id AND lm.ts {op} rm.ts
UNION ALL
SELECT event_id, NULL FROM l WHERE ts IS NULL
""").fetchall()}


@pytest.mark.parametrize("seed,direction,op",
                         [(0, "backward", ">="), (1, "backward", ">="),
                          (0, "forward", "<=")])
def test_asof_matches_native_duckdb(spark, seed, direction, op):
    rng = random.Random(seed)
    left, right = _corpus(rng)
    ldf = spark.createDataFrame(
        left, "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(
        right, "user_id long, ts timestamp, value long")
    out = asof_join(ldf, rdf, on=["user_id"], ts_col="ts",
                    direction=direction)
    got = {r["event_id"]: r["value_r"] for r in out.collect()}
    want = _duck(left, right, op)
    assert got == want
    # non-vacuous: ties/boundaries produced matches AND unmatched rows
    matched = [v for v in got.values() if v is not None]
    assert matched and len(matched) < len(got)

    # the hot-key split path must reproduce the unsplit result exactly
    split = asof_join(ldf, rdf, on=["user_id"], ts_col="ts",
                      direction=direction, hot_key_ranges=3)
    got_split = {r["event_id"]: r["value_r"] for r in split.collect()}
    assert got_split == got


def test_duckdb_null_ts_pairing_quirk_pinned(spark):
    """The reason the fuzz oracle pre-filters BOTH sides: DuckDB's
    native ASOF (measured on 1.0) treats a NULL timestamp as a sortable
    extreme — NULL-ts pairs with NULL-ts on the same key, and a NULL-ts
    LEFT row pairs with the key's latest real right row — while this
    operator follows strict SQL (NULL ts never matches, either side).
    Asserted from both engines so a DuckDB behavior change or an
    operator regression both surface here."""
    con = duckdb.connect()
    con.sql("CREATE TABLE l (i INT, u INT, ts TIMESTAMP)")
    con.sql("CREATE TABLE r (u INT, ts TIMESTAMP, v INT)")
    con.sql("INSERT INTO l VALUES (1, 1, NULL)")
    con.sql("INSERT INTO r VALUES (1, NULL, 999)")
    assert con.sql("SELECT r.v FROM l ASOF LEFT JOIN r ON l.u = r.u "
                   "AND l.ts >= r.ts").fetchone()[0] == 999
    con.sql("DELETE FROM r")
    con.sql("INSERT INTO r VALUES (1, '2026-03-01 12:00:00', 100), "
            "(1, '2026-03-01 12:05:00', 200)")
    # NULL-ts LEFT row: DuckDB pairs it with the LATEST right row
    assert con.sql("SELECT r.v FROM l ASOF LEFT JOIN r ON l.u = r.u "
                   "AND l.ts >= r.ts").fetchone()[0] == 200
    ldf = spark.createDataFrame([(1, 1, None)],
                                "i long, u long, ts timestamp")
    rdf = spark.createDataFrame([(1, None, 999)],
                                "u long, ts timestamp, v long")
    out = asof_join(ldf, rdf, on=["u"], ts_col="ts")
    assert out.collect()[0]["v_r"] is None
