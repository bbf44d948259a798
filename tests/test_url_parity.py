"""URL canonicalization cross-engine parity fuzz: Spark's native
``try_parse_url`` path vs the DuckDB regexp twin (``url_host_sql`` /
``canonical_url_sql``) on well-formed-but-unusual URLs — the territory
the twin's docstring claims ("matches Spark's parse_url HOST for
well-formed absolute URLs"). At 100 TB every unusual-but-legal shape
exists; the r8 probe that seeded this test caught the twin truncating
bracketed IPv6 hosts (``http://[::1]:8080/`` → host ``[``) because the
host regex treated the literal's colons as a port delimiter.

Malformed input is OUT of the claimed equivalence: Spark's try_ parse
returns NULL where the regex returns empty components — that contract
is pinned separately below, not fuzzed for parity."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from paper_layout_parser_spark.functions.url import (
    canonical_url,
    canonical_url_sql,
    url_host,
    url_host_sql,
)

EDGE_URLS = [
    "http://Host.TLD:80/path/?utm_source=x",
    "https://user:pw@EXAMPLE.com:8443/A/B//?q=1&utm_b=2#frag",
    "http://[::1]:8080/x?a=1",
    "https://[2001:db8::1]/p",
    "https://user@[2001:DB8::1]:443/p?utm_x=1&k=v#f",
    "HTTP://a.b/",
    "http://a.b",
    "http://a.b/?",
    "http://a.b/p?#f",
    "http://a.b/p??x=1",
    "ftp+ssh://h.d/p",
    "http://a.b/p/?utm_source=1&utm_medium=2",
    "http://a.b/p%20q?x=%26",
    "http://xn--nxasmq6b.example/p",
    "http://a.b:65536/p",
    "http://a.b./p",
    "http://192.168.0.1:8080/admin/?token=x",
]

SCHEMES = ["http", "HTTPS", "ftp", "ws+tls"]
HOSTS = ["example.com", "A.B.C.example", "192.168.7.9", "xn--bcher-kva.de",
         "[::1]", "[2001:db8::AB]", "host-with-dash.io", "a.b."]
PATHS = ["", "/", "/p", "/A/B//", "/p%20q", "/deep/er/path/"]
QUERIES = [None, "", "q=1", "utm_source=x", "q=1&utm_a=2&z=%26",
           "utm_a=1&utm_b=2", "a=b&c=d"]
FRAGS = [None, "", "frag", "f?x=1"]


def _random_url(rng: random.Random) -> str:
    s = rng.choice(SCHEMES)
    user = rng.choice(["", "u@", "u:p@"])
    h = rng.choice(HOSTS)
    port = rng.choice(["", ":80", ":8443"])
    path = rng.choice(PATHS)
    q = rng.choice(QUERIES)
    f = rng.choice(FRAGS)
    url = f"{s}://{user}{h}{port}{path}"
    if q is not None:
        url += "?" + q
    if f is not None:
        url += "#" + f
    return url


@pytest.mark.parametrize("seed", [0, 1])
def test_canonicalization_matches_duckdb(spark, seed):
    rng = random.Random(seed)
    urls = EDGE_URLS + [_random_url(rng) for _ in range(60)]
    rows = list(enumerate(urls))
    df = spark.createDataFrame(rows, "i long, url string")
    got = {r["i"]: (r["h"], r["c"])
           for r in df.select(
               "i",
               url_host(F.col("url")).alias("h"),
               canonical_url(F.col("url")).alias("c"),
           ).collect()}
    con = duckdb.connect()
    con.sql("CREATE TABLE t (i BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2])
            for r in con.sql(
                f"SELECT i, {url_host_sql('url')}, "
                f"{canonical_url_sql('url')} FROM t").fetchall()}
    for i, u in enumerate(urls):
        assert got[i] == want[i], (
            f"url {u!r}: spark={got[i]} duck={want[i]}")


def test_malformed_contract_is_null_vs_empty(spark):
    """OUT of the parity claim, pinned so the seam cannot widen
    silently: try_parse_url yields NULL host on malformed input (the
    100 TB never-kill-the-job contract) while the regex twin extracts
    an empty string — downstream twins coalesce at the join key."""
    bad = ["not a url", "http//missing.colon/x", "://nohost", ""]
    df = spark.createDataFrame(list(enumerate(bad)), "i long, url string")
    got = {r["i"]: r["h"]
           for r in df.select(
               "i", url_host(F.col("url")).alias("h")).collect()}
    assert all(v is None for v in got.values())
