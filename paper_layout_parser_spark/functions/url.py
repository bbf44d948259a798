"""URL normalization column functions (web-corpus hygiene).

Common-Crawl-style pipelines key everything on the url (dedup, resume,
joins), so a canonical form matters: the same page arrives as
``HTTP://Host.TLD:80/path/?utm_source=x`` and ``http://host.tld/path``.

All native Spark SQL (``try_parse_url`` + array ops — whole-stage
codegen; the try_ variant returns NULL on malformed URLs instead of
failing the job — one bad crawl URL must never kill a 100 TB pass);
the DuckDB oracle mirrors the same component math with regexps, so the
canonicalization is cross-engine checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PREFIX = "utm_"


def url_host(url: Column) -> Column:
    """Lowercased host without port."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def canonical_url(url: Column) -> Column:
    """Canonical form: lowercase scheme + host, port dropped, tracking
    (``utm_*``) query params removed, fragment dropped, trailing slash
    stripped from the path. Path case and non-tracking params preserved.
    """
    proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = url_host(url)
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")), "/+$", ""
    )
    q = F.try_parse_url(url, F.lit("QUERY"))
    kept = F.filter(
        F.split(q, "&"),
        lambda x: ~F.startswith(x, F.lit(TRACKING_PREFIX)),
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        proto, F.lit("://"), host, path,
        F.when(qs.isNotNull() & (qs != ""), F.concat(F.lit("?"), qs))
        .otherwise(F.lit("")),
    )


def url_host_sql(expr: str) -> str:
    """DuckDB twin of ``url_host`` — THE one host-extraction regex every
    SQL twin shares (canonical_url_sql, curation.cap_per_host_sql), so
    the engine-portability-critical pattern cannot drift between private
    copies. Matches Spark's parse_url HOST for well-formed absolute URLs:
    credentials (``user:pw@``) and port stripped, lowercased. The
    bracketed-IPv6 alternative comes first: ``[::1]`` contains colons,
    so the bare ``[^/:?#]+`` arm alone truncated ``http://[::1]:8080/``
    to ``[`` while Spark's parse_url returned ``[::1]`` (caught by the
    r8 URL parity fuzz)."""
    return ("lower(regexp_extract(" + expr +
            ", '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?"
            "(\\[[^\\]/?#]*\\]|[^/:?#]+)', 1))")


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of canonical_url (regexp component extraction)."""
    proto = f"lower(regexp_extract({expr}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host = url_host_sql(expr)
    path = (f"regexp_replace(regexp_extract({expr}, "
            f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/+$', '')")
    # first '?' BEFORE any '#': a bare \\?([^#]*) matched a '?' living
    # inside the fragment ('...#f?x=1' -> phantom query 'x=1') where
    # Spark's parser sees no query at all (r8 URL parity fuzz). The
    # [^#?]* prefix pins the match to the first pre-fragment '?' while
    # the capture still spans later '?'s ('/p??x=1' -> '?x=1').
    query = f"regexp_extract({expr}, '^[^#?]*\\?([^#]*)', 1)"
    kept = (f"list_filter(string_split({query}, '&'), "
            f"x -> NOT starts_with(x, '{TRACKING_PREFIX}'))")
    qs = f"array_to_string({kept}, '&')"
    return (f"({proto} || '://' || {host} || {path} || "
            f"CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END)")
