"""Full published Public-Suffix-List test-vector validation (r7 verdict
item 4).

The vector set is publicsuffix.org's canonical checkPublicSuffix data
(https://publicsuffix.org/list/ -> "test data"; its header dedicates it
to the public domain), transcribed as (input host, expected registrable
domain) pairs. The commented-out 'local' group is commented out in the
canonical file too and is omitted here, matching it.

The rules the vectors exercise are embedded as a fixture SUBSET of the
published list (this repo embeds no external data files); the subset
covers every grammar feature: plain literals, multi-level literals,
wildcard rules (*.mm, *.ck, *.kobe.jp), exception rules (!www.ck,
!city.kobe.jp), and unicode rules (公司.cn, 中国) whose IDNA/punycode
twins the loader derives.

Normalization contract, asserted here: checkPublicSuffix lowercases and
IDNA-normalizes its input; with_registrable_domain matches hosts
byte-literally, so the test lowercases inputs (the pipeline's canonical
host is already lowercase) and the LOADER supplies the punycode twins.
The strict-PSL implicit '*' rule (unlisted TLD -> rightmost label is
the suffix) is the operator's unlisted='star' mode; the curation
default unlisted='null' deliberately diverges (unlisted TLD -> NULL) —
both asserted. The one stated wildcard approximation (expansion covers
observed hosts only) is asserted explicitly at the bottom."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paper_layout_parser_spark.operators.curation import (
    load_public_suffixes,
    with_registrable_domain,
)

# fixture subset of the published list — exactly the rules the
# canonical vectors exercise, in the published grammar
FIXTURE_PSL = """\
// fixture subset of publicsuffix.org rules (grammar-complete)
ac
biz
com
uk.com
cn
com.cn
公司.cn
中国
jp
ac.jp
kyoto.jp
ide.kyoto.jp
*.kobe.jp
!city.kobe.jp
*.ck
!www.ck
*.mm
us
ak.us
k12.ak.us
"""

# (input, expected registrable domain) — checkPublicSuffix order
VECTORS = [
    # null input
    (None, None),
    # mixed case
    ("COM", None),
    ("example.COM", "example.com"),
    ("WwW.example.COM", "example.com"),
    # leading dot
    (".com", None),
    (".example", None),
    (".example.com", None),
    (".example.example", None),
    # unlisted TLD (implicit '*' rule)
    ("example", None),
    ("example.example", "example.example"),
    ("b.example.example", "example.example"),
    ("a.b.example.example", "example.example"),
    # TLD with only 1 rule
    ("biz", None),
    ("domain.biz", "domain.biz"),
    ("b.domain.biz", "domain.biz"),
    ("a.b.domain.biz", "domain.biz"),
    # TLD with some 2-level rules
    ("com", None),
    ("example.com", "example.com"),
    ("b.example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("uk.com", None),
    ("example.uk.com", "example.uk.com"),
    ("b.example.uk.com", "example.uk.com"),
    ("a.b.example.uk.com", "example.uk.com"),
    ("test.ac", "test.ac"),
    # TLD with only 1 (wildcard) rule
    ("mm", None),
    ("c.mm", None),
    ("b.c.mm", "b.c.mm"),
    ("a.b.c.mm", "b.c.mm"),
    # more complex TLD
    ("jp", None),
    ("test.jp", "test.jp"),
    ("www.test.jp", "test.jp"),
    ("ac.jp", None),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    ("kyoto.jp", None),
    ("test.kyoto.jp", "test.kyoto.jp"),
    ("ide.kyoto.jp", None),
    ("b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("a.b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("c.kobe.jp", None),
    ("b.c.kobe.jp", "b.c.kobe.jp"),
    ("a.b.c.kobe.jp", "b.c.kobe.jp"),
    ("city.kobe.jp", "city.kobe.jp"),
    ("www.city.kobe.jp", "city.kobe.jp"),
    # TLD with a wildcard rule and exceptions
    ("ck", None),
    ("test.ck", None),
    ("b.test.ck", "b.test.ck"),
    ("a.b.test.ck", "b.test.ck"),
    ("www.ck", "www.ck"),
    ("www.www.ck", "www.ck"),
    # US K12
    ("us", None),
    ("test.us", "test.us"),
    ("www.test.us", "test.us"),
    ("ak.us", None),
    ("test.ak.us", "test.ak.us"),
    ("www.test.ak.us", "test.ak.us"),
    ("k12.ak.us", None),
    ("test.k12.ak.us", "test.k12.ak.us"),
    ("www.test.k12.ak.us", "test.k12.ak.us"),
    # IDN labels
    ("食狮.com.cn", "食狮.com.cn"),
    ("食狮.公司.cn", "食狮.公司.cn"),
    ("www.食狮.公司.cn", "食狮.公司.cn"),
    ("shishi.公司.cn", "shishi.公司.cn"),
    ("公司.cn", None),
    ("食狮.中国", "食狮.中国"),
    ("www.食狮.中国", "食狮.中国"),
    ("shishi.中国", "shishi.中国"),
    ("中国", None),
    # same as above, but punycoded (loader-derived IDNA twins)
    ("xn--85x722f.com.cn", "xn--85x722f.com.cn"),
    ("xn--85x722f.xn--55qx5d.cn", "xn--85x722f.xn--55qx5d.cn"),
    ("www.xn--85x722f.xn--55qx5d.cn", "xn--85x722f.xn--55qx5d.cn"),
    ("shishi.xn--55qx5d.cn", "shishi.xn--55qx5d.cn"),
    ("xn--55qx5d.cn", None),
    ("xn--85x722f.xn--fiqs8s", "xn--85x722f.xn--fiqs8s"),
    ("www.xn--85x722f.xn--fiqs8s", "xn--85x722f.xn--fiqs8s"),
    ("shishi.xn--fiqs8s", "shishi.xn--fiqs8s"),
    ("xn--fiqs8s", None),
]


@pytest.fixture(scope="module")
def derived(spark):
    """Run every vector host through the operator ONCE (one Spark job,
    not one per vector): hosts lowercased (the checkPublicSuffix
    normalization our byte-literal matcher leaves to the caller),
    wildcards expanded against the vector hosts themselves (the
    loader's intended usage: expand against the corpus you annotate),
    strict-PSL implicit-star mode."""
    rows = [(i, None if h is None else h.lower())
            for i, (h, _) in enumerate(VECTORS)]
    docs = spark.createDataFrame(rows, "vec int, host string")
    sx = load_public_suffixes(spark, text=FIXTURE_PSL,
                              observed_hosts=docs.select("host"))
    out = with_registrable_domain(docs, sx, unlisted="star")
    return {r["vec"]: r["domain"] for r in out.collect()}


@pytest.mark.parametrize(
    "idx,host,expected",
    [(i, h, e) for i, (h, e) in enumerate(VECTORS)],
    ids=[f"{i:02d}-{h}" for i, (h, _) in enumerate(VECTORS)])
def test_check_public_suffix_vector(derived, idx, host, expected):
    exp = None if expected is None else expected.lower()
    assert derived[idx] == exp, f"checkPublicSuffix({host!r}) != {expected!r}"


def test_unlisted_null_mode_diverges_deliberately(spark):
    """The curation DEFAULT (unlisted='null') deliberately diverges from
    the vectors' implicit-star group: an unlisted TLD is crawl junk,
    not a domain to budget. Pinned so the divergence is a stated
    contract, not an accident."""
    docs = spark.createDataFrame(
        [("example.example",), ("b.example.example",), ("example.com",)],
        "host string")
    sx = load_public_suffixes(spark, text=FIXTURE_PSL,
                              observed_hosts=docs.select("host"))
    got = {r["host"]: r["domain"]
           for r in with_registrable_domain(docs, sx).collect()}
    assert got["example.example"] is None
    assert got["b.example.example"] is None
    assert got["example.com"] == "example.com"   # listed TLDs unaffected


def test_unobserved_wildcard_approximation_stated(spark):
    """load_public_suffixes's ONE stated approximation, asserted: a host
    under a wildcard TLD that was NOT in the expansion set falls back
    to the TLD literal/parent instead of its (unseen) wildcard
    instance — 'a.foo.ck' derives 'foo.ck' where strict PSL (which saw
    'foo.ck' as a *.ck instance) would say 'a.foo.ck'. Expanding
    against the corpus being annotated — the documented usage, and
    what the vector test above does — closes the gap."""
    observed = spark.createDataFrame([("b.test.ck",)], "host string")
    sx = load_public_suffixes(spark, text=FIXTURE_PSL,
                              observed_hosts=observed)
    docs = spark.createDataFrame([("a.foo.ck",)], "host string")
    got = with_registrable_domain(docs, sx, unlisted="star").collect()
    assert got[0]["domain"] == "foo.ck"   # strict PSL: 'a.foo.ck'


def test_non_ascii_exception_and_wildcard_rules(spark):
    """The IDNA twin must be derived from the rule BODY, not the raw
    rule: '!例.jp'.encode('idna') swallows the '!' into the punycode
    label ('xn--!-lb7a.jp' — a garbage literal), and the '*' label makes
    the codec raise so a non-ASCII wildcard would lose its ASCII twin
    entirely. Grammar-prefix-aware twinning keeps the exception an
    exception and the wildcard a wildcard in BOTH script forms."""
    psl = "jp\n*.神戸.jp\n!市.神戸.jp\n"
    kobe = "神戸".encode("idna").decode()
    shi = "市".encode("idna").decode()
    hosts = ["www.市.神戸.jp", f"www.{shi}.{kobe}.jp",
             f"a.b.{kobe}.jp", f"b.{kobe}.jp"]
    docs = spark.createDataFrame([(h,) for h in hosts], "host string")
    sx = load_public_suffixes(spark, text=psl,
                              observed_hosts=docs.select("host"))
    got = {r["host"]: r["domain"]
           for r in with_registrable_domain(docs, sx,
                                            unlisted="star").collect()}
    # unicode exception family works as before
    assert got["www.市.神戸.jp"] == "市.神戸.jp"
    # punycoded exception family: the ASCII twin must classify as an
    # exception (parent + veto), not a '!xn--…' garbage literal
    assert got[f"www.{shi}.{kobe}.jp"] == f"{shi}.{kobe}.jp"
    # punycoded wildcard family: the ASCII twin must expand as a
    # wildcard instance, so b.<kobe>.jp is itself a public suffix…
    assert got[f"b.{kobe}.jp"] is None
    # …and a host one label deeper derives that instance + one label
    assert got[f"a.b.{kobe}.jp"] == f"a.b.{kobe}.jp"
