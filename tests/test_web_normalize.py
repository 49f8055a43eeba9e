"""URL canonicalization (operators/web.py) and CCNet text
normalization (functions/text.ccnet_normalize) unit tests: rule-level
edge cases on the Spark side plus Spark↔DuckDB twin parity on a
generated adversarial corpus (the gate queries q152/q153 already pin
end-to-end parity; these pin the rules individually)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from anime_data_pipeline_spark.functions.text import (
    ccnet_normalize,
    ccnet_normalize_sql,
)
from anime_data_pipeline_spark.operators.web import (
    canonicalize_url,
    canonicalize_url_sql,
)

URL_CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM:80/a/B?id=1#frag", "http://example.com/a/B?id=1"),
    ("https://Example.com:443/x/", "https://example.com/x"),
    ("https://example.com:8443/x/", "https://example.com:8443/x"),  # non-default port kept
    ("http://example.com/p?utm_source=feed&id=2", "http://example.com/p?id=2"),
    ("http://example.com/p?id=2&utm_campaign=a&utm_medium=b", "http://example.com/p?id=2"),
    ("http://example.com/p?utm_source=x", "http://example.com/p"),
    ("http://example.com/p?a=1&fbclid=zz&b=2", "http://example.com/p?a=1&b=2"),
    ("http://example.com/p?gclid=9", "http://example.com/p"),
    ("http://example.com/CaseSensitive/Path", "http://example.com/CaseSensitive/Path"),
    ("http://www.example.com", "http://example.com"),
    ("http://example.com/", "http://example.com"),
    ("http://example.com/a//", "http://example.com/a"),
    ("http://example.com/?utm_source=1#x", "http://example.com"),
    ("http://sub.www-like.example.com/q", "http://sub.www-like.example.com/q"),
    # tracking-param names must match at a separator boundary only:
    # substrings of longer parameter names are NOT tracking params
    ("http://example.com/p?abcgclid=5", "http://example.com/p?abcgclid=5"),
    ("http://example.com/p?myfbclid=1&id=2", "http://example.com/p?myfbclid=1&id=2"),
    ("http://example.com/p?xutm_source=1", "http://example.com/p?xutm_source=1"),
    # consecutive tracking params collapse cleanly
    ("http://example.com/p?utm_a=1&utm_b=2", "http://example.com/p"),
    ("http://example.com/p?utm_a=1&gclid=2&id=3", "http://example.com/p?id=3"),
]


def test_canonicalize_url_rules(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in URL_CASES], "raw string")
    got = [r["c"] for r in df.select(canonicalize_url(F.col("raw")).alias("c")).collect()]
    for (raw, want), g in zip(URL_CASES, got):
        assert g == want, f"{raw!r}: got {g!r}, want {want!r}"


def test_canonicalize_url_sql_twin_parity(spark):
    con = duckdb.connect()
    for raw, want in URL_CASES:
        (duck,) = con.execute(
            f"WITH t(x) AS (VALUES (?)) SELECT {canonicalize_url_sql('x')} FROM t",
            [raw],
        ).fetchone()
        assert duck == want, f"duckdb {raw!r}: got {duck!r}, want {want!r}"


NORM_CASES = [
    ("Héllo, Wörld!  123", "hello world 000"),
    ("CAFÉ café Cafe", "cafe cafe cafe"),
    ("a\tb\nc   d", "a b c d"),
    ("...", ""),
    ("Ångström", "angstrom"),  # Å not in table → punct rule spaces it
    ("naïve œuvre straße", "naive ouvre strase"),  # œ→o, ß→s (char-for-char)
]


def test_ccnet_normalize_rules(spark):
    df = spark.createDataFrame([(t,) for t, _ in NORM_CASES], "t string")
    got = [r["n"] for r in df.select(ccnet_normalize(F.col("t")).alias("n")).collect()]
    for (t, want), g in zip(NORM_CASES, got):
        assert g == want, f"{t!r}: got {g!r}, want {want!r}"


def test_ccnet_normalize_sql_twin_parity():
    con = duckdb.connect()
    for t, want in NORM_CASES:
        (duck,) = con.execute(
            f"WITH v(x) AS (VALUES (?)) SELECT {ccnet_normalize_sql('x')} FROM v", [t]
        ).fetchone()
        assert duck == want, f"duckdb {t!r}: got {duck!r}, want {want!r}"


def test_twin_parity_generated(spark):
    """Adversarial generated inputs through BOTH twins must agree
    char-for-char (catches regex-dialect drift between Java regex and
    RE2 beyond the curated cases)."""
    import random

    rng = random.Random(5)
    frag = ["?", "&", "#", "/", "a", "B", "1", "à", "é", ".", "!", " ", "=", "_"]
    raws = [
        "http://Example.com/" + "".join(rng.choice(frag) for _ in range(12))
        for _ in range(60)
    ]
    texts = ["".join(rng.choice(frag + ["ß", "ö", "Ü", "\t"]) for _ in range(20)) for _ in range(60)]
    con = duckdb.connect()
    url_df = spark.createDataFrame([(r,) for r in raws], "raw string")
    spark_urls = [
        r["c"] for r in url_df.select(canonicalize_url(F.col("raw")).alias("c")).collect()
    ]
    for raw, s in zip(raws, spark_urls):
        (d,) = con.execute(
            f"WITH t(x) AS (VALUES (?)) SELECT {canonicalize_url_sql('x')} FROM t", [raw]
        ).fetchone()
        assert s == d, f"url twin drift on {raw!r}: spark {s!r} duck {d!r}"
    txt_df = spark.createDataFrame([(t,) for t in texts], "t string")
    spark_txts = [
        r["n"] for r in txt_df.select(ccnet_normalize(F.col("t")).alias("n")).collect()
    ]
    for t, s in zip(texts, spark_txts):
        (d,) = con.execute(
            f"WITH v(x) AS (VALUES (?)) SELECT {ccnet_normalize_sql('x')} FROM v", [t]
        ).fetchone()
        assert s == d, f"norm twin drift on {t!r}: spark {s!r} duck {d!r}"


def test_extract_hrefs_and_url_host(spark):
    from anime_data_pipeline_spark.operators.web import extract_hrefs, url_host

    html = (
        '<html><body><!-- <a href="https://ghost.example.com/x">c</a> -->'
        '<A class="big" HREF="https://A.Example.com:8080/Page">one</A>'
        '<a href="/relative/path">two</a>'
        '<img href="https://not-an-anchor.example.com/i">'
        '<a data-x="1" href="http://b.example.com/q?z=1">three</a>'
        "<a href='https://sq.example.com/s'>four</a>"
        "<a href=https://bare.example.com/b>five</a>"
        # href-shaped text INSIDE another quoted attribute must not
        # fabricate a link (the pre-href scan consumes quoted values)
        '<a title="see href=http://spam.example/x" href="https://real.example.com/r">six</a>'
        # attribute NAMES ending in href (data-href, xlink:href) must
        # not mask the tag's real href
        '<a data-href="https://tracker.example/t" href="https://seven.example.com/s">7</a>'
        '<span title="href=http://nolink.example/y">text</span></body></html>'
    )
    df = spark.createDataFrame([(html,)], "h string")
    row = df.select(
        extract_hrefs(F.col("h")).alias("links"),
    ).collect()[0]
    # the commented-out anchor IS matched (extraction does not parse
    # comments — q182's corpus uses non-anchor tags for comment noise)
    assert row["links"] == [
        "https://ghost.example.com/x",
        "https://A.Example.com:8080/Page",
        "/relative/path",
        "http://b.example.com/q?z=1",
        "https://sq.example.com/s",  # single-quoted
        "https://bare.example.com/b",  # unquoted legacy attribute
        "https://real.example.com/r",  # spam-in-title skipped, real href kept
        "https://seven.example.com/s",  # data-href skipped, real href kept
    ]
    hosts = (
        df.select(F.explode(extract_hrefs(F.col("h"))).alias("u"))
        .select(url_host(F.col("u")).alias("d"))
        .collect()
    )
    assert [r["d"] for r in hosts] == [
        "ghost.example.com",
        "a.example.com",  # lowercased, port dropped
        "",  # relative: no host
        "b.example.com",
        "sq.example.com",
        "bare.example.com",
        "real.example.com",
        "seven.example.com",
    ]
    # userinfo must be consumed before the host capture — the
    # trusted.com@evil.com open-redirect trap attributes to evil.com
    tricky = spark.createDataFrame(
        [("https://user:pw@evil.com/p",), ("https://trusted.com@evil.com/",),
         ("ftp://bob@site.com:21/x",)],
        "u string",
    )
    got = [r["d"] for r in tricky.select(url_host(F.col("u")).alias("d")).collect()]
    assert got == ["evil.com", "evil.com", "site.com"]
