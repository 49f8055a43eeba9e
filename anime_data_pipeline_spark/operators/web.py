"""URL canonicalization for web-crawl ingest (LLM-pipeline extension
surface: URL-level dedup is the first dedup stage of every crawl
pipeline — RefinedWeb §3.1, CCNet — and runs BEFORE content dedup
because it needs no document bytes at all).

Pure native-expression column math (regexp/string functions only —
whole-stage codegen, no UDF, no shuffle): canonicalize, then any
exact-dedup machinery (operators/dedup.py) groups on the canonical
form. The DuckDB twin (``canonicalize_url_sql``) mirrors every rule so
gate queries are fully oracle-checked.

Rules (the standard safe-normalization subset — each one only merges
URLs that cannot differ in content):
- drop the fragment (``#...`` never reaches the server),
- lowercase scheme and host (DNS is case-insensitive; paths are NOT),
- strip a leading ``www.`` label,
- strip default ports (``:80`` for http, ``:443`` for https),
- drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``) and tidy
  the leftover separators,
- collapse a trailing ``/`` before end-of-path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Anchored at a parameter separator so substrings of longer parameter
# names survive (``?abcgclid=5`` and ``?myfbclid=1`` are NOT tracking
# params and must not be touched); the separator is re-emitted by the
# replacement and tidied by the follow-up passes.
_TRACKING = r"([?&])(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL column; native expressions only."""
    # 1) fragment off
    u = F.regexp_replace(url, r"#.*$", "")
    # 2) split scheme://authority rest (path+query, case-preserved)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    # 3) host cleanup: www. label, default ports
    auth = F.regexp_replace(auth, r"^www\.", "")
    auth = F.when(scheme == "http", F.regexp_replace(auth, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, r":443$", "")).otherwise(auth)
    )
    # 4) tracking params out (separator kept by $1), separators tidied
    rest = F.regexp_replace(rest, _TRACKING, "$1")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    # 5) trailing slash before end or query
    rest = F.regexp_replace(rest, r"/+(\?|$)", "$1")
    return F.concat(scheme, F.lit("://"), auth, rest)


def canonicalize_url_sql(expr: str) -> str:
    """The identical canonicalization as DuckDB SQL text (RE2 regexes,
    explicit 'g' flags; replacement backreferences are ``\\1``)."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    auth = f"lower(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')"
    auth = f"regexp_replace({auth}, '^www\\.', '')"
    auth = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({auth}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({auth}, ':443$', '') "
        f"ELSE {auth} END"
    )
    rest = f"regexp_replace({rest}, '{_TRACKING}', '\\1', 'g')"
    rest = f"regexp_replace({rest}, '&&+', '&', 'g')"
    rest = f"regexp_replace({rest}, '\\?&', '?', 'g')"
    rest = f"regexp_replace({rest}, '[?&]+$', '', 'g')"
    rest = f"regexp_replace({rest}, '/+(\\?|$)', '\\1', 'g')"
    return f"({scheme} || '://' || {auth} || {rest})"


def extract_hrefs(html: Column) -> Column:
    """Every anchor href value in document order (the crawl frontier /
    link-graph feed: RefinedWeb §3.1 collects outlinks at extraction
    time). Native ``regexp_extract_all`` — codegen, no UDF; attribute
    order inside the tag doesn't matter because the match anchors on
    the ``href`` attribute itself; fully case-insensitive (legacy pages
    write ``<A HREF=...>``) and quote-tolerant (double-quoted,
    single-quoted, and bare attribute values all appear in real crawl
    HTML — bare values end at whitespace, ``>``, or a quote). The
    pre-``href`` scan consumes OTHER quoted attribute values atomically
    so ``title="see href=http://spam/x"`` can't fabricate a link, and
    the post-extraction strip removes only a MATCHED quote pair. The
    quotes ride in the single capture because a regex alternation can't
    share a group index — still pure codegen."""
    raw = F.regexp_extract_all(
        html,
        # \shref requires a whitespace ATTRIBUTE-NAME boundary, so
        # data-href=/xlink:href= can't mask the tag's real href; the
        # lookahead keeps <a's own space available to that \s
        F.lit(
            r"""(?i)<a(?=\s)(?:[^>"']|"[^"]*"|'[^']*')*?\shref\s*=\s*("[^"]*"|'[^']*'|[^\s>"']+)"""
        ),
        1,
    )
    # one matched pair, stripped ONCE: the alternation can't double-fire
    # (a sequential "-then-' strip turned href="'x'" into x), and the
    # negated classes match newlines without (?s) — Java substitutes ""
    # for the branch's non-participating group.
    return F.transform(
        raw,
        lambda v: F.regexp_replace(v, "^\"([^\"]*)\"$|^'([^']*)'$", "$1$2"),
    )


def url_host(url: Column) -> Column:
    """Lowercased hostname (no port, no userinfo) of an absolute URL;
    '' when the value has no scheme://host prefix (relative links).
    The optional ``user:pw@`` prefix is consumed BEFORE the capture so
    a crafted ``https://trusted.com@evil.com/`` attributes to the real
    host (evil.com), the classic open-redirect parsing trap."""
    return F.lower(
        F.regexp_extract(
            url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]*)", 1
        )
    )
