"""Web-corpus ingestion operators (EXT): HTML -> text extraction and URL
feature parsing for Common-Crawl-style training-data preparation.

Everything here is a pure ``pyspark.sql.functions`` composition — JVM-side
regex chains inside whole-stage codegen, no Python in the hot path — so the
boilerplate-stripping pass runs at scan speed over 100 TB of crawled pages.
The same chain is replayable in ANSI SQL (DuckDB ``regexp_replace`` with the
``gs`` flags), which is what makes the extraction oracle-gradable.

The reference has no web-ingestion surface (its sources are BigQuery tables,
``/root/reference/core/bq_client.py``); this module is part of the EXT
training-data-pipeline family the build brief mandates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: HTML entity escape pairs, applied in THIS order when escaping ("&" first,
#: so later replacements don't double-escape their own ampersands) and in the
#: REVERSE order when unescaping ("&" last, so "&amp;lt;" round-trips to
#: "&lt;" not "<").
_ESCAPES: list[tuple[str, str]] = [
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
    ("'", "&#39;"),
]

#: Tags whose entire element body is boilerplate, never content.
_DROP_BODY_TAGS = ("script", "style", "noscript")


def html_escape(text: Column) -> Column:
    """Escape text for embedding inside an HTML element body."""
    out = text
    for raw, ent in _ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out


def html_unescape(text: Column) -> Column:
    """Inverse of :func:`html_escape` (named entities + ``&#39;`` only)."""
    out = text
    for raw, ent in reversed(_ESCAPES):
        out = F.replace(out, F.lit(ent), F.lit(raw))
    return out


def html_to_text(html: Column) -> Column:
    """Extract visible text from an HTML document.

    The classic crawl-cleaning chain, each step one JVM regex pass:

    1. drop ``<script>``/``<style>``/``<noscript>`` elements wholesale
       (dotall + lazy body so adjacent elements don't merge);
    2. drop HTML comments;
    3. strip every remaining tag to a single space (block boundaries
       become whitespace, inline tags never glue words together);
    4. decode the five core entities;
    5. collapse whitespace runs and trim.

    Semantics note for 100 TB honesty: this is the fast scan-side
    extractor (the C4/Gopher preprocessing style), not a DOM parser —
    malformed markup degrades to extra whitespace, never to an error.
    """
    out = html
    for tag in _DROP_BODY_TAGS:
        out = F.regexp_replace(out, f"(?s)<{tag}\\b[^>]*>.*?</{tag}>", " ")
    out = F.regexp_replace(out, "(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, "<[^>]+>", " ")
    out = html_unescape(out)
    return F.trim(F.regexp_replace(out, "\\s+", " "))


def html_title(html: Column) -> Column:
    """The ``<title>`` body (first match, entity-decoded), '' if absent."""
    return html_unescape(
        F.regexp_extract(html, "(?s)<title[^>]*>(.*?)</title>", 1)
    )


def render_html(title: Column, heading: Column, body_text: Column) -> Column:
    """Deterministically render a test-fixture HTML page around escaped
    text: title + boilerplate ``<style>``/``<script>`` + heading + the
    body split into ``<p>`` paragraphs on newlines.  Pure ``concat`` /
    ``replace`` so the synthesis (like the extraction) replays in DuckDB
    — together they give the extractor an exact round-trip oracle.
    """
    body = F.replace(html_escape(body_text), F.lit("\n"), F.lit("</p><p>"))
    return F.concat(
        F.lit("<html><head><title>"),
        html_escape(title),
        F.lit("</title><style>p { margin: 0; }</style>"),
        F.lit('<script type="text/javascript">var tracked = 1 < 2;</script>'),
        F.lit("</head><body><h1>"),
        html_escape(heading),
        F.lit("</h1><p>"),
        body,
        F.lit("</p><!-- generated fixture --></body></html>"),
    )


#: URL piece regexes — shared verbatim by the Spark chain and the DuckDB
#: oracle (both RE2-compatible; no lookarounds, no backrefs).
_URL_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]*)"
_URL_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
_URL_QUERY_RE = r"\?([^#]*)"


def url_host(url: Column) -> Column:
    """Lower-cased hostname (authority minus userinfo/port)."""
    auth = F.lower(F.regexp_extract(url, _URL_HOST_RE, 1))
    no_user = F.regexp_replace(auth, "^[^@]*@", "")
    return F.regexp_replace(no_user, ":[0-9]*$", "")


def url_path(url: Column) -> Column:
    """The path component ('' when the URL has none)."""
    return F.regexp_extract(url, _URL_PATH_RE, 1)


def url_query(url: Column) -> Column:
    return F.regexp_extract(url, _URL_QUERY_RE, 1)


def registered_domain(host: Column) -> Column:
    """Last two host labels — the eTLD+1 approximation used for
    domain-level crawl policies (a full public-suffix list is a data
    table, injectable where precision matters)."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def url_depth(url: Column) -> Column:
    """Number of non-empty path segments."""
    return F.size(
        F.filter(F.split(url_path(url), "/"), lambda s: s != F.lit(""))
    )


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309) — crawl-permission evaluation at corpus scale
# ---------------------------------------------------------------------------

def robots_pattern_regex(pattern: str) -> str:
    """RFC 9309 path pattern -> anchored regex usable verbatim in BOTH
    Spark (Java regex) and DuckDB (RE2): ``*`` matches any run of
    octets, a trailing ``$`` anchors the end, everything else is
    literal.  Regex-special literals are escaped character-by-character
    (the subset differs between engines only in constructs we never
    emit)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in r"\.^$+?()[]{}|":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored else "")


def robots_decisions(
    urls: DataFrame,
    rules: "list[tuple[str, str]]",
    path_col: str = "path",
) -> DataFrame:
    """Evaluate RFC 9309 group rules against every URL path.

    ``rules`` is the parsed group for the crawling agent:
    ``[("allow" | "disallow", pattern), ...]``.  Semantics per the RFC:
    the rule with the LONGEST pattern (octet length) wins; on a tie
    between allow and disallow, allow wins; a path matched by no rule is
    allowed.  Empty patterns are ignored (they match everything at
    length 0 and can never beat the no-match default).

    Scale shape: the rule list broadcasts (a robots group is tens of
    rows) and each path evaluates all rules in one projection — no
    explode, no shuffle; the per-URL argmax is a single aggregation on
    the URL key.  Returns ``urls`` columns + ``allowed`` (boolean) +
    ``match_len`` (0 = no rule matched)."""
    spark = urls.sparkSession
    rows = [
        (i, verb, pat, robots_pattern_regex(pat), len(pat))
        for i, (verb, pat) in enumerate(rules)
        if pat != ""
        and verb in ("allow", "disallow")
    ]
    rules_df = spark.createDataFrame(
        rows, "rule_id int, verb string, pattern string, rx string, plen int"
    )
    matched = (
        urls.crossJoin(F.broadcast(rules_df))
        .filter(F.expr(f"rlike({path_col}, rx)"))
        .groupBy(*urls.columns)
        .agg(
            F.max(
                F.struct(
                    F.col("plen"),
                    (F.col("verb") == "allow").cast("int").alias("is_allow"),
                )
            ).alias("best")
        )
        .select(
            *urls.columns,
            (F.col("best.is_allow") == 1).alias("allowed"),
            F.col("best.plen").alias("match_len"),
        )
    )
    return (
        urls.join(matched.select(*urls.columns, "allowed", "match_len"),
                  urls.columns, "left")
        .select(
            *urls.columns,
            F.coalesce("allowed", F.lit(True)).alias("allowed"),
            F.coalesce("match_len", F.lit(0)).alias("match_len"),
        )
    )
