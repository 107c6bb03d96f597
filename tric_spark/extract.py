"""Outlink/text extraction from HTML pages. [north-rule]

The north rule's per-row invariant: the engine's extracted ``text`` must be
**byte-identical per url** to this pinned reference extractor
(BASELINE.json ``input_hint``). The extractor is therefore a frozen,
dependency-free pure function shipped in-repo; the Spark side wraps it in a
pandas UDF (Arrow-batched — the data crosses the JVM↔Python boundary once
per batch as Arrow buffers, never per row through pickle, which is the
"no per-row Python" discipline; regex string parsing has no numpy
vectorization, so inside the batch the pinned function runs per element,
exactly like pandas' own .str machinery).

Spec (FIXTURES.md §1): extracted text = <title> content followed by each
<p> content, inner tags stripped, each part stripped of surrounding
whitespace, empties dropped, joined with single "\n", no trailing
whitespace. Outlinks = href values of <a> tags in document order.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.S | re.I)
_P_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_HREF_RE = re.compile(r"""<a\s[^>]*?href=["']([^"']*)["']""", re.S | re.I)


def extract_text(html: bytes | str | None) -> str:
    """Pinned reference extractor: html → text. Frozen; do not change —
    byte-identity per url is a verified invariant."""
    if html is None:
        return ""
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    parts = []
    m = _TITLE_RE.search(s)
    if m:
        parts.append(m.group(1))
    parts.extend(_P_RE.findall(s))
    cleaned = (_TAG_RE.sub("", p).strip() for p in parts)
    return "\n".join(p for p in cleaned if p)


def extract_outlinks(html: bytes | str | None) -> list[str]:
    """Pinned reference extractor: html → ordered href list."""
    if html is None:
        return []
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    return _HREF_RE.findall(s)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

extract_text_udf = F.pandas_udf(
    lambda ser: ser.map(extract_text), returnType=T.StringType()
)

extract_outlinks_udf = F.pandas_udf(
    lambda ser: pd.Series([extract_outlinks(h) for h in ser]),
    returnType=T.ArrayType(T.StringType()),
)


def with_extracted(pages: DataFrame, html_col: str = "html", jvm: bool = True) -> DataFrame:
    """Add ``extracted_text`` and ``outlinks`` columns.

    Full-text extraction feeds every textstats/dedup consumer, so the
    default is the JVM ``regexp`` twin of the pinned extractor
    (byte-equality-tested against it, incl. Unicode whitespace/case
    adversaries) — the whole stage runs inside whole-stage codegen with no
    Python workers at 100 TB. ``jvm=False`` routes through the pinned
    pandas-UDF extractor itself (the invariant-bearing reference path)."""
    text = extracted_text_jvm(html_col) if jvm else extract_text_udf(F.col(html_col))
    links = outlinks_jvm(html_col) if jvm else extract_outlinks_udf(F.col(html_col))
    return pages.withColumn("extracted_text", text).withColumn("outlinks", links)


# JVM twins of the pinned regexes: (?s) for re.S, (?i) for re.I, and (?U)
# (UNICODE_CHARACTER_CLASS, which implies UNICODE_CASE) because Java's \s
# and case folding are ASCII-only by default while Python's re is
# Unicode-aware — without it a NBSP inside an <a> tag extracts differently
# (ADVICE r2). Pattern bodies are identical and byte-equality against the
# pinned extractor is asserted on the synth corpus plus adversarial
# snippets (tests/test_extract_synth.py). Envelope: both sides assume the
# html bytes are valid UTF-8 (the JVM cast and Python's errors="replace"
# only diverge on malformed sequences).
_HREF_PATTERN_JVM = """(?siU)<a\\s[^>]*?href=["']([^"']*)["']"""
_TITLE_PATTERN_JVM = "(?siU)<title[^>]*>(.*?)</title>"
_P_PATTERN_JVM = "(?siU)<p[^>]*>(.*?)</p>"
_TAG_PATTERN_JVM = "<[^>]+>"
# Python str.strip() removes the Unicode whitespace set; Java's (?U)\s is
# the same set ([\t-\r\x1c-\x1f\x85] + \p{Z}), unlike String.trim()
_TRIM_PATTERN_JVM = "(?U)^\\s+|\\s+$"


def extracted_text_jvm(html_col: str = "html"):
    """Extracted text as a JVM-side column expression — the whole-stage-
    codegen twin of :func:`extract_text`: first <title> content, then each
    <p> content, inner tags stripped, parts trimmed, empties dropped,
    joined with "\\n". A missing title and an empty/whitespace-only title
    both reduce to "" and are dropped by the empty filter — exactly the
    pinned extractor's behavior."""
    s = F.col(html_col).cast("string")
    title = F.regexp_extract(s, _TITLE_PATTERN_JVM, 1)
    paras = F.regexp_extract_all(s, F.lit(_P_PATTERN_JVM), F.lit(1))
    cleaned = F.transform(
        F.concat(F.array(title), paras),
        lambda p: F.regexp_replace(
            F.regexp_replace(p, _TAG_PATTERN_JVM, ""), _TRIM_PATTERN_JVM, ""
        ),
    )
    return F.array_join(F.filter(cleaned, lambda p: p != F.lit("")), "\n")


def outlinks_jvm(html_col: str = "html"):
    """href list as a JVM-side column expression (regexp_extract_all inside
    whole-stage codegen — no Python workers)."""
    return F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(_HREF_PATTERN_JVM), F.lit(1)
    )


def outlink_edges(pages: DataFrame, html_col: str = "html", jvm: bool = True) -> DataFrame:
    """(src_url, dst_url) directed link table from the pages' html.

    Edge-build is the one stage that touches every input byte at 100 TB,
    so by default the hrefs come from the JVM ``regexp_extract_all`` twin
    of the pinned extractor (byte-equality-tested against it) — the ingest
    stage runs entirely inside whole-stage codegen with no Python workers.
    ``jvm=False`` routes through the pinned pandas-UDF extractor itself
    (the invariant-bearing reference path).

    Column pruning matters at 100 TB: only (url, html) are read, so the
    parquet/Iceberg scan prunes text/lang (visible as ReadSchema in
    .explain)."""
    links = outlinks_jvm(html_col) if jvm else extract_outlinks_udf(F.col(html_col))
    return (
        pages.select("url", links.alias("outlinks"))
        .select(F.col("url").alias("src_url"), F.explode("outlinks").alias("dst_url"))
    )


# ---------------------------------------------------------------------------
# anchor text (href + inner text pairs)
# ---------------------------------------------------------------------------

_ANCHOR_RE = re.compile(
    r"""<a\s[^>]*?href=["']([^"']*)["'][^>]*>(.*?)</a>""", re.S | re.I
)
_ANCHOR_PATTERN_JVM = (
    """(?siU)<a\\s[^>]*?href=["']([^"']*)["'][^>]*>(.*?)</a>"""
)


def extract_anchors(html: bytes | str | None) -> list[tuple[str, str]]:
    """Pinned reference extractor: html → ordered (href, anchor_text)
    pairs; anchor text has inner tags stripped and is whitespace-trimmed
    (the Unicode set, matching extract_text's cleanup)."""
    if html is None:
        return []
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    return [(h, _TAG_RE.sub("", t).strip()) for h, t in _ANCHOR_RE.findall(s)]


def anchors_jvm(html_col: str = "html"):
    """(href, anchor) struct list as a JVM column expression — the
    whole-stage-codegen twin of :func:`extract_anchors`. Java's
    regexp_extract_all returns ONE group per call, so the pattern runs
    twice (group 1 = href, group 2 = inner text) and the two equal-length
    match lists zip positionally — the match set is identical because the
    pattern is identical."""
    s = F.col(html_col).cast("string")
    hrefs = F.regexp_extract_all(s, F.lit(_ANCHOR_PATTERN_JVM), F.lit(1))
    inner = F.regexp_extract_all(s, F.lit(_ANCHOR_PATTERN_JVM), F.lit(2))
    cleaned = F.transform(
        inner,
        lambda t: F.regexp_replace(
            F.regexp_replace(t, _TAG_PATTERN_JVM, ""), _TRIM_PATTERN_JVM, ""
        ),
    )
    return F.zip_with(
        hrefs, cleaned, lambda h, t: F.struct(h.alias("href"), t.alias("anchor"))
    )


def anchor_edges(pages: DataFrame, html_col: str = "html", jvm: bool = True) -> DataFrame:
    """(src_url, dst_url, anchor) — the directed link table WITH anchor
    text. Same 100-TB ingest profile as :func:`outlink_edges` (JVM regexp
    twin by default, (url, html)-only scan)."""
    if jvm:
        pairs = anchors_jvm(html_col)
        return (
            pages.select("url", pairs.alias("a"))
            .select(F.col("url").alias("src_url"), F.explode("a").alias("p"))
            .select(
                "src_url",
                F.col("p.href").alias("dst_url"),
                F.col("p.anchor").alias("anchor"),
            )
        )
    rows = extract_anchors_udf(F.col(html_col))
    return (
        pages.select("url", rows.alias("a"))
        .select(F.col("url").alias("src_url"), F.explode("a").alias("p"))
        .select(
            "src_url",
            F.col("p.href").alias("dst_url"),
            F.col("p.anchor").alias("anchor"),
        )
    )


extract_anchors_udf = F.pandas_udf(
    lambda ser: pd.Series([extract_anchors(h) for h in ser]),
    returnType=T.ArrayType(
        T.StructType(
            [
                T.StructField("href", T.StringType()),
                T.StructField("anchor", T.StringType()),
            ]
        )
    ),
)


def anchor_summary(edges: DataFrame, k: int = 3) -> DataFrame:
    """(dst_url, n_anchors, top_anchors) — per target page: total inbound
    anchor count and its ``k`` most frequent non-empty anchor texts (count
    desc, text asc — deterministic). THE classic ranking signal: inbound
    anchor text describes a page better than the page itself (Brin & Page
    WWW'98 §2.2 use it verbatim). One groupBy on (dst, anchor) then a
    per-dst window bounded by the page's distinct-anchor count."""
    from pyspark.sql import Window

    counts = (
        edges.filter(F.col("anchor") != "")
        .groupBy("dst_url", "anchor")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("dst_url").orderBy(F.desc("n"), F.asc("anchor"))
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .groupBy("dst_url")
        .agg(
            F.sum("n").alias("n_anchors"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_rk") <= k, F.struct("_rk", "anchor"))
                )
            ).alias("_t"),
        )
        .select(
            "dst_url",
            "n_anchors",
            F.transform("_t", lambda s: s["anchor"]).alias("top_anchors"),
        )
    )
