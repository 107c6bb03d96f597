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
