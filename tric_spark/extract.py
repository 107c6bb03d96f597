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


def with_extracted(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Add ``extracted_text`` and ``outlinks`` columns."""
    return pages.withColumn(
        "extracted_text", extract_text_udf(F.col(html_col))
    ).withColumn("outlinks", extract_outlinks_udf(F.col(html_col)))


# JVM twin of _HREF_RE: (?s) for re.S, (?i) for re.I; the pattern body is
# identical and byte-equality against the pinned extractor is asserted on
# the synth corpus (tests/test_extract_synth.py)
_HREF_PATTERN_JVM = """(?si)<a\\s[^>]*?href=["']([^"']*)["']"""


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
