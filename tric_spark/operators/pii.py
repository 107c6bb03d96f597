"""PII detection and redaction — the scrub pass every LLM training-data
pipeline runs before anything leaves the crawl store.
[engine-ops family: text hygiene — emails / IPv4 / NANP-style phone
fragments, counted and masked]

All three detectors are single JVM regexps (`regexp_extract_all` /
`regexp_replace` — whole-stage codegen, zero Python), chosen to be
portable between Java regex and RE2 so the DuckDB oracle replays them
verbatim: character classes, bounded repetition, non-capturing groups
and ASCII ``\\b`` only — no lookarounds, no backrefs (RE2 has neither).

Not in the reference (tric is a pure graph engine); this is the
builder-brief "text analysis" family. At 100 TB the pass is map-only —
no shuffle, no state — so it scales embarrassingly; the only knob that
matters is keeping the regexps in codegen, which these are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# local-part@domain.tld — the pragmatic subset (RFC 5321 full grammar is
# not regular); deliberately greedy on dots so 'a@b.co.uk' is ONE match.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# dotted quad, word-bounded so '1.2.3.4x' and version strings don't hit;
# no 0-255 range check (RE2-portable simplicity; validate downstream).
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# NANP-lite: optional area prefix + exchange-line; covers 555-0142 and
# 415-555-0142 (a leading '(' would sit outside ``\b`` — parenthesized
# area codes still hit on their exchange-line part, just unmasked).
PHONE_RE = r"\b(?:\d{3}-)?\d{3}-\d{4}\b"

_KINDS = (("emails", EMAIL_RE, "[EMAIL]"),
          ("ipv4", IPV4_RE, "[IP]"),
          ("phones", PHONE_RE, "[PHONE]"))


def pii_counts(text: Column) -> list[Column]:
    """Three int columns ``n_emails, n_ipv4, n_phones`` counting matches
    in ``text``. Counts overlap-free per kind but kinds are independent
    (an email containing digits is not double-counted as a phone: the
    phone regexp needs the ``ddd-dddd`` shape the email body lacks)."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(rx), 0))
        .cast("long")
        .alias(f"n_{k}")
        for k, rx, _ in _KINDS
    ]


def redact_pii(text: Column) -> Column:
    """``text`` with every match masked by its placeholder. Order
    matters and is fixed: emails first (their local parts may contain
    digit runs a later pass would see), then IPv4, then phones."""
    out = text
    for _, rx, mask in _KINDS:
        out = F.regexp_replace(out, rx, mask)
    return out


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, clean_md5) per non-NULL-text
    doc — the counts plus an md5 of the REDACTED text, so a correctness
    replay certifies the masking byte-for-byte without shipping the
    (possibly sensitive) cleaned text anywhere."""
    t = F.col(text_col)
    return docs.filter(t.isNotNull()).select(
        "doc_id",
        *pii_counts(t),
        F.md5(redact_pii(t).cast("binary")).alias("clean_md5"),
    )
