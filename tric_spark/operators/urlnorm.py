"""URL canonicalization — the crawl-store staple that collapses the
many spellings of one resource before dedup / frontier scheduling.
[engine-ops family: crawl hygiene; consumed by dedup-by-canonical-URL]

Normalizations applied (the conservative, semantics-preserving set every
crawler runs; cf. RFC 3986 §6 syntax-based normalization):

- drop the fragment (``#...`` — client-side only),
- lowercase the scheme and host (case-insensitive per RFC),
- strip a leading ``www.`` label,
- strip the scheme's default port (``:80`` http / ``:443`` https),
- collapse duplicate slashes in the path and strip trailing slashes
  (empty path → ``/``),
- drop tracking query params (``utm_*``, ``fbclid``, ``gclid``), sort
  the survivors, drop an empty query entirely.

Everything is JVM string/regexp expressions (codegen, map-only — no
shuffle), and every regexp is Java/RE2-portable so the DuckDB oracle
replays the pipeline verbatim; the SQL twin of each stage lives in
``CANON_SQL_STAGES`` right next to the Column builder so they cannot
drift apart silently. Userinfo (``user@host``) and percent-encoding
normalization are out of scope (absent from crawl frontiers in
practice; documented limitation).

Not in the reference (tric consumes a prebuilt id graph); this is the
step that PRODUCES clean vertex keys for ``assign_vertex_ids``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_TRACKING_RE = r"^(utm_[a-z]+|fbclid|gclid)="


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url`` (see module docstring for the rule
    set). Scheme-less inputs are treated as http."""
    u = F.regexp_replace(url, r"#.*$", "")
    raw_scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    scheme = F.when(raw_scheme == "", F.lit("http")).otherwise(raw_scheme)
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    auth = F.lower(F.regexp_extract(rest, r"^[^/?]*", 0))
    tail = rest.substr(F.length(auth) + 1, F.length(rest))
    host = F.regexp_replace(auth, r"^www\.", "")
    host = F.when(
        scheme == "http", F.regexp_replace(host, r":80$", "")
    ).otherwise(F.regexp_replace(host, r":443$", ""))
    path = F.regexp_extract(tail, r"^[^?]*", 0)
    path = F.regexp_replace(F.regexp_replace(path, r"/{2,}", "/"), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.regexp_extract(tail, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qcanon = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )


# --- DuckDB twin -----------------------------------------------------------
# Stage-for-stage SQL replay of canonical_url, parameterized by the CTE
# that provides (doc_id, url). oracle_sql() composes this; keeping it
# here (not in __spark_entry__) pins the twins together.
CANON_SQL_STAGES = """
  cs1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u FROM murls),
  cs2 AS (SELECT doc_id, url, u,
            CASE WHEN regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) = ''
                 THEN 'http'
                 ELSE lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
            END AS scheme,
            regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
          FROM cs1),
  cs3 AS (SELECT *, lower(regexp_extract(rest, '^[^/?]*')) AS auth,
            substr(rest, length(regexp_extract(rest, '^[^/?]*')) + 1) AS tail
          FROM cs2),
  cs4 AS (SELECT *,
            CASE WHEN scheme = 'http'
                 THEN regexp_replace(regexp_replace(auth, '^www\\.', ''), ':80$', '')
                 ELSE regexp_replace(regexp_replace(auth, '^www\\.', ''), ':443$', '')
            END AS host,
            CASE WHEN regexp_replace(regexp_replace(regexp_extract(tail, '^[^?]*'),
                        '/{2,}', '/', 'g'), '/+$', '') = '' THEN '/'
                 ELSE regexp_replace(regexp_replace(regexp_extract(tail, '^[^?]*'),
                        '/{2,}', '/', 'g'), '/+$', '')
            END AS path,
            array_to_string(list_sort(list_filter(
              string_split(regexp_extract(tail, '\\?(.*)$', 1), '&'),
              p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-z]+|fbclid|gclid)=')
            )), '&') AS qcanon
          FROM cs3),
  canon AS (SELECT doc_id, url,
              scheme || '://' || host || path ||
                CASE WHEN qcanon = '' THEN '' ELSE '?' || qcanon END AS canon_url
            FROM cs4)
"""


def url_dedup_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(canon_url, n_urls, n_raw_variants) — how many rows and how many
    DISTINCT raw spellings each canonical resource absorbed. One groupBy
    (map-side partial); the dedup-budget readout for a crawl frontier."""
    return (
        df.withColumn("_canon", canonical_url(F.col(url_col)))
        .groupBy(F.col("_canon").alias("canon_url"))
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct(F.col(url_col)).alias("n_raw_variants"),
        )
    )


def robots_verdict(path: Column, rules: list[tuple[str, bool]]) -> Column:
    """Boolean allow/deny for ``path`` under robots.txt longest-match
    semantics (Google's rule, REP RFC 9309 §2.2.2): the most specific
    (longest) matching path prefix wins; an Allow wins a length tie; no
    matching rule means allowed.

    The rule set ships as an array LITERAL (robots files are tiny), so
    the whole verdict is one filter + one fold per row — JVM expressions,
    no join, replayable with the same lambdas in SQL.  The fold's
    tie/ordering logic is order-independent (strictly-longer replaces;
    equal length replaces only when flipping to allow), so rule-array
    order never changes the verdict."""
    arr = F.array(
        *[
            F.struct(
                F.lit(p).alias("p"),
                F.lit(bool(a)).alias("allow"),
                F.lit(len(p)).alias("l"),
            )
            for p, a in rules
        ]
    )
    matches = F.filter(arr, lambda r: F.startswith(path, r["p"]))
    best = F.aggregate(
        matches,
        F.expr("named_struct('l', -1, 'allow', true)"),
        lambda acc, r: F.when(
            (r["l"] > acc["l"]) | ((r["l"] == acc["l"]) & r["allow"]),
            F.struct(r["l"].alias("l"), r["allow"].alias("allow")),
        ).otherwise(acc),
    )
    return best["allow"]


def robots_filter(
    df: DataFrame, rules: list[tuple[str, bool]], path_col: str = "path"
) -> DataFrame:
    """``df`` plus an ``allowed`` column from :func:`robots_verdict` —
    the crawl-side politeness gate applied as a map-only expression (the
    HOF is instantiated exactly ONCE in this projection — engine lore)."""
    return df.withColumn(
        "allowed", robots_verdict(F.col(path_col), rules)
    )


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, host, path_depth, url_len, n_params, digit_ratio,
    spam_score) — the lexical URL feature vector every crawl-frontier /
    URL-spam classifier starts from (Ma et al., KDD'09 "Beyond
    Blacklists" lexical features): long, digit-dense, deeply-nested,
    parameter-heavy URLs correlate with spam/infinite-calendar traps.

    Map-only JVM regexps (one pass, no shuffle); ``spam_score`` is the
    documented fixed blend 0.5·digit_ratio + 0.25·min(1, depth/8) +
    0.25·min(1, len/160) — a transparent heuristic, not a trained model
    (classifier.py holds the trained path).  6dp rounding on ratios.
    """
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(host, ":[0-9]+$", "")
    path = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(u, "\\?([^#]*)", 1)
    base = df.select(
        u.alias("url"),
        host.alias("host"),
        F.size(F.filter(F.split(path, "/", -1), lambda s: s != F.lit(""))).alias(
            "path_depth"
        ),
        F.length(u).alias("url_len"),
        F.when(query == "", F.lit(0))
        .otherwise(F.size(F.split(query, "&", -1)))
        .alias("n_params"),
        F.round(
            (F.length(u) - F.length(F.regexp_replace(u, "[0-9]", "")))
            / F.length(u).cast("double"),
            6,
        ).alias("digit_ratio"),
    )
    return base.withColumn(
        "spam_score",
        F.round(
            F.lit(0.5) * F.col("digit_ratio")
            + F.lit(0.25) * F.least(F.lit(1.0), F.col("path_depth") / F.lit(8.0))
            + F.lit(0.25) * F.least(F.lit(1.0), F.col("url_len") / F.lit(160.0)),
            6,
        ),
    )
