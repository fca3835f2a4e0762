"""Web-corpus extraction operators: HTML→text, URL normalization,
registered-domain rollups.

Every large-scale pretraining pipeline starts from crawled web pages
(C4/Common Crawl WET extraction: Raffel et al. 2020 §2.2; RefinedWeb:
Penedo et al. 2023 §3.1 "URL filtering" + "text extraction"). The three
primitives that stage needs, re-expressed as Spark column expressions:

- **html_to_text**: strip ``<script>``/``<style>`` blocks, comments and
  tags, decode the common entities, collapse whitespace. A regex subset of
  trafilatura-style extraction — honest about being markup removal, not a
  DOM-aware readability model (those need an HTML parser library that is
  not in this container; the regex chain is the documented fallback the
  WET files themselves use).
- **normalize_url**: canonical form for URL-keyed dedup — lowercase
  scheme+host, strip the default port / ``www.`` / fragment / tracking
  params, sort the surviving query params, root path for empty paths.
- **registered_domain**: eTLD+1 extraction with an embedded mini
  public-suffix list (``co|com|net|org|gov|ac|edu`` second-levels under
  2-letter ccTLDs). The full PSL is a data file; the subset covers the
  dominant multi-label suffixes and the simplification is documented here
  rather than hidden.

All three are dual-dialect SQL generators (Spark + DuckDB); the Spark
Column wrappers are ``F.expr`` over the spark dialect so the oracle and
the engine share one formula by construction. Pure per-row string work —
map-only, whole-stage-codegen'd, scan-bound at 100 TB (no shuffle until
the caller aggregates).

Reference scope note: the reference repo ingests CSV crime data, not web
crawl (harmonize-search-analyze has no HTML stage) — this module is part
of the LLM-pipeline brief, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "html_to_text",
    "html_to_text_sql",
    "normalize_url",
    "normalize_url_sql",
    "registered_domain",
    "registered_domain_sql",
    "url_host_sql",
    "TRACKING_PARAM_PAT",
]


# one canonical dialect-aware regex-literal quoter for the whole package
from harmonize_search_analyze_spark.operators.curation import _pat  # noqa: E402


# ---------------------------------------------------------------------------
# HTML → text
# ---------------------------------------------------------------------------

_SCRIPT_PAT = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_PAT = r"(?is)<style\b[^>]*>.*?</style>"
_COMMENT_PAT = r"(?s)<!--.*?-->"
_TAG_PAT = r"<[^>]*>"
_WS_PAT = r"\s+"

# decoded strictly in this order; '&amp;' LAST so '&amp;lt;' decodes to the
# literal text '&lt;', not a phantom '<' (double-decode hazard)
_ENTITIES = [
    ("&lt;", "'<'"),
    ("&gt;", "'>'"),
    ("&quot;", "'\"'"),
    ("&#39;", "chr(39)"),  # chr() instead of a quoted quote: Spark SQL
    ("&nbsp;", "' '"),     # literals escape with backslash, DuckDB with ''
    ("&amp;", "'&'"),
]


def html_to_text_sql(expr: str, dialect: str) -> str:
    """Markup-stripping text extraction as one nested expression.

    Order is load-bearing: script/style/comment BLOCKS first (their bodies
    may contain ``<``/``>`` that are not tags), then remaining tags → one
    space, then entity decode (after tag strip, so ``&lt;b&gt;`` stays the
    literal text ``<b>`` instead of becoming a strippable tag), then
    whitespace collapse + trim.
    """
    g = ", 'g'" if dialect == "duckdb" else ""
    out = expr
    for pat in (_SCRIPT_PAT, _STYLE_PAT, _COMMENT_PAT):
        out = f"regexp_replace({out}, {_pat(pat, dialect)}, ''{g})"
    out = f"regexp_replace({out}, {_pat(_TAG_PAT, dialect)}, ' '{g})"
    for ent, rep in _ENTITIES:
        out = f"replace({out}, '{ent}', {rep})"
    out = f"regexp_replace({out}, {_pat(_WS_PAT, dialect)}, ' '{g})"
    return f"trim({out})"


def html_to_text(col: str) -> Column:
    """Column form of :func:`html_to_text_sql` (spark dialect; takes a
    column NAME — it builds SQL text, matching normalize_url)."""
    if not isinstance(col, str):
        raise TypeError("html_to_text takes a column NAME (it builds SQL)")
    return F.expr(html_to_text_sql(col, "spark"))


# ---------------------------------------------------------------------------
# URL normalization
# ---------------------------------------------------------------------------

# params dropped before the sort: analytics trackers that vary per-click
# but never change the fetched resource (RefinedWeb §3.1 drops these
# before URL dedup for exactly this reason)
TRACKING_PARAM_PAT = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

_SCHEME_PAT = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_PAT = r"^[^:/?#]+://([^/?#]*)"
_RESTNOFRAG_PAT = r"^[^:/?#]+://[^/?#]*([^#]*)"


def _sorted_params_sql(q: str, dialect: str) -> str:
    """Drop tracking params + empties, sort the rest, re-join with '&'.

    Spark and DuckDB spell the array pipeline differently but both keep it
    inside the engine's expression evaluator (no UDF either side).
    """
    pat = _pat(TRACKING_PARAM_PAT, dialect)
    if dialect == "spark":
        kept = (
            f"filter(split({q}, '&'), "
            f"p -> p != '' AND NOT p rlike {pat})"
        )
        return f"array_join(array_sort({kept}), '&')"
    kept = (
        f"list_filter(string_split({q}, '&'), "
        f"p -> p != '' AND NOT regexp_matches(p, {pat}))"
    )
    # DuckDB's array_to_string returns NULL for an EMPTY list (Spark's
    # array_join returns '') — coalesce to keep the dialects aligned
    return f"coalesce(array_to_string(list_sort({kept}), '&'), '')"


def normalize_url_sql(expr: str, dialect: str) -> str:
    """Canonical URL for dedup keys, as one dual-dialect expression.

    scheme+host lowercased; userinfo, the default port (80/443 for its
    scheme), leading ``www.`` and the fragment stripped; tracking query
    params dropped and the survivors sorted; empty path → ``/``. Path
    case and non-default ports are preserved (paths are case-sensitive
    per RFC 3986; anything more aggressive merges distinct resources).

    ``regexp_extract`` returns '' on no-match in BOTH engines, so a
    scheme-less input degrades to ``'://'``-prefixed garbage rather than
    NULL — callers filter with ``scheme != ''`` if the corpus may hold
    non-URLs (the rollup queries do).
    """
    scheme = f"lower(regexp_extract({expr}, {_pat(_SCHEME_PAT, dialect)}, 1))"
    # strip userinfo up to the LAST '@' first (hostport can't contain '/',
    # so greedy is safe) — 'http://example.com@evil.io/' must resolve to
    # evil.io, not a credentials-bearing pseudo-host
    hostport = (
        f"regexp_replace(lower(regexp_extract({expr}, "
        f"{_pat(_HOSTPORT_PAT, dialect)}, 1)), '^.*@', '')"
    )
    www_pat = _pat(r"^www\.", dialect)
    host = (
        f"regexp_replace(CASE {scheme} "
        f"WHEN 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END, {www_pat}, '')"
    )
    rest = (
        f"regexp_extract({expr}, {_pat(_RESTNOFRAG_PAT, dialect)}, 1)"
    )
    path_raw = f"regexp_extract({rest}, '^([^?]*)', 1)"
    path = f"CASE WHEN {path_raw} = '' THEN '/' ELSE {path_raw} END"
    q_pat = _pat(r"\?(.*)$", dialect)
    q = f"regexp_extract({rest}, {q_pat}, 1)"
    qnorm = _sorted_params_sql(q, dialect)
    # '||' rather than concat(): DuckDB's concat SKIPS NULL arguments
    # (a NULL url would yield the garbage key '://' in the oracle while
    # Spark returns NULL); '||' propagates NULL identically in both
    return (
        f"({scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {qnorm} = '' THEN '' ELSE '?' || {qnorm} END)"
    )


def normalize_url(col: str) -> Column:
    """Column form of :func:`normalize_url_sql` (spark dialect)."""
    return F.expr(normalize_url_sql(col, "spark"))


def url_host_sql(expr: str, dialect: str) -> str:
    """Lowercased host (userinfo and port stripped) from a raw URL —
    userinfo first so credentials/spoof text never reach the domain
    rollup ('http://example.com@evil.io/' → 'evil.io')."""
    hostport = (
        f"lower(regexp_extract({expr}, {_pat(_HOSTPORT_PAT, dialect)}, 1))"
    )
    return (
        f"regexp_replace(regexp_replace({hostport}, '^.*@', ''), "
        f"':[0-9]+$', '')"
    )


# ---------------------------------------------------------------------------
# Registered domain (eTLD+1)
# ---------------------------------------------------------------------------

# one anchored regex, leftmost-first alternation (same preference rule in
# Java regex and RE2): a 3-label suffix form 'x.(co|com|...).<cc>' wins
# where it applies, else the last two labels.
_REG_DOMAIN_PAT = (
    r"([^.]+\.(?:co|com|net|org|gov|ac|edu)\.[a-z][a-z]|[^.]+\.[^.]+)$"
)


def registered_domain_sql(host_expr: str, dialect: str) -> str:
    """eTLD+1 from a lowercase host; '' when the host has <2 labels."""
    return (
        f"regexp_extract({host_expr}, {_pat(_REG_DOMAIN_PAT, dialect)}, 1)"
    )


def registered_domain(col: str) -> Column:
    """Column form of :func:`registered_domain_sql` (spark dialect)."""
    return F.expr(registered_domain_sql(col, "spark"))
