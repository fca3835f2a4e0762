"""ES ``intervals`` query — position-aware matching, dual-dialect.

The one ES query family the token-regex predicates (tokenize.py) cannot
express: "terms near each other / in order within N gaps" needs token
POSITIONS, not just presence. ES reference semantics
(`intervals` query, `match` rule): the analyzed terms must all occur in
an interval whose total slack — ``span - n_terms`` — is at most
``max_gaps`` (default -1 = unbounded), optionally in query order.

Engine encoding: 1-based token-position arrays per term over the pinned
``.split`` tokenization, then nested EXISTS over position combinations.
Everything is a codegen'd column expression on both engines — no explode,
no join, sargability traded for positions only where the query needs
them (`compile_query` still routes plain matches through the regex path).

Position arrays: ``filter(sequence(1, size(toks)), i -> toks[i] = w)``
(Spark) / ``list_filter(generate_series(1, len(toks)), ...)`` (DuckDB) —
guarded for the empty-token stream because Spark's ``sequence(1, 0)``
DESCENDS ([1, 0]) instead of returning empty.

Combination depth is capped at 3 terms per ``match`` rule (nested-EXISTS
cost is |P1|x|P2|x|P3| per row, and real interval queries are short);
longer rules raise with a pointer to composing ``all_of`` clauses.
"""

from __future__ import annotations

import re

from harmonize_search_analyze_spark.operators.text import tokens_sql

MAX_TERMS = 3


def _positions_sql(toks: str, word: str, dialect: str) -> str:
    w = word.lower()
    if not re.fullmatch(r"[a-z0-9]+", w):
        raise ValueError(f"interval terms must be alnum tokens: {word!r}")
    if dialect == "spark":
        # two-arg transform: the token array is materialized ONCE and
        # iterated. The earlier element_at(toks, i)-inside-filter form
        # re-tokenized per element — O(tokens^2) per row, measured ~6 ms
        # per 300-token document (~10x this form)
        return (
            f"filter(transform({toks}, (t, i) -> "
            f"CASE WHEN t = '{w}' THEN i + 1 ELSE -1 END), p -> p >= 0)"
        )
    return (
        f"CASE WHEN len({toks}) = 0 THEN [] "
        f"ELSE list_filter(generate_series(1, len({toks})), "
        f"i -> ({toks})[i] = '{w}') END"
    )


def _exists_sql(arr: str, var: str, pred: str, dialect: str) -> str:
    if dialect == "spark":
        return f"exists({arr}, {var} -> {pred})"
    return f"len(list_filter({arr}, {var} -> {pred})) > 0"


def intervals_match_sql(
    field_expr: str,
    query: str,
    dialect: str,
    *,
    max_gaps: int = -1,
    ordered: bool = False,
) -> str:
    """Boolean SQL for one ``match`` rule. ``max_gaps=-1`` = unbounded
    (ES default); 0 = strictly adjacent-modulo-order."""
    words = [w for w in re.split(r"[^a-zA-Z0-9]+", query.lower()) if w]
    if not words:
        return "TRUE"
    if len(words) > MAX_TERMS:
        raise ValueError(
            f"match rule supports up to {MAX_TERMS} terms "
            f"(got {len(words)}); compose all_of sub-intervals instead"
        )
    toks = tokens_sql(field_expr, dialect)
    pos = [_positions_sql(toks, w, dialect) for w in words]
    n = len(words)
    if n == 1:
        if dialect == "spark":
            return f"size({pos[0]}) > 0"
        return f"len({pos[0]}) > 0"
    g = max_gaps
    if n == 2:
        if ordered:
            inner = "p2 > p1" + (f" AND p2 - p1 - 1 <= {g}" if g >= 0 else "")
        else:
            inner = "p2 <> p1" + (
                f" AND abs(p2 - p1) - 1 <= {g}" if g >= 0 else ""
            )
        return _exists_sql(
            pos[0], "p1", _exists_sql(pos[1], "p2", inner, dialect), dialect
        )
    # n == 3: slack = span - 3 = max-min-2
    if ordered:
        inner3 = "p3 > p2" + (f" AND p3 - p1 - 2 <= {g}" if g >= 0 else "")
        inner2 = "p2 > p1 AND " + _exists_sql(pos[2], "p3", inner3, dialect)
    else:
        span = "greatest(p1, p2, p3) - least(p1, p2, p3) - 2"
        inner3 = "p3 <> p1 AND p3 <> p2" + (
            f" AND {span} <= {g}" if g >= 0 else ""
        )
        inner2 = "p2 <> p1 AND " + _exists_sql(pos[2], "p3", inner3, dialect)
    return _exists_sql(
        pos[0], "p1", _exists_sql(pos[1], "p2", inner2, dialect), dialect
    )


def intervals_sql(rule: dict, field_expr: str, dialect: str) -> str:
    """Compile an ES intervals RULE (``match`` / ``any_of`` / ``all_of``)
    to boolean SQL. ``all_of`` here is the unordered conjunction (each
    sub-interval must match somewhere); ES's ordered cross-rule
    composition is not modeled — express ordering inside a ``match``."""
    if not isinstance(rule, dict) or len(rule) != 1:
        raise ValueError(f"intervals rule must have exactly one key: {rule!r}")
    (kind, body), = rule.items()
    if kind == "match":
        return intervals_match_sql(
            field_expr,
            str(body.get("query", "")),
            dialect,
            max_gaps=int(body.get("max_gaps", -1)),
            ordered=bool(body.get("ordered", False)),
        )
    if kind in ("any_of", "all_of"):
        subs = body.get("intervals") or []
        if not subs:
            raise ValueError(f"{kind} requires a non-empty intervals list")
        if kind == "all_of" and body.get("ordered"):
            raise ValueError(
                "ordered all_of across sub-intervals is not modeled; "
                "put the ordering inside one match rule"
            )
        parts = [f"({intervals_sql(s, field_expr, dialect)})" for s in subs]
        joiner = " OR " if kind == "any_of" else " AND "
        return joiner.join(parts)
    raise ValueError(f"unsupported intervals rule: {kind!r}")


def span_first_sql(
    field_expr: str, term: str, end: int, dialect: str
) -> str:
    """ES ``span_first`` query over a ``span_term`` clause: the term must
    occur with its span END at or before position ``end``. ES positions
    are 0-based and a single-term span at 0-based position p has
    end = p + 1, so the contract is "the term appears among the first
    ``end`` tokens". Our position arrays are 1-based: condition
    ``p <= end``.

    Reference shape: Lucene SpanFirstQuery (public Lucene semantics; the
    ES reference exposes it verbatim). One codegen'd expression over the
    pinned tokenization — the position array is built once and scanned;
    no explode, no join.
    """
    if end < 1:
        raise ValueError(f"span_first end must be >= 1, got {end}")
    pos = _positions_sql(tokens_sql(field_expr, dialect), term, dialect)
    return _exists_sql(pos, "p", f"p <= {int(end)}", dialect)


def span_near_sql(
    field_expr: str,
    terms: list[str],
    dialect: str,
    *,
    slop: int = 0,
    in_order: bool = True,
) -> str:
    """ES ``span_near`` over ``span_term`` clauses: all terms occur with
    total slack (span width minus term count) at most ``slop``,
    optionally in clause order.

    For single-term clauses Lucene's span_near slack is EXACTLY the
    intervals ``match`` rule's ``max_gaps`` measure — (max_pos - min_pos
    + 1) - n <= slop — so this compiles through
    :func:`intervals_match_sql` rather than re-deriving the nested-EXISTS
    shape (same 3-term combination cap applies; compose bool/must of
    spans beyond that).
    """
    if slop < 0:
        raise ValueError(f"span_near slop must be >= 0, got {slop}")
    if not terms:
        raise ValueError("span_near requires at least one span_term clause")
    for t in terms:
        # one alnum token per span_term clause — a non-alnum value would
        # re-split to ZERO words inside intervals_match_sql and compile
        # to literal TRUE (match-all); a multi-word value would silently
        # become several clauses sharing the slop budget
        if not re.fullmatch(r"[a-zA-Z0-9]+", t):
            raise ValueError(
                f"span_term value must be one alnum token: {t!r}"
            )
    return intervals_match_sql(
        field_expr,
        " ".join(terms),
        dialect,
        max_gaps=int(slop),
        ordered=bool(in_order),
    )


def span_not_sql(
    field_expr: str,
    include_term: str,
    exclude_term: str,
    dialect: str,
    *,
    pre: int = 0,
    post: int = 0,
) -> str:
    """ES ``span_not`` over ``span_term`` clauses: the include term must
    occur at some position whose surrounding window — ``pre`` tokens
    before through ``post`` tokens after — contains NO occurrence of the
    exclude term (Lucene SpanNotQuery with pre/post, public semantics;
    pre=post=0 excludes only overlap, which for single-term spans means
    the default span_not degenerates to plain presence — pass pre/post
    for the useful "not adjacent to" forms).

    Same machinery as the rest of the span family: both position arrays
    built once per row from the pinned tokenization, one nested
    NOT-EXISTS — codegen'd on both engines, no explode."""
    if pre < 0 or post < 0:
        raise ValueError("span_not pre/post must be >= 0")
    for t in (include_term, exclude_term):
        if not re.fullmatch(r"[a-zA-Z0-9]+", t):
            raise ValueError(
                f"span_term value must be one alnum token: {t!r}"
            )
    toks = tokens_sql(field_expr, dialect)
    inc = _positions_sql(toks, include_term, dialect)
    exc = _positions_sql(toks, exclude_term, dialect)
    bad = _exists_sql(
        exc, "q", f"q >= p - {int(pre)} AND q <= p + {int(post)}", dialect
    )
    return _exists_sql(inc, "p", f"NOT ({bad})", dialect)
