"""Property tests for the KQL parser: random clause trees, rendered to
KQL text with randomized spacing and keyword case, must parse back to
exactly the DSL the tree denotes. Exercises tokenizer boundaries,
precedence, grouping and escaping far beyond the hand cases."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from harmonize_search_analyze_spark.plans.kql import parse_kql

# identifier-ish field names (never a keyword, never starting with a digit)
fields = st.sampled_from(["status", "event_type", "user.name", "v1", "ts"])
# bare-word values that survive tokenization unquoted: no whitespace,
# no reserved chars, not a keyword, no wildcard chars, non-numeric (so
# coercion stays the identity and comparison is exact)
bare_values = st.text(
    alphabet="abcdefgh_-.", min_size=1, max_size=8
).filter(
    lambda s: s.lower() not in ("and", "or", "not")
    and not s.replace(".", "").replace("-", "").replace("_", "").isdigit()
    and s not in (".", "-", "_")
)
int_values = st.integers(-999, 999)


def _kw(rnd: int, word: str) -> str:
    return [word.lower(), word.upper(), word.capitalize()][rnd % 3]


def _sp(rnd: int) -> str:
    return [" ", "  ", " "][rnd % 3]


leaf = st.one_of(
    st.tuples(st.just("match"), fields, bare_values),
    st.tuples(st.just("match_int"), fields, int_values),
    st.tuples(st.just("phrase"), fields, bare_values),
    st.tuples(st.just("exists"), fields, st.just("*")),
    st.tuples(
        st.just("range"),
        fields,
        st.tuples(st.sampled_from([">", ">=", "<", "<="]), int_values),
    ),
)


def tree(depth: int):
    if depth <= 0:
        return leaf
    sub = tree(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(st.just("not"), sub),
        st.tuples(st.just("and"), sub, sub),
        st.tuples(st.just("or"), sub, sub),
    )


_OPMAP = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}


def render(node, rnd) -> tuple[str, dict]:
    """Node -> (kql_text, expected_dsl). Every composite is explicitly
    parenthesized so the expected DSL is unambiguous; the precedence
    cases are covered by the hand tests."""
    kind = node[0]
    r = next(rnd)
    if kind == "match":
        _, f, v = node
        return f"{f}{_sp(r)}:{_sp(r)}{v}", {"match": {f: v}}
    if kind == "match_int":
        _, f, v = node
        return f"{f}:{v}", {"match": {f: v}}
    if kind == "phrase":
        _, f, v = node
        return f'{f}:"{v}"', {"match_phrase": {f: v}}
    if kind == "exists":
        _, f, _star = node
        return f"{f}:*", {"exists": {"field": f}}
    if kind == "range":
        _, f, (op, v) = node
        return f"{f}{_sp(r)}{op}{_sp(r)}{v}", {
            "range": {f: {_OPMAP[op]: v}}
        }
    if kind == "not":
        t, d = render(node[1], rnd)
        return f"{_kw(r, 'not')} ({t})", {"bool": {"must_not": [d]}}
    if kind == "and":
        lt, ld = render(node[1], rnd)
        rt, rd2 = render(node[2], rnd)
        return f"({lt}) {_kw(r, 'and')} ({rt})", {
            "bool": {"filter": [ld, rd2]}
        }
    if kind == "or":
        lt, ld = render(node[1], rnd)
        rt, rd2 = render(node[2], rnd)
        return f"({lt}) {_kw(r, 'or')} ({rt})", {
            "bool": {"should": [ld, rd2], "minimum_should_match": 1}
        }
    raise AssertionError(kind)


@settings(max_examples=200, deadline=None)
@given(node=tree(3), seeds=st.lists(st.integers(0, 2), min_size=64, max_size=64))
def test_kql_roundtrip_property(node, seeds):
    text, expected = render(node, iter(seeds * 8))
    assert parse_kql(text) == expected


@settings(max_examples=100, deadline=None)
@given(v=st.text(alphabet='abc*?():<>"\\ ', min_size=1, max_size=10))
def test_escaped_value_always_literal_match(v):
    """Backslash-escaping every char of ANY value (and quoting is not even
    needed) must yield a literal match for exactly that string."""
    escaped = "".join("\\" + c for c in v)
    got = parse_kql(f"f:{escaped}")
    assert got == {"match": {"f": v}}


@settings(max_examples=100, deadline=None)
@given(v=st.text(min_size=0, max_size=12).filter(lambda s: '"' not in s and "\\" not in s))
def test_quoted_value_is_phrase(v):
    got = parse_kql(f'f:"{v}"')
    assert got == {"match_phrase": {"f": v}}
