"""KQL — the Kibana query-bar language, compiled to ES query DSL.

The reference webapp embeds Kibana dashboards whose search bar speaks KQL
(``services/webapp`` wires the Kibana iframe; the query bar is Kibana's
own). Kibana's architecture compiles KQL client-side into an ES-DSL JSON
query and sends THAT to Elasticsearch — so the faithful Spark-first
re-expression is exactly the same split: this module parses KQL text into
the ES-DSL dicts that :mod:`harmonize_search_analyze_spark.plans.compiler`
already knows how to turn into Column predicates. One predicate engine,
two front-end grammars (DSL JSON and KQL text), zero duplicated
semantics.

Supported grammar (the public KQL surface, Kibana docs "Kibana Query
Language"):

- ``a and b``, ``a or b``, ``not a`` — case-insensitive keywords,
  standard precedence ``not`` > ``and`` > ``or``; parentheses group.
- ``field : value`` — match. On a ``field.split`` column this is the
  engine's analyzed token match, mirroring KQL-on-text; on any other
  column it is the exact term match (KQL-on-keyword).
- ``field : "a phrase"`` — match_phrase.
- ``field : val*`` — wildcard (``*`` any run, ``?`` one char, whole-term
  anchored like ES).
- ``field : *`` — exists.
- ``field >= v``, ``>``, ``<=``, ``<`` — range; date-math strings
  (``now-1y``, ``now/d``) pass through to the compiler's pinned-``now``
  date-math machinery.
- ``field : (a or b)`` / ``field : (a and b)`` — value groups, expanded
  to a bool of per-value matches (Kibana's own expansion).
- bare ``value`` (no field) — multi_match over ``default_fields``
  (Kibana searches the index's default fields; the caller supplies them
  here since there is no mapping to consult).
- ``field-pattern*: value`` / ``field-pattern* >= v`` — field-name
  wildcards, expanded against the caller-supplied ``field_names`` list
  and OR-combined (Kibana expands these client-side against the index
  pattern's field list — the same contract as ``default_fields``).
- escaping: backslash escapes the reserved chars ``\\ ( ) : < > " * ?``
  inside unquoted values; quoted strings take ``\\"`` and ``\\\\``.

Documented deviations: the nested-object form ``path:{ sub:v }`` is
rejected with a pointer at the DSL ``nested`` query (the engine supports
it there); KQL has no regex or fuzzy syntax (ES's own position — use the
DSL), and none is invented here.

Scale note: this is a pure driver-side string-to-dict transform — the
output compiles through ``compile_query`` into the same sargable Column
predicates (pushed-down range/term filters, RLIKE residuals) every other
search entry point gets. Nothing here touches the data path.
"""

from __future__ import annotations

import re
from typing import Any

__all__ = ["KQLParseError", "parse_kql", "kql_query"]


class KQLParseError(ValueError):
    """Raised for malformed KQL with the offending position."""


_RESERVED = set('():<>"')
_RANGE_OPS = {">=": "gte", ">": "gt", "<=": "lte", "<": "lt"}


class _Tok:
    __slots__ = ("kind", "text", "pos", "wildcard")

    def __init__(self, kind: str, text: str, pos: int, wildcard: bool = False):
        self.kind = kind        # lparen rparen colon op word quoted end
        self.text = text        # unescaped text (words/quoted)
        self.pos = pos
        self.wildcard = wildcard  # word contains an UNESCAPED * or ?

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"_Tok({self.kind}, {self.text!r}@{self.pos})"


def _tokenize(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            toks.append(_Tok("lparen", c, i)); i += 1
        elif c == ")":
            toks.append(_Tok("rparen", c, i)); i += 1
        elif c == ":":
            toks.append(_Tok("colon", c, i)); i += 1
        elif c in "<>":
            op = text[i : i + 2] if text[i : i + 2] in (">=", "<=") else c
            toks.append(_Tok("op", op, i)); i += len(op)
        elif c == '"':
            j, out = i + 1, []
            while j < n and text[j] != '"':
                if text[j] == "\\" and j + 1 < n:
                    out.append(text[j + 1]); j += 2
                else:
                    out.append(text[j]); j += 1
            if j >= n:
                raise KQLParseError(f"unterminated quote at {i}")
            toks.append(_Tok("quoted", "".join(out), i)); i = j + 1
        else:
            j, out, wild, esc_wild = i, [], False, False
            while j < n:
                ch = text[j]
                if ch.isspace() or ch in _RESERVED:
                    break
                if ch == "\\" and j + 1 < n:
                    if text[j + 1] in "*?":
                        esc_wild = True
                    out.append(text[j + 1]); j += 2
                    continue
                if ch in "*?":
                    wild = True
                out.append(ch); j += 1
            word = "".join(out)
            if wild and esc_wild:
                # _wildcard_regex cannot tell the survivors apart once
                # unescaped — refuse rather than silently widen the match
                raise KQLParseError(
                    f"value at {i} mixes escaped and unescaped wildcards; "
                    "quote the value or drop the escape"
                )
            toks.append(_Tok("word", word, i, wildcard=wild)); i = j
    toks.append(_Tok("end", "", n))
    return toks


def _coerce(value: str) -> Any:
    """KQL is untyped text; ES coerces by field mapping. With no mapping
    to consult, numerals and booleans become typed literals (so term
    matches against numeric columns stay sargable) and everything else
    stays a string."""
    low = value.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if re.fullmatch(r"[+-]?\d+", value):
        return int(value)
    if re.fullmatch(r"[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?", value):
        return float(value)
    return value


class _Parser:
    def __init__(
        self,
        toks: list[_Tok],
        default_fields: list[str] | None,
        field_names: list[str] | None = None,
    ):
        self.toks = toks
        self.i = 0
        self.default_fields = default_fields
        self.field_names = field_names

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def _is_kw(self, t: _Tok, kw: str) -> bool:
        return t.kind == "word" and not t.wildcard and t.text.lower() == kw

    # -- boolean structure ------------------------------------------------
    def parse(self) -> dict[str, Any]:
        node = self.or_expr()
        t = self.peek()
        if t.kind != "end":
            raise KQLParseError(f"unexpected {t.text!r} at {t.pos}")
        return node

    def or_expr(self) -> dict[str, Any]:
        parts = [self.and_expr()]
        while self._is_kw(self.peek(), "or"):
            self.next()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"should": parts, "minimum_should_match": 1}}

    def and_expr(self) -> dict[str, Any]:
        parts = [self.not_expr()]
        while self._is_kw(self.peek(), "and"):
            self.next()
            parts.append(self.not_expr())
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"filter": parts}}

    def not_expr(self) -> dict[str, Any]:
        if self._is_kw(self.peek(), "not"):
            self.next()
            return {"bool": {"must_not": [self.not_expr()]}}
        return self.primary()

    def primary(self) -> dict[str, Any]:
        t = self.peek()
        if t.kind == "lparen":
            self.next()
            node = self.or_expr()
            if self.peek().kind != "rparen":
                raise KQLParseError(f"expected ')' at {self.peek().pos}")
            self.next()
            return node
        if t.kind in ("word", "quoted"):
            return self.clause()
        raise KQLParseError(f"unexpected {t.text or 'end'!r} at {t.pos}")

    # -- field clauses ----------------------------------------------------
    def _expand_field(self, tok: _Tok) -> list[str]:
        """Kibana field-name wildcards (``machine.os*: v``): expanded
        client-side against the index-pattern's field list, which the
        caller supplies as ``field_names`` (there is no mapping to
        consult here, same contract as ``default_fields``)."""
        import fnmatch as _fnmatch

        if self.field_names is None:
            raise KQLParseError(
                f"field pattern {tok.text!r} at {tok.pos} needs "
                "field_names (Kibana expands field wildcards against "
                "the index pattern's field list)"
            )
        hits = sorted(
            f for f in self.field_names
            if _fnmatch.fnmatchcase(f, tok.text)
        )
        if not hits:
            raise KQLParseError(
                f"field pattern {tok.text!r} at {tok.pos} matches no field"
            )
        return hits

    def clause(self) -> dict[str, Any]:
        t = self.next()
        nxt = self.peek()
        if t.kind == "word" and nxt.kind == "colon":
            self.next()
            if t.wildcard:
                # replay the value tokens once per expanded field; OR
                # across fields (Kibana's field-wildcard expansion)
                fields = self._expand_field(t)
                i0 = self.i
                parts = []
                for f in fields:
                    self.i = i0
                    parts.append(self.field_value(f))
                if len(parts) == 1:
                    return parts[0]
                return {
                    "bool": {"should": parts, "minimum_should_match": 1}
                }
            return self.field_value(t.text)
        if t.kind == "word" and nxt.kind == "op":
            self.next()
            v = self.next()
            if v.kind not in ("word", "quoted"):
                raise KQLParseError(f"range needs a value at {v.pos}")
            # KQL quoting pins the literal as a STRING: `price >= "10"`
            # compares lexicographically against a string column; only
            # bare tokens get numeric coercion
            rv = v.text if v.kind == "quoted" else _coerce(v.text)
            rng = {_RANGE_OPS[nxt.text]: rv}
            if t.wildcard:
                fields = self._expand_field(t)
                if len(fields) == 1:
                    return {"range": {fields[0]: rng}}
                return {
                    "bool": {
                        "should": [{"range": {f: dict(rng)}} for f in fields],
                        "minimum_should_match": 1,
                    }
                }
            return {"range": {t.text: rng}}
        # bare `*` is Kibana's match-everything query, field list or not
        if t.kind == "word" and t.wildcard and t.text == "*":
            return {"match_all": {}}
        # bare term -> default-field multi_match
        if self.default_fields is None:
            raise KQLParseError(
                f"bare term {t.text!r} at {t.pos} needs default_fields"
            )
        if t.kind == "quoted":
            return {
                "bool": {
                    "should": [
                        {"match_phrase": {f: t.text}}
                        for f in self.default_fields
                    ],
                    "minimum_should_match": 1,
                }
            }
        if t.kind == "word" and t.wildcard:
            # keep wildcard semantics on the bare path too (a multi_match
            # would compile to literal equality and silently match nothing)
            return {
                "bool": {
                    "should": [
                        {"wildcard": {f: {"value": t.text}}}
                        for f in self.default_fields
                    ],
                    "minimum_should_match": 1,
                }
            }
        return {
            "multi_match": {
                "query": _coerce(t.text),
                "fields": list(self.default_fields),
            }
        }

    def field_value(self, field: str) -> dict[str, Any]:
        t = self.peek()
        if t.kind == "lparen":
            self.next()
            node = self._value_group(field)
            if self.peek().kind != "rparen":
                raise KQLParseError(f"expected ')' at {self.peek().pos}")
            self.next()
            return node
        if t.kind == "op":
            # `field : > 5` is not KQL; catch the common typo loudly
            raise KQLParseError(
                f"use 'field {t.text} value' (no colon) at {t.pos}"
            )
        return self._leaf(field, self.next())

    def _value_group(self, field: str) -> dict[str, Any]:
        """``field:(a or b)`` — Kibana expands value groups to a bool of
        per-value clauses on the same field; ``and`` groups (array-field
        semantics) expand to filter clauses."""
        parts = [self._group_operand(field)]
        kw = None
        while True:
            t = self.peek()
            if self._is_kw(t, "or") or self._is_kw(t, "and"):
                word = t.text.lower()
                if kw is None:
                    kw = word
                elif kw != word:
                    raise KQLParseError(
                        f"mixed and/or inside a value group at {t.pos}; "
                        "parenthesize"
                    )
                self.next()
                parts.append(self._group_operand(field))
            else:
                break
        if len(parts) == 1:
            return parts[0]
        if kw == "and":
            return {"bool": {"filter": parts}}
        return {"bool": {"should": parts, "minimum_should_match": 1}}

    def _group_operand(self, field: str) -> dict[str, Any]:
        t = self.peek()
        if t.kind == "lparen":
            self.next()
            node = self._value_group(field)
            if self.peek().kind != "rparen":
                raise KQLParseError(f"expected ')' at {self.peek().pos}")
            self.next()
            return node
        if self._is_kw(t, "not"):
            self.next()
            return {"bool": {"must_not": [self._group_operand(field)]}}
        if t.kind not in ("word", "quoted"):
            raise KQLParseError(f"expected a value at {t.pos}")
        return self._leaf(field, self.next())

    def _leaf(self, field: str, v: _Tok) -> dict[str, Any]:
        if v.kind == "quoted":
            return {"match_phrase": {field: v.text}}
        if v.kind != "word":
            raise KQLParseError(f"expected a value at {v.pos}")
        if v.text == "{":
            raise KQLParseError(
                "KQL nested-object syntax is not supported; use the DSL "
                "'nested' query (plans/compiler.py) instead"
            )
        if v.text == "*" and v.wildcard:
            return {"exists": {"field": field}}
        if v.wildcard:
            return {"wildcard": {field: {"value": v.text}}}
        return {"match": {field: _coerce(v.text)}}


def parse_kql(
    text: str,
    *,
    default_fields: list[str] | None = None,
    field_names: list[str] | None = None,
) -> dict[str, Any]:
    """Parse KQL ``text`` into an ES query-DSL dict (Kibana's own
    client-side compilation step). ``default_fields`` backs bare terms;
    ``field_names`` backs field-name wildcards (``machine.os*: v``) —
    both are Kibana client-side expansions against the index pattern,
    supplied by the caller since there is no mapping to consult; omitted,
    the corresponding syntax is a parse error."""
    if not text or not text.strip():
        return {"match_all": {}}
    return _Parser(_tokenize(text), default_fields, field_names).parse()


def kql_query(
    text: str,
    *,
    default_fields: list[str] | None = None,
    field_names: list[str] | None = None,
    now: Any = None,
):
    """KQL text -> Column predicate, through the one shared DSL compiler
    (``now`` pins date-math exactly as it does for raw DSL)."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    return compile_query(
        parse_kql(
            text, default_fields=default_fields, field_names=field_names
        ),
        now=now,
    )
