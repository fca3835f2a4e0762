"""Lucene classic query_string syntax -> ES query DSL (the full
``query_string`` query, completing Q7 beyond the reference webapp's two
shapes).

The reference's webapp only ever issues ``*`` and ``field:*``
(``collections.js:78-80``, handled by the compiler's ``query_string``).
A user of the stack can hand-write the full Lucene syntax into the
query bar; this parser covers the classic-QueryParser surface that maps
onto filter-context semantics:

- boolean: ``AND``/``&&``, ``OR``/``||``, ``NOT``/``!``, parentheses;
  ``+required`` / ``-prohibited`` clause prefixes
- fields: ``field:value``, field groups ``field:(a OR b)``,
  ``field:*`` (exists), one-sided ``field:>5 >=5 <5 <=5``
- terms: wildcards ``te?t*``, fuzzy ``term~`` / ``term~1``,
  phrases ``"a b"`` with slop ``"a b"~2``
- ranges: ``field:[a TO b]`` inclusive, ``{a TO b}`` exclusive, mixed
  brackets, ``*`` as an open side
- boosts ``term^2`` are parsed and DISCARDED (filter context has no
  scores — same contract as the rest of the engine; explain/bm25 live
  in operators/ranking.py)
- ``\\`` escapes any special character inside a term
- ``+``/``-`` are operators only at CLAUSE START (start of input,
  after whitespace, ``(`` or another operator) — the classic
  ``_TERM_CHAR`` rule: mid-word they are literal
  (``field:2024-01-01``, ``foo-bar``), and directly after a field
  colon they begin the value (``field:-5`` is a negative number)

Pinned deviations from classic Lucene (documented, deterministic):

- precedence is strict boolean — NOT > AND > OR — rather than the
  classic parser's position-dependent behavior;
- at a level that mixes ``+``/``-`` with plain clauses under implicit
  OR, plain clauses become ``should`` and (per Lucene's practical
  behavior) are optional when a ``+`` clause exists;
- bare terms (no field) require ``default_fields`` — same contract as
  the KQL front-end, since there is no mapping to consult.

Everything compiles to the SAME DSL dicts the other three grammars
produce, so one predicate engine serves all entry points; the ES SQL
front-end's ``QUERY()`` routes here.
"""

from __future__ import annotations

import re
from typing import Any

__all__ = ["LuceneParseError", "parse_lucene", "lucene_query"]


class LuceneParseError(ValueError):
    pass


_SPECIALS = set('+-&|!(){}[]^"~*?:\\/ ')
_RANGE_OPS = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}


class _Tok:
    __slots__ = ("kind", "text", "pos", "suffix")

    def __init__(self, kind: str, text: str, pos: int, suffix: str = ""):
        self.kind = kind    # word quoted lparen rparen colon plus minus
        self.text = text    # not and or range op end
        self.pos = pos
        self.suffix = suffix  # raw ~N / ^N decorations on word/quoted

    def __repr__(self) -> str:  # pragma: no cover
        return f"_Tok({self.kind}, {self.text!r})"


def _lex(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(text)

    def _clause_start(idx: int) -> bool:
        # classic QueryParser treats +/- as operators ONLY at clause
        # start: start of input, after whitespace, '(' or another
        # operator; mid-word (field:2024-01-01, foo-bar) they are term
        # characters (_TERM_CHAR includes them in the JavaCC grammar).
        if idx == 0 or text[idx - 1].isspace():
            return True
        return bool(toks) and toks[-1].kind in (
            "lparen", "and", "or", "not", "plus", "minus"
        )

    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            toks.append(_Tok("lparen", c, i)); i += 1; continue
        if c == ")":
            toks.append(_Tok("rparen", c, i)); i += 1; continue
        if c == ":":
            toks.append(_Tok("colon", c, i)); i += 1; continue
        if c == "+" and _clause_start(i):
            toks.append(_Tok("plus", c, i)); i += 1; continue
        if c == "-" and _clause_start(i):
            toks.append(_Tok("minus", c, i)); i += 1; continue
        if c == "!":
            toks.append(_Tok("not", c, i)); i += 1; continue
        if text.startswith("&&", i):
            toks.append(_Tok("and", "&&", i)); i += 2; continue
        if text.startswith("||", i):
            toks.append(_Tok("or", "||", i)); i += 2; continue
        if c in "<>":
            op = text[i:i + 2] if text[i + 1:i + 2] == "=" else c
            toks.append(_Tok("op", op, i)); i += len(op); continue
        if c in "[{":
            j = i + 1
            depth_q = False
            while j < n and (depth_q or text[j] not in "]}"):
                if text[j] == '"':
                    depth_q = not depth_q
                j += 1
            if j >= n:
                raise LuceneParseError(f"unterminated range at {i}")
            toks.append(_Tok("range", text[i:j + 1], i))
            i = j + 1
            continue
        if c == '"':
            j, out = i + 1, []
            while j < n and text[j] != '"':
                if text[j] == "\\" and j + 1 < n:
                    out.append(text[j + 1]); j += 2; continue
                out.append(text[j]); j += 1
            if j >= n:
                raise LuceneParseError(f"unterminated phrase at {i}")
            j += 1
            # trailing ~N (slop) / ^N (boost)
            m = re.match(r"((?:~\d*|\^[\d.]+)*)", text[j:])
            toks.append(_Tok("quoted", "".join(out), i, m.group(1)))
            i = j + m.end()
            continue
        # word: runs of non-special chars, backslash-escapes allowed;
        # * and ? stay IN the word (wildcards); + and - reach here only
        # when NOT at clause start, where they are term characters
        # (hyphenated dates/identifiers, field:-5 negative numbers)
        j, out = i, []
        while j < n:
            cj = text[j]
            if cj == "\\" and j + 1 < n:
                out.append(text[j + 1]); j += 2; continue
            if cj in "*?+-":
                out.append(cj); j += 1; continue
            if cj in _SPECIALS:
                break
            out.append(cj); j += 1
        word = "".join(out)
        if not word:
            raise LuceneParseError(f"unexpected character {c!r} at {i}")
        m = re.match(r"((?:~\d*|\^[\d.]+)*)", text[j:])
        suffix = m.group(1)
        j += m.end()
        up = word.upper()
        if up == "AND" and not suffix:
            toks.append(_Tok("and", word, i))
        elif up == "OR" and not suffix:
            toks.append(_Tok("or", word, i))
        elif up == "NOT" and not suffix:
            toks.append(_Tok("not", word, i))
        else:
            toks.append(_Tok("word", word, i, suffix))
        i = j
    toks.append(_Tok("end", "", n))
    return toks


def _coerce(value: str) -> Any:
    for cast in (int, float):
        try:
            return cast(value)
        except ValueError:
            continue
    if value.lower() in ("true", "false"):
        return value.lower() == "true"
    return value


def _decorations(suffix: str) -> tuple[int | None, bool]:
    """Parse the ~N / ^B decoration run -> (fuzz_or_slop, has_fuzzy).
    Boosts are discarded (filter context)."""
    fuzz: int | None = None
    has = False
    for m in re.finditer(r"~(\d*)|\^([\d.]+)", suffix):
        if m.group(0).startswith("~"):
            has = True
            fuzz = int(m.group(1)) if m.group(1) else None
    return fuzz, has


class _Parser:
    def __init__(self, toks: list[_Tok], default_fields: list[str] | None):
        self.toks = toks
        self.i = 0
        self.default_fields = default_fields

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    # -- grammar: or_expr > and_expr > unary > atom ------------------------
    def parse(self) -> dict[str, Any]:
        node = self.or_expr()
        if self.peek().kind != "end":
            raise LuceneParseError(
                f"unexpected {self.peek().text!r} at {self.peek().pos}"
            )
        return node

    def or_expr(self) -> dict[str, Any]:
        shoulds: list[dict] = []
        musts: list[dict] = []
        must_nots: list[dict] = []
        first = True
        # clauses separated by OR or juxtaposition (Lucene default OR),
        # with +/- prefixes routing to must/must_not at THIS level
        while True:
            t = self.peek()
            if t.kind == "or" and not first:
                self.next()
                t = self.peek()
            if t.kind == "plus":
                self.next()
                musts.append(self.unary())
                # classic: a conjunction after a modifier clause makes
                # the following clauses required too (+foo AND bar ==
                # +foo +bar), so consume the AND chain here instead of
                # leaving the AND token to die unexpected
                while self.peek().kind == "and":
                    self.next()
                    musts.append(self.unary())
            elif t.kind == "minus":
                self.next()
                must_nots.append(self.unary())
                while self.peek().kind == "and":
                    self.next()
                    musts.append(self.unary())
            elif t.kind in ("word", "quoted", "lparen", "not"):
                shoulds.append(self.and_expr())
            elif first:
                raise LuceneParseError(
                    f"expected a clause at {t.pos}"
                )
            else:
                break
            first = False
            if self.peek().kind not in (
                "or", "word", "quoted", "lparen", "not", "plus", "minus"
            ):
                break
        if not musts and not must_nots:
            if len(shoulds) == 1:
                return shoulds[0]
            return {"bool": {"should": shoulds,
                             "minimum_should_match": 1}}
        b: dict[str, Any] = {}
        if musts:
            b["must"] = musts
        if must_nots:
            b["must_not"] = must_nots
        if shoulds:
            if musts:
                # Lucene: should becomes OPTIONAL once a + clause exists —
                # in filter context an optional clause only affects score,
                # i.e. it does not constrain the match set: drop it
                pass
            else:
                b["should"] = shoulds
                b["minimum_should_match"] = 1
        return {"bool": b}

    def and_expr(self) -> dict[str, Any]:
        parts = [self.unary()]
        while self.peek().kind == "and":
            self.next()
            parts.append(self.unary())
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"must": parts}}

    def unary(self) -> dict[str, Any]:
        t = self.peek()
        if t.kind == "not":
            self.next()
            return {"bool": {"must_not": [self.unary()]}}
        if t.kind == "plus":
            self.next()
            return self.unary()
        if t.kind == "minus":
            self.next()
            return {"bool": {"must_not": [self.unary()]}}
        return self.atom()

    def atom(self) -> dict[str, Any]:
        t = self.next()
        if t.kind == "lparen":
            node = self.or_expr()
            if self.peek().kind != "rparen":
                raise LuceneParseError(
                    f"expected ')' at {self.peek().pos}"
                )
            self.next()
            return node
        if t.kind == "word" and self.peek().kind == "colon":
            self.next()
            return self.field_value(t.text)
        if t.kind in ("word", "quoted"):
            return self.bare(t)
        raise LuceneParseError(f"unexpected {t.text!r} at {t.pos}")

    # -- field:value forms --------------------------------------------------
    def field_value(self, field: str) -> dict[str, Any]:
        t = self.peek()
        if t.kind == "lparen":
            self.next()
            saved = self.default_fields
            # inside a field group, bare terms bind to the group's field
            self.default_fields = [field]
            node = self.or_expr()
            self.default_fields = saved
            if self.peek().kind != "rparen":
                raise LuceneParseError(f"expected ')' at {self.peek().pos}")
            self.next()
            return node
        if t.kind == "op":
            self.next()
            v = self.next()
            if v.kind not in ("word", "quoted"):
                raise LuceneParseError(f"range needs a value at {v.pos}")
            rv = v.text if v.kind == "quoted" else _coerce(v.text)
            return {"range": {field: {_RANGE_OPS[t.text]: rv}}}
        if t.kind == "range":
            self.next()
            return self.bracket_range(field, t)
        if t.kind == "quoted":
            self.next()
            slop, _ = _decorations(t.suffix)
            if slop:
                return {"match_phrase": {field: {"query": t.text,
                                                 "slop": slop}}}
            return {"match_phrase": {field: t.text}}
        if t.kind == "word":
            self.next()
            return self.term_query(field, t)
        raise LuceneParseError(
            f"expected a value for field {field!r} at {t.pos}"
        )

    def term_query(self, field: str, t: _Tok) -> dict[str, Any]:
        fuzz, has_fuzzy = _decorations(t.suffix)
        if t.text == "*":
            return {"exists": {"field": field}}
        if has_fuzzy:
            spec: dict[str, Any] = {"value": t.text}
            spec["fuzziness"] = fuzz if fuzz is not None else "AUTO"
            return {"fuzzy": {field: spec}}
        if "*" in t.text or "?" in t.text:
            return {"wildcard": {field: {"value": t.text}}}
        return {"match": {field: _coerce(t.text)}}

    def bracket_range(self, field: str, t: _Tok) -> dict[str, Any]:
        body = t.text
        lo_inc = body[0] == "["
        hi_inc = body[-1] == "]"
        inner = body[1:-1].strip()
        m = re.match(r'^("(?:[^"\\]|\\.)*"|\S+)\s+TO\s+("(?:[^"\\]|\\.)*"|\S+)$',
                     inner, re.IGNORECASE)
        if not m:
            raise LuceneParseError(f"bad range {body!r} at {t.pos}")

        def side(raw: str) -> Any:
            if raw.startswith('"') and raw.endswith('"'):
                return re.sub(r"\\(.)", r"\1", raw[1:-1])
            if raw == "*":
                return None
            return _coerce(raw)

        lo, hi = side(m.group(1)), side(m.group(2))
        spec: dict[str, Any] = {}
        if lo is not None:
            spec["gte" if lo_inc else "gt"] = lo
        if hi is not None:
            spec["lte" if hi_inc else "lt"] = hi
        if not spec:
            return {"exists": {"field": field}}
        return {"range": {field: spec}}

    # -- bare terms ---------------------------------------------------------
    def bare(self, t: _Tok) -> dict[str, Any]:
        if t.kind == "word" and t.text == "*" and not t.suffix:
            return {"match_all": {}}
        if self.default_fields is None:
            raise LuceneParseError(
                f"bare term {t.text!r} at {t.pos} needs default_fields"
            )
        parts = []
        for f in self.default_fields:
            if t.kind == "quoted":
                slop, _ = _decorations(t.suffix)
                parts.append(
                    {"match_phrase": {f: {"query": t.text, "slop": slop}}}
                    if slop else {"match_phrase": {f: t.text}}
                )
            else:
                parts.append(self.term_query(f, t))
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"should": parts, "minimum_should_match": 1}}


def parse_lucene(
    text: str, *, default_fields: list[str] | None = None
) -> dict[str, Any]:
    """Parse Lucene query_string ``text`` into an ES query-DSL dict."""
    if not text or not text.strip():
        return {"match_all": {}}
    return _Parser(_lex(text), default_fields).parse()


def lucene_query(
    text: str,
    *,
    default_fields: list[str] | None = None,
    now: Any = None,
):
    """Lucene text -> Column predicate through the one shared compiler."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    return compile_query(
        parse_lucene(text, default_fields=default_fields), now=now
    )
