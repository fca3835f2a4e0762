"""The ``.split`` analyzed-field semantics, pinned.

The reference indexes every string field twice: the exact value
(``not_analyzed``) plus a tokenized ``<field>.split`` subfield (ES dynamic
template, ``notebooks/lib/esindex.py:70-97``). The webapp's free-text widget
then issues ``match_phrase_prefix`` against the ``.split`` field
(``services/webapp/src/collections.js:185-191``): case-insensitive "contains
this phrase, last word as a prefix".

ES analyzer behavior has no exact Spark built-in, so we *define* (SURVEY.md
§7 risk list) the deterministic approximation used everywhere in this engine:

- tokens = lowercased maximal runs of ``[a-z0-9]`` (ES standard-analyzer-ish);
- a phrase-prefix query of words ``w1 .. wn`` matches a value iff the token
  stream contains consecutive tokens ``w1, .., w(n-1)`` followed by a token
  with prefix ``wn``.

Implemented as a single regexp predicate so it is sargable on both Spark and
the DuckDB oracle, and stays in whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_BOUNDARY = "(^|[^a-z0-9])"
_TOKEN_SEP = "[^a-z0-9]+"


def split_tokens(col: Column | str) -> Column:
    """Tokenize like the ES ``.split`` subfield: lowercase alnum runs."""
    c = F.col(col) if isinstance(col, str) else col
    # split on non-alnum runs; filter the empty leading/trailing artifacts
    return F.filter(F.split(F.lower(c), _TOKEN_SEP), lambda t: t != "")


def phrase_prefix_regex(text: str) -> str:
    """Regex (POSIX-ish, Spark RLIKE + DuckDB regexp_matches compatible)
    implementing the pinned phrase-prefix semantics for ``text``."""
    words = [w for w in re.split(r"[^a-zA-Z0-9]+", text.lower()) if w]
    if not words:
        return ""  # empty input matches everything (ES: no-op query)
    escaped = [re.escape(w) for w in words]
    # full-token matches for all but the last word, prefix for the last
    middle = _TOKEN_SEP.join(escaped[:-1])
    if middle:
        return f"{_TOKEN_BOUNDARY}{middle}{_TOKEN_SEP}{escaped[-1]}"
    return f"{_TOKEN_BOUNDARY}{escaped[-1]}"


def phrase_prefix_predicate(col: Column | str, text: str) -> Column:
    """``match_phrase_prefix(field.split, text)`` as a Column predicate."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = phrase_prefix_regex(text)
    if not pattern:
        return F.lit(True)
    return F.lower(c).rlike(pattern)


def phrase_regex(text: str) -> str:
    """Regex for ES ``match_phrase`` under the same pinned tokenizer: the
    token stream must contain ALL words of ``text`` consecutively, each as a
    full token (slop=0). Differs from phrase-prefix only in anchoring the
    last word as a complete token."""
    words = [w for w in re.split(r"[^a-zA-Z0-9]+", text.lower()) if w]
    if not words:
        return ""
    escaped = [re.escape(w) for w in words]
    body = _TOKEN_SEP.join(escaped)
    return f"{_TOKEN_BOUNDARY}{body}($|[^a-z0-9])"


def phrase_predicate(col: Column | str, text: str) -> Column:
    """``match_phrase(field.split, text)`` as a Column predicate."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = phrase_regex(text)
    if not pattern:
        return F.lit(True)
    return F.lower(c).rlike(pattern)
