"""ES ``_analyze`` API: composable tokenizer + token-filter chains.

ES exposes text analysis as a pipeline — one tokenizer followed by token
filters — both at index time (mappings declare ``analyzer``) and ad-hoc via
``POST /_analyze``. The reference's stack leans on this for its ``.split``
subfields (tokenize.py pins that one analyzer); this module generalizes it
to the full chain a user of the ES surface composes:

    tokenizer:  standard | whitespace | letter | keyword
    filters:    lowercase, uppercase, asciifolding, trim, reverse,
                stop(words), length(min,max), truncate(n), unique,
                edge_ngram(min,max), shingle(min,max, output_unigrams)

Everything compiles to ONE nested higher-order-function column expression
(``split``/``filter``/``transform``/``flatten`` — JVM codegen, zero Python
in the row path) with a DuckDB twin for the oracle gate, so an analyzer
chain is a map-only projection at any scale: no shuffle, no UDF, fused into
whatever scan feeds it.

Pinned semantics (SURVEY.md §7 discipline — ES leaves these to Lucene
internals, we define them deterministically):

- ``standard`` tokenizer = maximal ``[A-Za-z0-9]`` runs (ASCII pinning of
  Lucene's StandardTokenizer; it does NOT lowercase — that's the
  ``lowercase`` filter, exactly as in ES).
- ``asciifolding`` folds the Latin-1/Latin-Extended accent table below
  (the high-frequency subset; ES folds more codepoints).
- ``unique`` removes later duplicates keeping FIRST occurrence order (ES
  ``unique`` filter contract) — implemented order-preservingly because
  DuckDB's ``list_distinct`` does not guarantee order.
- ``edge_ngram`` emits prefixes of each token, lengths ``min..max``; a
  token shorter than ``min`` emits nothing (ES edge_ngram contract).
- ``shingle`` emits space-joined word n-grams for every n in ``min..max``
  (plus the unigrams when ``output_unigrams``, ES default true), in token
  order, n ascending per ES's position-interleaving flattened.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ES/Lucene default English stopword set (the `_english_` list).
ENGLISH_STOP = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
]

# accent-fold table, built per group so src/dst lengths cannot drift.
_FOLD_GROUPS = [
    ("áàâäãåā", "a"), ("éèêëē", "e"), ("íìîïī", "i"), ("óòôöõō", "o"),
    ("úùûüū", "u"), ("ýÿ", "y"), ("ñ", "n"), ("çćč", "c"), ("šś", "s"),
    ("žź", "z"),
]
_FOLD_SRC = "".join(
    src + src.upper() for src, _ in _FOLD_GROUPS
)
_FOLD_DST = "".join(
    dst * len(src) + dst.upper() * len(src) for src, dst in _FOLD_GROUPS
)
assert len(_FOLD_SRC) == len(_FOLD_DST)

# NOTE: the whitespace class embeds LITERAL tab/newline/return characters —
# `\s` spelled with a backslash is unescaped differently by the Spark and
# DuckDB string-literal parsers, literal chars read identically in both.
# Letter classes include Latin-1 Supplement + Latin Extended-A letters
# (skipping × U+00D7 and ÷ U+00F7) so accented words stay whole tokens for
# asciifolding to fold — the ASCII-pinned approximation of Lucene's
# unicode-aware StandardTokenizer.
_LATIN = "À-ÖØ-öø-ž"
_TOKENIZER_SPLIT = {
    "standard": f"[^A-Za-z0-9{_LATIN}]+",
    "whitespace": "[ \t\n\r]+",
    "letter": f"[^A-Za-z{_LATIN}]+",
}


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def tokenizer_sql(expr: str, tokenizer: str, dialect: str) -> str:
    """Array-of-tokens expression for one ES tokenizer over a string
    expression. ``keyword`` wraps the whole value as a single token."""
    if tokenizer == "keyword":
        if dialect == "spark":
            return f"CASE WHEN {expr} IS NULL THEN NULL ELSE array({expr}) END"
        return f"CASE WHEN {expr} IS NULL THEN NULL ELSE [{expr}] END"
    try:
        sep = _TOKENIZER_SPLIT[tokenizer]
    except KeyError:
        raise ValueError(f"unknown tokenizer: {tokenizer!r}") from None
    if dialect == "spark":
        return f"filter(split({expr}, '{sep}'), t -> t <> '')"
    return (
        f"list_filter(regexp_split_to_array({expr}, '{sep}'), "
        "t -> t <> '')"
    )


def _let(toks: str, var: str, body: str, spark: bool) -> str:
    """Bind ``toks`` ONCE as lambda variable ``var`` inside ``body``.

    Filters that reference their input array several times (unique: 2×,
    shingle: 1 + 2 per n) would otherwise inline — and re-evaluate — the
    entire upstream chain per reference: neither engine CSEs across
    higher-order-function arguments, and the measured cost was ~6× on the
    shingle chain. A single-element transform is the let-expression both
    dialects have: the array argument is evaluated once, the body sees a
    bound variable. ``var`` must be unique per nesting level (both binders
    mis-capture shadowed lambda names)."""
    if spark:
        return f"transform(array({toks}), {var} -> {body})[0]"
    return f"list_transform([{toks}], {var} -> {body})[1]"


def _filter_sql(
    toks: str, name: str, params: dict, dialect: str, idx: int = 0
) -> str:
    """One token filter applied to an array expression. ``idx`` is the
    filter's position in the chain — it keys the let-binding variable so
    nested bindings never shadow."""
    spark = dialect == "spark"
    tr = "transform" if spark else "list_transform"
    fi = "filter" if spark else "list_filter"
    v = f"T{idx}"

    if name == "lowercase":
        return f"{tr}({toks}, t -> lower(t))"
    if name == "uppercase":
        return f"{tr}({toks}, t -> upper(t))"
    if name == "trim":
        return f"{tr}({toks}, t -> trim(t))"
    if name == "reverse":
        return f"{tr}({toks}, t -> reverse(t))"
    if name == "asciifolding":
        return (
            f"{tr}({toks}, t -> translate(t, {_q(_FOLD_SRC)},"
            f" {_q(_FOLD_DST)}))"
        )
    if name == "stemmer_minimal_english":
        # Lucene EnglishMinimalStemFilter (Harman's S-stemmer), the exact
        # published decision tree so terms match an ES-analyzed index:
        #   len < 3 or no trailing 's'        -> keep
        #   ends -us / -ss                    -> keep
        #   ends -ies, len > 3, char before
        #     the suffix not a/e              -> ies -> y  (ponies->pony)
        #   ends -Xes with X in {i,a,o,u}     -> keep      (goes, ies)
        #   otherwise                         -> strip the 's'
        ln = "length(t)"
        ch = lambda back: f"substr(t, {ln} - {back}, 1)"  # noqa: E731
        body = (
            f"CASE WHEN {ln} < 3 OR {ch(0)} <> 's' THEN t"
            f" WHEN {ch(1)} IN ('u', 's') THEN t"
            f" WHEN {ch(1)} = 'e' AND {ln} > 3 AND {ch(2)} = 'i'"
            f" AND {ch(3)} NOT IN ('a', 'e')"
            f" THEN concat(substr(t, 1, {ln} - 3), 'y')"
            f" WHEN {ch(1)} = 'e' AND {ch(2)} IN ('i', 'a', 'o', 'u')"
            " THEN t"
            f" ELSE substr(t, 1, {ln} - 1) END"
        )
        return f"{tr}({toks}, t -> {body})"
    if name == "stop":
        words = params.get("words", ENGLISH_STOP)
        lst = ", ".join(_q(w) for w in words)
        return f"{fi}({toks}, t -> t NOT IN ({lst}))"
    if name == "length":
        lo = int(params.get("min", 0))
        hi = int(params.get("max", 2**31 - 1))
        return (
            f"{fi}({toks}, t -> length(t) >= {lo} AND length(t) <= {hi})"
        )
    if name == "truncate":
        n = int(params.get("length", 10))
        return f"{tr}({toks}, t -> substr(t, 1, {n}))"
    if name == "unique":
        # first-occurrence order (DuckDB list_distinct is unordered);
        # Spark's lambda index is 0-based, DuckDB's 1-based. The lambda
        # variables are uniquely named: `toks` is inlined INSIDE the lambda
        # body and carries its own `t`-named lambdas — reusing `t` here
        # makes the binder capture the outer variable in the inner chain.
        if spark:
            body = f"filter({v}, (u0, i0) -> array_position({v}, u0) = i0 + 1)"
        else:
            body = f"list_filter({v}, (u0, i0) -> list_position({v}, u0) = i0)"
        return _let(toks, v, body, spark)
    if name == "edge_ngram":
        lo = int(params.get("min_gram", 1))
        hi = int(params.get("max_gram", 2))
        if not 1 <= lo <= hi:
            raise ValueError("edge_ngram needs 1 <= min_gram <= max_gram")
        if spark:
            inner = (
                f"transform(filter(sequence({lo}, {hi}),"
                " i -> i <= length(t)), i -> substr(t, 1, CAST(i AS INT)))"
            )
            return f"flatten(transform({toks}, t -> {inner}))"
        inner = (
            f"list_transform(list_filter(range({lo}, {hi + 1}),"
            " i -> i <= length(t)), i -> substr(t, 1, CAST(i AS INT)))"
        )
        return f"flatten(list_transform({toks}, t -> {inner}))"
    if name == "shingle":
        lo = int(params.get("min_shingle_size", 2))
        hi = int(params.get("max_shingle_size", 2))
        if not 2 <= lo <= hi:
            raise ValueError("shingle needs 2 <= min <= max")
        parts = [v] if params.get("output_unigrams", True) else []
        for n in range(lo, hi + 1):
            if spark:
                # sequence(1, 0) DESCENDS ([1,0]) rather than yielding an
                # empty array — short docs need the explicit empty branch
                parts.append(
                    f"CASE WHEN size({v}) >= {n} THEN"
                    f" transform(sequence(1, size({v}) - {n - 1}),"
                    f" i -> array_join(slice({v}, CAST(i AS INT),"
                    f" {n}), ' '))"
                    " ELSE array() END"
                )
            else:
                parts.append(
                    f"list_transform(range(1,"
                    f" greatest(len({v}) - {n - 1}, 0) + 1),"
                    f" i -> array_to_string(list_slice({v}, i,"
                    f" i + {n - 1}), ' '))"
                )
        if len(parts) == 1:
            body = parts[0]
        elif spark:
            body = f"concat({', '.join(parts)})"
        else:
            body = parts[0]
            for p in parts[1:]:  # DuckDB list_concat is strictly binary
                body = f"list_concat({body}, {p})"
        return _let(toks, v, body, spark)
    raise ValueError(f"unknown token filter: {name!r}")


def analyze_sql(
    expr: str,
    dialect: str,
    *,
    tokenizer: str = "standard",
    filters: list[str | tuple[str, dict]] | None = None,
) -> str:
    """The full analyzer chain as ONE array-typed SQL expression (both
    dialects) — tokenizer first, then filters in order, exactly ES's
    pipeline contract."""
    out = tokenizer_sql(expr, tokenizer, dialect)
    for idx, f in enumerate(filters or []):
        name, params = f if isinstance(f, tuple) else (f, {})
        out = _filter_sql(out, name, params, dialect, idx)
    return out


def analyze(
    col: Column | str,
    *,
    tokenizer: str = "standard",
    filters: list[str | tuple[str, dict]] | None = None,
) -> Column:
    """DataFrame-side analyzer chain: an array<string> Column."""
    expr = col if isinstance(col, str) else None
    if expr is None:
        raise TypeError(
            "analyze() takes a column NAME (the chain compiles to a SQL "
            "expression string); wrap computed inputs in a select first"
        )
    return F.expr(
        analyze_sql(expr, "spark", tokenizer=tokenizer, filters=filters)
    )


def analyze_api(
    df: DataFrame,
    text_col: str,
    *,
    tokenizer: str = "standard",
    filters: list[str | tuple[str, dict]] | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """The ``POST /_analyze`` response shape: one row per emitted token
    with its 0-based ``position`` in the post-chain stream (ES numbers the
    final stream; graph positions for shingles are flattened — documented
    deviation). Map-only: tokenize + posexplode, no shuffle."""
    toks = analyze(text_col, tokenizer=tokenizer, filters=filters)
    keep = [F.col(id_col)] if id_col else []
    return df.select(*keep, F.posexplode(toks).alias("position", "token"))


# ES index-settings wire-format filter spellings -> this module's names.
_ES_FILTER_ALIASES = {
    "asciifolding": "asciifolding",
    "lowercase": "lowercase",
    "uppercase": "uppercase",
    "trim": "trim",
    "reverse": "reverse",
    "unique": "unique",
    "stop": "stop",
    "length": "length",
    "truncate": "truncate",
    "edge_ngram": "edge_ngram",
    "shingle": "shingle",
    "stemmer": "stemmer_minimal_english",
}


def analyzer_from_settings(spec: dict) -> dict:
    """Adapt an ES index-settings custom-analyzer definition (the wire
    JSON under ``settings.analysis.analyzer.<name>`` plus its referenced
    ``filter`` definitions) into ``analyze()`` kwargs — the same
    data-not-code loading contract as the Kibana/ingest/curation spec
    loaders.

    ``spec`` shape::

        {"tokenizer": "standard",
         "filter": ["lowercase",
                    {"type": "stop", "stopwords": ["a", "the"]},
                    {"type": "edge_ngram", "min_gram": 2, "max_gram": 5}]}

    String entries are parameterless filters; dict entries carry their ES
    parameter names (stopwords -> stop words; min_gram/max_gram,
    min_shingle_size/..., length min/max, truncate length pass through).
    ``stemmer`` maps to the minimal-english stemmer (the one stemmer this
    engine pins); unknown filters raise."""
    if spec.get("char_filter"):
        # fail loudly: dropping html_strip etc. would silently diverge
        # from what the same settings produce in ES
        raise ValueError(
            "char_filter is not supported by this analyzer surface"
        )
    filters: list = []
    for f in spec.get("filter", []):
        if isinstance(f, str):
            name, params = f, {}
        else:
            name = f.get("type")
            params = {k: v for k, v in f.items() if k != "type"}
        mapped = _ES_FILTER_ALIASES.get(name)
        if mapped is None:
            raise ValueError(f"unsupported token filter: {name!r}")
        if mapped == "stop" and "stopwords" in params:
            words = params["stopwords"]
            if isinstance(words, str):
                # ES's named-list wire form; only the default English
                # list is modeled — other languages must raise, not
                # iterate the NAME character-by-character
                if words != "_english_":
                    raise ValueError(
                        f"unsupported named stopword list: {words!r}"
                    )
                words = ENGLISH_STOP
            params = {"words": list(words)}
        if mapped == "stemmer_minimal_english":
            lang = params.pop("language", "english")
            if lang not in ("english", "minimal_english"):
                raise ValueError(
                    f"unsupported stemmer language: {lang!r} (only the "
                    "minimal English stemmer is pinned)"
                )
        filters.append((mapped, params) if params else mapped)
    return {
        "tokenizer": spec.get("tokenizer", "standard"),
        "filters": filters,
    }
