"""ES ingest pipelines: data-driven processor chains over DataFrames.

ES nodes run documents through ingest pipelines — an ordered list of
processors declared as JSON — before indexing. The reference stack leans on
its harmonization layer for the same job (SURVEY §2.2/§2.9,
``notebooks/lib/harmonizeCrimeIncidents.py``); this module implements the
*ES-shaped* surface so a pipeline definition is data, not code — the same
design as the Kibana saved-object loader (`operators/kibana.py`).

Supported processors (the common core of the public ES set), each an entry
``{type: {config...}}`` applied in order:

    set (value or copy_from), rename, remove, trim, lowercase, uppercase,
    gsub, split, join, convert, date, json, kv, csv, dissect, grok,
    script (restricted SQL-expression form, same contract as the `script`
    query in plans/compiler.py), drop, append, bytes, urldecode,
    html_strip, fingerprint, user_agent (pinned ua-parser-family subset,
    relational output columns), inference

Every VALUE processor supports ES's ``if`` conditional — a restricted
painless-as-SQL boolean over the current columns; when false the processor
is a per-row no-op (``drop`` keeps the row). The structural processors
(rename/remove — schema changes that cannot vary per row) REJECT ``if``
with a ValueError rather than silently ignoring it.

Scale: every processor is a column expression — the whole pipeline
compiles to ONE map-only projection/filter chain fused into the scan by
Catalyst: no shuffle, no UDF, no Python in the row path, at any data size.
``drop`` becomes a plain Filter (pushdown-eligible when it references only
scanned columns).

Failure semantics: ES processors abort the document (or pipeline) on
failure unless ``ignore_failure`` is set; a relational plan has no per-row
abort, so conversion-style processors use try-cast NULL-on-failure
semantics (= ES ``ignore_failure: true``), the same mapping the engine's
script query documents. ``on_failure`` handlers are out of scope.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Grok's core pattern library (public logstash-patterns subset, pinned).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPORHOST": r"(?:\d{1,3}\.){3}\d{1,3}|[a-zA-Z0-9.\-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN(?:ING)?|ERROR|FATAL|CRITICAL)",
    "TIMESTAMP_ISO8601":
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:[.,]\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPMETHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH)",
    "QS": r'"[^"]*"',
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")

# an unescaped "(" that does not open a (?...) construct — i.e. a
# CAPTURING group the user wrote in a definition or literal segment
_BARE_GROUP = re.compile(r"(?<!\\)\((?!\?)")


def _neutralize_groups(fragment: str) -> str:
    """Turn user-written capturing groups into non-capturing ones.

    Field extraction relies on NUMBERED groups, so a bare ``(...)``
    inside a pattern definition or between %{} references would shift
    every later field's group index and silently extract wrong values —
    neutralizing keeps the grouping semantics while preserving the
    field-only numbering."""
    return _BARE_GROUP.sub("(?:", fragment)


def grok_to_regex(
    pattern: str, extra: dict[str, str] | None = None
) -> tuple[str, list[str]]:
    """Compile a grok pattern to (java/RE2-safe regex, captured field names
    in group order). ``%{NAME:field}`` captures, ``%{NAME}`` matches
    without capturing. Text between references passes through unescaped —
    grok's contract is that the pattern outside ``%{}`` is itself regex
    (``\\[`` in a pattern matches a literal bracket), unlike dissect's
    literal separators — EXCEPT that capturing groups are rewritten to
    non-capturing (``_neutralize_groups``): only ``%{NAME:field}``
    allocates a numbered group. ``extra`` adds/overrides pattern
    definitions (ES ``pattern_definitions``). Nested %{...} inside
    definitions is expanded recursively (depth-capped)."""
    lib = {**GROK_PATTERNS, **(extra or {})}

    def compile_part(p: str, depth: int, fields: list[str] | None) -> str:
        if depth > 5:
            raise ValueError("grok pattern nesting too deep")
        out, last = [], 0
        for m in _GROK_REF.finditer(p):
            out.append(_neutralize_groups(p[last:m.start()]))
            name, field = m.group(1), m.group(2)
            if name not in lib:
                raise ValueError(f"unknown grok pattern %{{{name}}}")
            body = compile_part(lib[name], depth + 1, None)
            if field and fields is not None:
                fields.append(field)
                out.append(f"({body})")
            else:
                out.append(f"(?:{body})")
            last = m.end()
        out.append(_neutralize_groups(p[last:]))
        return "".join(out)

    fields: list[str] = []
    return compile_part(pattern, 0, fields), fields


def dissect_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile an ES dissect pattern (``%{key}`` split by literal
    separators) to an anchored regex. Keys match lazily up to the next
    literal; the final key is greedy; ``%{}`` skips; ``%{?key}`` matches
    without capturing (dissect's named-skip)."""
    parts = re.split(r"(%\{[^}]*\})", pattern)
    out, fields = ["^"], []
    keys = [p for p in parts if p.startswith("%{")]
    seen = 0
    for p in parts:
        if not p:
            continue
        if p.startswith("%{"):
            seen += 1
            key = p[2:-1]
            greedy = seen == len(keys)
            body = ".*" if greedy else ".*?"
            if key and not key.startswith("?"):
                fields.append(key)
                out.append(f"({body})")
            else:
                out.append(f"(?:{body})")
        else:
            out.append(re.escape(p))
    out.append("$")
    return "".join(out), fields


def _cond(config: dict, then: Column, otherwise: Column) -> Column:
    """Apply the processor-level ``if`` conditional."""
    if "if" not in config:
        return then
    return F.when(F.expr(config["if"]), then).otherwise(otherwise)


_CONVERT_TYPES = {
    "integer": "int", "long": "bigint", "float": "float",
    "double": "double", "string": "string", "boolean": "boolean",
}


_STRUCTURAL = ("rename", "remove")


def apply_processor(df: DataFrame, ptype: str, config: dict) -> DataFrame:
    """One ES ingest processor as a DataFrame transform."""
    fld = config.get("field")
    if ptype in _STRUCTURAL and "if" in config:
        # a per-ROW condition cannot decide whether a COLUMN exists;
        # refuse loudly rather than silently running unconditionally
        raise ValueError(
            f"'if' is not supported on the structural {ptype!r} processor "
            "(a relational schema change cannot vary per row); guard the "
            "pipeline choice outside the processor list instead"
        )

    def setcol(col: Column) -> DataFrame:
        target = config.get("target_field", fld)
        prev = F.col(target) if target in df.columns else F.lit(None)
        return df.withColumn(target, _cond(config, col, prev))

    def set_extracted(out: DataFrame, name: str, col: Column) -> DataFrame:
        """Extraction-processor column assignment honoring ``if``."""
        prev = F.col(name) if name in out.columns else F.lit(None)
        return out.withColumn(name, _cond(config, col, prev))

    if ptype == "set":
        target = config["field"]
        val = (
            F.col(config["copy_from"])
            if "copy_from" in config
            else F.lit(config["value"])
        )
        if not config.get("override", True) and target in df.columns:
            val = F.coalesce(F.col(target), val)
        prev = F.col(target) if target in df.columns else F.lit(None)
        return df.withColumn(target, _cond(config, val, prev))
    if ptype == "rename":
        return df.withColumnRenamed(fld, config["target_field"])
    if ptype == "remove":
        fields = fld if isinstance(fld, list) else [fld]
        return df.drop(*fields)
    if ptype == "trim":
        return setcol(F.trim(F.col(fld)))
    if ptype == "lowercase":
        return setcol(F.lower(F.col(fld)))
    if ptype == "uppercase":
        return setcol(F.upper(F.col(fld)))
    if ptype == "gsub":
        return setcol(
            F.regexp_replace(
                F.col(fld), config["pattern"], config["replacement"]
            )
        )
    if ptype == "split":
        return setcol(F.split(F.col(fld), config["separator"]))
    if ptype == "join":
        return setcol(F.array_join(F.col(fld), config["separator"]))
    if ptype == "convert":
        t = _CONVERT_TYPES[config["type"]]
        return setcol(F.col(fld).try_cast(t))
    if ptype == "date":
        formats = config.get("formats", ["ISO8601"])
        # try_to_timestamp on EVERY branch: under ANSI (Spark 4 default)
        # plain to_timestamp aborts the job on one malformed document,
        # violating the module's NULL-on-failure contract
        tries = [
            F.try_to_timestamp(F.col(fld))
            if f in ("ISO8601", "strict_date_optional_time")
            else F.try_to_timestamp(F.col(fld), F.lit(f))
            for f in formats
        ]
        target = config.get("target_field", "@timestamp")
        prev = F.col(target) if target in df.columns else F.lit(None)
        return df.withColumn(
            target, _cond(config, F.coalesce(*tries), prev)
        )
    if ptype == "json":
        # relational form: surface the listed paths as columns
        out = df
        for name, path in config["fields"].items():
            out = set_extracted(
                out, name, F.get_json_object(F.col(fld), path)
            )
        return out
    if ptype == "kv":
        # separators are user config interpolated into SQL text — apply
        # the same quote-escaping discipline as include_keys below (a
        # quote in a separator must not break the generated expression);
        # len() widths are taken on the RAW value_split, the escaping
        # only protects the SQL string-literal layer
        fs = config["field_split"].replace("\\", "\\\\").replace("'", "\\'")
        vs_raw = config["value_split"]
        vs = vs_raw.replace("\\", "\\\\").replace("'", "\\'")
        prefix = config.get("target_prefix", "")
        # field_split is a regex (ES contract); value_split here is a
        # LITERAL separator of any length — the value starts after the
        # key plus the separator's own width. First occurrence of a
        # repeated key wins (a map would abort on duplicates under
        # Spark's default DUPLICATED_MAP_KEY policy; ES collects dups —
        # the divergence is documented, not a crash).
        entries = (
            f"filter(transform(split({fld}, '{fs}'),"
            f" p -> (split_part(p, '{vs}', 1),"
            f" substr(p, length(split_part(p, '{vs}', 1))"
            f" + {len(vs_raw) + 1}))),"
            " e -> e.col1 <> '')"
        )
        out = df
        for key in config["include_keys"]:
            k = key.replace("\\", "\\\\").replace("'", "\\'")
            out = set_extracted(
                out,
                prefix + key,
                F.expr(
                    f"try_element_at(filter({entries},"
                    f" e -> e.col1 = '{k}'), 1).col2"
                ),
            )
        return out
    if ptype == "csv":
        sep = config.get("separator", ",")
        parts = F.split(F.col(fld), re.escape(sep))
        out = df
        for i, name in enumerate(config["target_fields"]):
            # try_element_at: a ragged line leaves the column NULL
            # instead of aborting under ANSI's INVALID_ARRAY_INDEX
            out = set_extracted(
                out, name, F.try_element_at(parts, F.lit(i + 1))
            )
        return out
    if ptype == "dissect":
        rx, fields = dissect_to_regex(config["pattern"])
        out = df
        for i, name in enumerate(fields, start=1):
            out = set_extracted(
                out,
                name,
                F.nullif(F.regexp_extract(F.col(fld), rx, i), F.lit("")),
            )
        return out
    if ptype == "grok":
        rx, fields = grok_to_regex(
            config["pattern"], config.get("pattern_definitions")
        )
        out = df
        for i, name in enumerate(fields, start=1):
            out = set_extracted(
                out,
                name,
                F.nullif(F.regexp_extract(F.col(fld), rx, i), F.lit("")),
            )
        return out
    if ptype == "script":
        # restricted painless->SQL expression, same contract as the
        # `script` query (plans/compiler.py::_script)
        return df.withColumn(
            config["target_field"],
            _cond(
                config,
                F.expr(config["source"]),
                F.col(config["target_field"])
                if config["target_field"] in df.columns
                else F.lit(None),
            ),
        )
    if ptype == "drop":
        # ES drop discards the doc when `if` holds; with no condition
        # ES drops EVERY document — same here
        if "if" not in config:
            return df.where(F.lit(False))
        return df.where(~F.expr(config["if"]))
    if ptype == "append":
        vals = config["value"]
        if not isinstance(vals, list):
            vals = [vals]
        lits = F.array(*[F.lit(v) for v in vals])
        base = (
            F.coalesce(F.col(fld), F.array().cast("array<string>"))
            if fld in df.columns
            else F.array().cast("array<string>")
        )
        merged = F.concat(base, lits)
        if not config.get("allow_duplicates", True):
            merged = F.array_distinct(merged)
        prev = F.col(fld) if fld in df.columns else F.lit(None)
        return df.withColumn(fld, _cond(config, merged, prev))
    if ptype == "bytes":
        # ES bytes: human size string -> bytes; NULL on malformed (the
        # module's NULL-on-failure contract, vs ES's hard error)
        num = F.regexp_extract(
            F.col(fld), r"(?i)^\s*([0-9.]+)\s*(b|kb|mb|gb|tb|pb)\s*$", 1
        ).try_cast("double")
        unit = F.lower(F.regexp_extract(
            F.col(fld), r"(?i)^\s*([0-9.]+)\s*(b|kb|mb|gb|tb|pb)\s*$", 2
        ))
        mult = (
            F.when(unit == "b", F.lit(1.0))
            .when(unit == "kb", F.lit(1024.0))
            .when(unit == "mb", F.lit(1024.0 ** 2))
            .when(unit == "gb", F.lit(1024.0 ** 3))
            .when(unit == "tb", F.lit(1024.0 ** 4))
            .when(unit == "pb", F.lit(1024.0 ** 5))
        )
        return setcol(F.floor(num * mult).try_cast("bigint"))
    if ptype == "urldecode":
        return setcol(F.call_function("try_url_decode", F.col(fld)))
    if ptype == "html_strip":
        # the pinned subset of Lucene's HTMLStripCharFilter: tags drop,
        # the five standard entities unescape
        stripped = F.regexp_replace(F.col(fld), r"<[^>]*>", "")
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                        ("&#39;", "'"), ("&amp;", "&")):
            stripped = F.regexp_replace(stripped, ent, ch)
        return setcol(stripped)
    if ptype == "fingerprint":
        # ES fingerprint processor: hash over the listed fields' values
        # joined with '|' (the processor's own separator), NULL-safe
        fields = config["fields"]
        method = config.get("method", "SHA-1").upper().replace("-", "")
        joined = F.concat_ws(
            "|", *[F.coalesce(F.col(f).cast("string"), F.lit("")) for f in fields]
        )
        if method == "MD5":
            h = F.md5(joined)
        elif method == "SHA1":
            h = F.sha1(joined)
        elif method in ("SHA256", "SHA512"):
            h = F.sha2(joined, int(method[3:]))
        else:
            raise ValueError(f"unknown fingerprint method {method!r}")
        target = config.get("target_field", "fingerprint")
        prev = F.col(target) if target in df.columns else F.lit(None)
        return df.withColumn(target, _cond(config, h, prev))
    if ptype == "user_agent":
        return _user_agent(df, config)
    if ptype == "geoip":
        # ES geoip with a SUPPLIED ranges DataFrame (config["ranges"]) —
        # see joins.geoip_enrich for the bucketed-range-join scale shape
        from harmonize_search_analyze_spark.operators.joins import (
            geoip_enrich,
        )

        ranges = config["ranges"]
        out = geoip_enrich(
            df, fld, ranges,
            start_col=config.get("start_col", "start_ip"),
            end_col=config.get("end_col", "end_ip"),
        )
        if "if" in config:
            # `if`-skipped rows get no geo attributes (ES skips the
            # processor; the attr columns exist relationally, as NULL)
            for c in out.columns:
                if c not in df.columns:
                    out = out.withColumn(
                        c, _cond(config, F.col(c), F.lit(None))
                    )
        return out
    if ptype == "inference":
        return _inference(df, config)
    raise ValueError(f"unknown ingest processor: {ptype!r}")


# the pinned user_agent ruleset: the high-traffic families of the
# ua-parser corpus, matched in THIS order (Edge/Opera carry "Chrome" in
# their UA string, so they must test first; same for Chrome vs Safari)
_UA_BROWSERS = [
    ("Edge", r"Edg(?:e|A|iOS)?/([0-9.]+)"),
    ("Opera", r"OPR/([0-9.]+)"),
    ("Chrome", r"Chrome/([0-9.]+)"),
    ("Firefox", r"Firefox/([0-9.]+)"),
    ("Safari", r"Version/([0-9.]+).*Safari"),
]
_UA_OS = [
    ("Windows", r"Windows NT"),
    ("iOS", r"iPhone|iPad"),
    ("Mac OS X", r"Mac OS X"),
    ("Android", r"Android"),
    ("Linux", r"Linux"),
]


def _user_agent(df: DataFrame, config: dict) -> DataFrame:
    """ES ``user_agent`` processor (pinned subset of the ua-parser
    ruleset, families above): relational output columns
    ``<target>_name/_version/_os/_device`` instead of ES's object field.
    Pure regexp projections — order is load-bearing (Edge before
    Chrome, Chrome before Safari)."""
    fld = config["field"]
    target = config.get("target_field", "user_agent")
    ua = F.col(fld)
    name = F.lit("Other")
    version = F.lit(None).cast("string")
    for fam, pat in reversed(_UA_BROWSERS):
        hit = ua.rlike(pat.replace("([0-9.]+)", "[0-9.]+"))
        name = F.when(hit, F.lit(fam)).otherwise(name)
        version = F.when(
            hit, F.regexp_extract(ua, pat, 1)
        ).otherwise(version)
    os_col = F.lit("Other")
    for fam, pat in reversed(_UA_OS):
        os_col = F.when(ua.rlike(pat), F.lit(fam)).otherwise(os_col)
    device = F.when(
        ua.rlike(r"Mobile|iPhone|Android"), F.lit("Mobile")
    ).otherwise(F.lit("Desktop"))
    out = df
    for suffix, col in (
        ("name", name), ("version", version),
        ("os", os_col), ("device", device),
    ):
        cname = f"{target}_{suffix}"
        prev = F.col(cname) if cname in out.columns else F.lit(None)
        out = out.withColumn(cname, _cond(config, col, prev))
    return out


def _inference(df: DataFrame, config: dict) -> DataFrame:
    """ES ``inference`` processor: apply a TRAINED linear-family model to
    document fields and write the prediction — the portable subset of
    ES's trained-model wire format (a linear/logistic model is fully
    specified by its coefficient map; tree ensembles need the model
    artifact and are out of scope, use ``nb_quality_classifier`` /
    ``nb_score`` for the in-engine trained path).

    Config::

        {"model": {"type": "logistic_regression" | "linear_regression",
                   "coefficients": {field: weight, ...},
                   "intercept": b,
                   "classification_labels": [neg, pos],   # logistic only
                   "threshold": 0.5},                     # logistic only
         "target_field": "ml_inference"}                  # default

    Writes ``<target>`` (DOUBLE prediction: raw value for linear,
    probability for logistic) and, when ``classification_labels`` are
    given, ``<target>_label``. NULL feature values contribute 0 (ES's
    missing-field behavior for regression feature maps); the whole thing
    is one codegen'd column expression — map-only at any scale.
    """
    model = config.get("model") or {}
    mtype = model.get("type")
    if mtype not in ("logistic_regression", "linear_regression"):
        raise ValueError(
            f"inference model type must be logistic_regression or "
            f"linear_regression, got {mtype!r}"
        )
    coeffs = model.get("coefficients") or {}
    if not coeffs:
        raise ValueError("inference model needs a non-empty coefficients map")
    target = config.get("target_field", "ml_inference")
    # `if`-skipped rows keep the PRE-EXISTING target value (ES skips the
    # processor, leaving the document unchanged — same contract as every
    # other value processor here), not a NULL overwrite
    prev = (
        F.col(target).cast("double")
        if target in df.columns
        else F.lit(None).cast("double")
    )
    score = F.lit(float(model.get("intercept", 0.0)))
    for field, w in coeffs.items():
        score = score + F.lit(float(w)) * F.coalesce(
            F.col(field).cast("double"), F.lit(0.0)
        )
    if mtype == "logistic_regression":
        prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
        out = df.withColumn(target, _cond(config, prob, prev))
        labels = model.get("classification_labels")
        if labels:
            if len(labels) != 2:
                raise ValueError(
                    "classification_labels must be [negative, positive]"
                )
            thr = float(model.get("threshold", 0.5))
            # label follows the target's value: an `if`-skipped row keeps
            # its pre-existing probability (NULL when there was none, so
            # both whens miss -> NULL label)
            out = out.withColumn(
                f"{target}_label",
                F.when(F.col(target) >= F.lit(thr), F.lit(labels[1]))
                .when(F.col(target) < F.lit(thr), F.lit(labels[0])),
            )
        return out
    return df.withColumn(target, _cond(config, score, prev))


def run_pipeline(df: DataFrame, processors: list[dict]) -> DataFrame:
    """Run an ES-style ingest pipeline definition (ordered processor
    list, each ``{type: {config}}``) over a DataFrame."""
    out = df
    for proc in processors:
        if len(proc) != 1:
            raise ValueError(
                "each processor must be a single {type: config} entry"
            )
        (ptype, config), = proc.items()
        out = apply_processor(out, ptype, config)
    return out
