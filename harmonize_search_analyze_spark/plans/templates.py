"""ES search templates: a mustache-subset renderer over the query DSL.

Reference parity: the reference app's saved searches are static Kibana
panels (``webapp/``); Elasticsearch itself exposes the same DSL through
``PUT _scripts/<id>`` (lang=mustache) + ``GET _search/template`` /
``_render/template``.  This module implements the subset of mustache that
ES search templates actually exercise:

- ``{{var}}``                 — scalar substitution (JSON-escaped text,
                                numbers/bools rendered as JSON scalars)
- ``{{#toJson}}var{{/toJson}}`` — full JSON encoding (arrays/objects)
- ``{{#var}}...{{/var}}``     — section: rendered iff ``var`` is truthy
- ``{{^var}}...{{/var}}``     — inverted section: rendered iff falsy/absent
- ``{{var}}{{^var}}default{{/var}}`` — the ES-documented default idiom
                                falls out of the two rules above

Rendering happens entirely on the driver over a handful of bytes; the
rendered JSON feeds the one shared predicate compiler
(:func:`..plans.compiler.compile_query`), so template queries cost
exactly what their expanded DSL costs — nothing template-specific ever
reaches the executors.
"""

from __future__ import annotations

import json
import re
from typing import Any

__all__ = ["TemplateError", "render_template", "ScriptStore"]


class TemplateError(ValueError):
    pass


_SECTION = re.compile(
    r"\{\{([#^])\s*([\w.]+)\s*\}\}(.*?)\{\{/\s*\2\s*\}\}", re.S
)
_VAR = re.compile(r"\{\{\s*([\w.]+)\s*\}\}")


def _lookup(params: dict[str, Any], path: str) -> Any:
    cur: Any = params
    for seg in path.split("."):
        if not isinstance(cur, dict) or seg not in cur:
            return None
        cur = cur[seg]
    return cur


def _scalar(value: Any) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return json.dumps(value)
    # text goes inside a JSON string in the template source — escape the
    # content but leave the template's own quotes in charge
    return json.dumps(str(value))[1:-1]


def _render(source: str, params: dict[str, Any]) -> str:
    def section(m: re.Match[str]) -> str:
        kind, name, body = m.group(1), m.group(2), m.group(3)
        if name == "toJson":
            if kind == "^":
                raise TemplateError("{{^toJson}} is not a section")
            val = _lookup(params, body.strip())
            return json.dumps(val, sort_keys=True)
        val = _lookup(params, name)
        truthy = bool(val) and val != []
        if (kind == "#") == truthy:
            return _render(body, params)
        return ""

    out = _SECTION.sub(section, source)

    def var(m: re.Match[str]) -> str:
        return _scalar(_lookup(params, m.group(1)))

    return _VAR.sub(var, out)


def render_template(source: str, params: dict[str, Any] | None = None) -> Any:
    """Render a mustache-subset search template to its query body (the
    ``_render/template`` API): substitute ``params``, then parse the
    result as JSON."""
    rendered = _render(source, params or {})
    try:
        return json.loads(rendered)
    except json.JSONDecodeError as exc:
        raise TemplateError(
            f"template did not render to valid JSON: {exc}; "
            f"rendered source: {rendered[:500]!r}"
        ) from exc


class ScriptStore:
    """``PUT _scripts/<id>`` + ``GET _search/template {id, params}``: a
    driver-side store of named mustache sources."""

    def __init__(self) -> None:
        self._scripts: dict[str, str] = {}

    def put(self, script_id: str, source: str) -> None:
        if not script_id:
            raise TemplateError("script id must be non-empty")
        self._scripts[script_id] = source

    def get(self, script_id: str) -> str:
        if script_id not in self._scripts:
            raise TemplateError(f"unknown stored template {script_id!r}")
        return self._scripts[script_id]

    def delete(self, script_id: str) -> None:
        self._scripts.pop(script_id, None)

    def render(self, script_id: str, params: dict[str, Any] | None = None) -> Any:
        return render_template(self.get(script_id), params)
