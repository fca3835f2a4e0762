"""Elasticsearch/Kibana date-math parser.

The reference's global time filter is written in exactly this language:
``services/webapp/src/config.js:31-32`` ships ``from: "now-20y", to: "now"``,
and every Kibana time-picker emits the same grammar. Round 1 accepted only
epoch-millis bounds; this closes SURVEY Q8 end-to-end.

Grammar (public ES reference, "Date Math"):

    expr      := anchor op*
    anchor    := "now" | isodate "||"
    op        := ("+" | "-") number unit     (add/subtract)
               | "/" unit                    (round down to start of unit)
    unit      := y | M | w | d | h | H | m | s

Rounding in a range's *upper* bound rounds UP (``lte: now/d`` means "end of
today, 23:59:59.999") — pass ``round_up=True`` from lte/lt contexts, exactly
what ES does based on the range operator.

Pure Python, no deps; calendar-aware month/year arithmetic (clamps day to
month length, like ES/Joda).
"""

from __future__ import annotations

import calendar
import datetime as _dt
import re

_OP_RE = re.compile(r"([+\-/])(\d*)([yMwdhHms])")

# timedelta-expressible units; y/M need calendar math
_FIXED = {
    "w": _dt.timedelta(weeks=1),
    "d": _dt.timedelta(days=1),
    "h": _dt.timedelta(hours=1),
    "H": _dt.timedelta(hours=1),
    "m": _dt.timedelta(minutes=1),
    "s": _dt.timedelta(seconds=1),
}


class DateMathError(ValueError):
    pass


def _add_months(t: _dt.datetime, n: int) -> _dt.datetime:
    month0 = t.year * 12 + (t.month - 1) + n
    year, month = divmod(month0, 12)
    month += 1
    day = min(t.day, calendar.monthrange(year, month)[1])
    return t.replace(year=year, month=month, day=day)


def _shift(t: _dt.datetime, n: int, unit: str) -> _dt.datetime:
    if unit == "y":
        return _add_months(t, 12 * n)
    if unit == "M":
        return _add_months(t, n)
    return t + n * _FIXED[unit]


def _floor(t: _dt.datetime, unit: str) -> _dt.datetime:
    if unit == "y":
        return t.replace(month=1, day=1, hour=0, minute=0, second=0,
                         microsecond=0)
    if unit == "M":
        return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "w":
        # ES rounds to the start of the week, Monday (ISO)
        start = t - _dt.timedelta(days=t.weekday())
        return start.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit in ("d",):
        return t.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit in ("h", "H"):
        return t.replace(minute=0, second=0, microsecond=0)
    if unit == "m":
        return t.replace(second=0, microsecond=0)
    if unit == "s":
        return t.replace(microsecond=0)
    raise DateMathError(f"unknown rounding unit: {unit}")


def _ceil(t: _dt.datetime, unit: str) -> _dt.datetime:
    """ES upper-bound rounding: end of the unit, millisecond-exclusive
    (start of next unit minus 1ms — ES date resolution is millis)."""
    floored = _floor(t, unit)
    return _shift(floored, 1, unit) - _dt.timedelta(milliseconds=1)


def parse_date_math(
    expr: str,
    *,
    now: _dt.datetime | None = None,
    round_up: bool = False,
) -> _dt.datetime:
    """Evaluate an ES date-math expression to a naive-UTC datetime.

    ``now`` anchors the evaluation (defaults to current UTC — inject a fixed
    value anywhere determinism matters: tests, oracles, reproducible runs).
    ``round_up`` selects upper-bound rounding semantics for ``/unit``.
    """
    if now is None:
        now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    elif now.tzinfo is not None:
        now = now.astimezone(_dt.timezone.utc).replace(tzinfo=None)

    def _iso(anchor: str) -> _dt.datetime:
        try:
            t = _dt.datetime.fromisoformat(anchor)
        except ValueError as e:
            raise DateMathError(f"bad date-math anchor: {expr!r}") from e
        if t.tzinfo is not None:
            t = t.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return t

    expr = expr.strip()
    if expr.startswith("now"):
        t, rest = now, expr[3:]
    else:
        anchor, sep, rest = expr.partition("||")
        if not sep:
            return _iso(anchor)     # plain ISO date(time) string, no math
        t = _iso(anchor)

    pos = 0
    for m in _OP_RE.finditer(rest):
        if m.start() != pos:
            raise DateMathError(f"bad date-math op at {rest[pos:]!r} in {expr!r}")
        pos = m.end()
        op, num, unit = m.groups()
        if op == "/":
            if num:
                raise DateMathError(f"rounding takes no number: {expr!r}")
            t = _ceil(t, unit) if round_up else _floor(t, unit)
        else:
            if not num:
                raise DateMathError(f"missing count in {expr!r}")
            t = _shift(t, int(num) if op == "+" else -int(num), unit)
    if pos != len(rest):
        raise DateMathError(f"trailing garbage {rest[pos:]!r} in {expr!r}")
    return t


def is_date_math(v) -> bool:
    """Does this range-bound value need date-math evaluation?"""
    return isinstance(v, str) and (v.strip().startswith("now") or "||" in v)
