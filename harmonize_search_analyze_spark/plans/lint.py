"""Physical-plan linter — the repo's 100 TB performance discipline as
a checkable tool.

Every scale rule this engine follows (no cartesian products outside
declared oracles, no row-at-a-time Python, no whole-frame windows over
row-sized data, projections reaching the scan) is enforced today by
convention + plan-shape tests. ``lint_plan`` turns the convention into
a function: given any DataFrame it inspects the optimized logical plan
AND the executed physical plan and returns typed findings, so
pipelines can gate themselves (``assert not lint_plan(df)``) and tests
can assert an anti-pattern is present or absent without hand-grepping
plan strings.

Checks (each with the rule it encodes):

- ``cartesian``      a logical cross/condition-less join where NEITHER
                     side is provably small (``maxRows`` unknown or
                     above ``small_rows``) — all-pairs work. A scalar-
                     aggregate bounds frame broadcast back (the
                     engine's standard (min,max) pattern, maxRows=1)
                     does NOT trip this.
- ``python_eval``    BatchEvalPython (row-at-a-time Python UDF) in the
                     physical plan; Arrow stages (ArrowEvalPython,
                     MapInPandas, ...) are allowed and NOT flagged.
- ``global_window``  a Window with an EMPTY partition spec — every row
                     moves to ONE task; fine for bucket-sized frames,
                     fatal for row-sized ones (warning-class: the
                     caller knows which).
- ``wide_scan``      a file scan whose OUTPUT carries more than
                     ``wide_scan_cols`` columns — usually a missing
                     projection (column pruning didn't reach the scan).
- ``many_shuffles``  more than ``max_exchanges`` Exchange operators —
                     a smell, not proof; re-examine partitioning reuse.

Findings are (code, detail) tuples; the caller decides severity.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _walk(node):
    yield node
    children = node.children()
    for i in range(children.length()):
        yield from _walk(children.apply(i))


def _max_rows(node) -> int | None:
    try:
        opt = node.maxRows()
        if opt.isDefined():
            return int(opt.get())
    except Exception:
        pass
    return None


def lint_plan(
    df: DataFrame,
    *,
    wide_scan_cols: int = 24,
    max_exchanges: int = 8,
    small_rows: int = 1000,
) -> list[tuple[str, str]]:
    """Lint the DataFrame's plans. Returns [] when clean."""
    findings: list[tuple[str, str]] = []
    qe = df._jdf.queryExecution()

    # -- logical: cross joins with two possibly-large sides ---------------
    for node in _walk(qe.optimizedPlan()):
        if node.nodeName() != "Join":
            continue
        try:
            jt = str(node.joinType().sql()).upper()
            has_cond = node.condition().isDefined()
        except Exception:
            continue
        if has_cond or "CROSS" not in jt and "INNER" not in jt:
            continue
        sides = []
        ch = node.children()
        for i in range(ch.length()):
            mr = _max_rows(ch.apply(i))
            sides.append(mr is not None and mr <= small_rows)
        if not any(sides):
            findings.append((
                "cartesian",
                "condition-less join where neither side is provably "
                f"small (<= {small_rows} rows) — all-pairs work; only "
                "declared row-capped oracles may do this",
            ))

    # -- physical checks ---------------------------------------------------
    phys = qe.executedPlan()
    text = phys.toString().split("== Initial Plan ==")[0]
    if "BatchEvalPython" in text:
        findings.append((
            "python_eval",
            "row-at-a-time Python UDF (BatchEvalPython) — use built-in "
            "expressions or an Arrow pandas UDF",
        ))
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", text):
        head = m.group(1).split(",")[0].strip()
        if " ASC" in head or " DESC" in head or head.startswith(
            "specifiedwindowframe"
        ):
            findings.append((
                "global_window",
                "window with empty PARTITION BY — all rows to one task; "
                "acceptable only on bucket-sized frames",
            ))
            break
    for node in _walk(phys):
        name = node.nodeName()
        if "Scan" in name and "parquet" in node.toString()[:2000].lower():
            ncols = node.output().length()
            if ncols > wide_scan_cols:
                findings.append((
                    "wide_scan",
                    f"{name} reads {ncols} columns — is the projection "
                    "reaching the scan?",
                ))
    n_ex = len(re.findall(r"\bExchange\b", text))
    if n_ex > max_exchanges:
        findings.append((
            "many_shuffles",
            f"{n_ex} Exchange operators (> {max_exchanges}) — check "
            "partitioning reuse across stages",
        ))
    return findings
