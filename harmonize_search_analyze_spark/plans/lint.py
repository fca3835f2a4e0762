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

- ``cartesian``      a physical CartesianProduct with no limit-bounded
                     side — genuine all-pairs over two large inputs.
                     Hard rule: only declared row-capped oracles may
                     do it. A cartesian whose side subtrees carry
                     GlobalLimit/TakeOrdered (k-candidate combination
                     frames) downgrades to ``cartesian_small``.
- ``cross_broadcast``
                     (warning class) a condition-less join where no
                     side has PROVABLE maxRows <= ``small_rows`` but
                     the planner broadcast one side anyway — bounded
                     by construction at THIS data size (centroid/query
                     frames), worth re-checking at 100 TB. A scalar-
                     aggregate bounds frame (maxRows=1) stays silent.
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

    # -- physical plan text (post-AQE once executed) -----------------------
    phys = qe.executedPlan()
    text = phys.toString().split("== Initial Plan ==")[0]

    # hard rule: a physical CartesianProduct with NO limit-bounded side
    # means genuine all-pairs work over two large inputs. A cartesian
    # whose side subtrees carry GlobalLimit/TakeOrdered (phrase-suggest
    # style k-candidate combination frames) is bounded by construction
    # and downgrades to the warning class.
    _LIMIT_NODES = ("GlobalLimit", "TakeOrderedAndProject", "CollectLimit")

    def _side_bounded(node) -> bool:
        for sub in _walk(node):
            nm = sub.nodeName()
            if any(ln in nm for ln in _LIMIT_NODES):
                return True
            if "Join" in nm or "Cartesian" in nm:
                # stop at the next join boundary — bounds beyond it
                # belong to that join's own analysis
                return False
        return False

    cart_nodes = [
        n for n in _walk(phys) if "CartesianProduct" in n.nodeName()
    ]
    hard = False
    for n in cart_nodes:
        ch = n.children()
        sides = [
            _side_bounded(ch.apply(i)) for i in range(ch.length())
        ]
        if not any(sides):
            hard = True
            break
    if cart_nodes and hard:
        findings.append((
            "cartesian",
            "CartesianProduct in plan — all-pairs over two large "
            "sides; only declared row-capped oracles may do this",
        ))
    elif cart_nodes:
        findings.append((
            "cartesian_small",
            "CartesianProduct over limit-bounded sides (k-candidate "
            "combination frames) — bounded by construction",
        ))
    else:
        # warning class: condition-less joins whose smallness is only
        # the planner's ESTIMATE (broadcast), not a provable maxRows
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
                    "cross_broadcast",
                    "condition-less join with no PROVABLY-small side "
                    "(broadcast is the planner's size estimate) — "
                    "bounded here, re-check the bound at scale",
                ))
                break
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
