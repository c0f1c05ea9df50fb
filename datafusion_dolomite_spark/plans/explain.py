"""Deterministic plan pretty-printer.

Replicates the reference's ``ptree``-style output
(``dolomite/src/plan/explain.rs:25-42``, golden strings at
``explain.rs:52-94``), e.g.::

    LogicalLimit { limit: 5 }
    └── LogicalScan { table_name: "t1" }

Golden-plan tests (the YAML corpus ported from
``datafusion-dolomite-integration/resources/limit.yaml``) compare these
strings exactly, so formatting must stay stable.
"""

from __future__ import annotations

from .plan import Plan, PlanNode

__all__ = ["explain_to_string"]


def explain_to_string(plan: Plan) -> str:
    lines: list[str] = []
    _walk(plan.root, "", "", lines)
    return "\n".join(lines)


def _walk(node: PlanNode, self_prefix: str, child_prefix: str, lines: list[str]) -> None:
    lines.append(self_prefix + node.operator.pretty())
    n = len(node.inputs)
    for i, child in enumerate(node.inputs):
        last = i == n - 1
        connector = "└── " if last else "├── "
        extension = "    " if last else "│   "
        _walk(child, child_prefix + connector, child_prefix + extension, lines)
