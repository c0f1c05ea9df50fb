"""Heuristic (rule-based, fixed-point) optimizer.

Reference: ``dolomite/src/heuristic/*`` — ``HepOptimizer`` iterates the
plan nodes in match order (TopDown = BFS, BottomUp = reverse BFS,
``heuristic/graph.rs:35-69``), tries each rule, and on any change restarts
the scan; stops at fixed point or ``max_iter_times``
(``heuristic/optimizer.rs:50-93``).  A rewrite rule must produce at most
one result (``optimizer.rs:129-134``).  Binding is single (no cartesian
product, ``heuristic/binding.rs:24-66``).  Logical properties are derived
eagerly on insert (``optimizer.rs:209-212``).

This is the same shape as Catalyst's ``RuleExecutor`` with a fixed-point
batch — reimplemented in Python because Catalyst rules cannot be written
from PySpark (SURVEY §7 risk register).
"""

from __future__ import annotations

import enum
from typing import List, Optional, Sequence

from ..operators.logical import LogicalScan
from ..plans.plan import Plan, PlanNode
from .pattern import Pattern
from .rule import OptExpression, OptExprNode, OptimizerContext, Rule, RuleResult

__all__ = ["MatchOrder", "HepOptimizer"]


class MatchOrder(enum.Enum):
    TOP_DOWN = "top_down"
    BOTTOM_UP = "bottom_up"


class HepOptimizer:
    def __init__(
        self,
        rules: Sequence[Rule],
        ctx: Optional[OptimizerContext] = None,
        match_order: MatchOrder = MatchOrder.TOP_DOWN,
        max_iter_times: int = 1000,
    ):
        self.rules = list(rules)
        self.ctx = ctx or OptimizerContext()
        self.match_order = match_order
        self.max_iter_times = max_iter_times

    # ------------------------------------------------------------------
    def find_best_plan(self, plan: Plan) -> Plan:
        self._derive_props(plan)
        for _ in range(self.max_iter_times):
            changed = self._one_pass(plan)
            if not changed:
                break  # fixed point (ref optimizer.rs:50-93)
        return plan

    optimize = find_best_plan

    # ------------------------------------------------------------------
    def _nodes_in_match_order(self, plan: Plan) -> List[PlanNode]:
        nodes = list(plan.bfs_iterator())
        if self.match_order is MatchOrder.BOTTOM_UP:
            nodes.reverse()
        return nodes

    def _one_pass(self, plan: Plan) -> bool:
        for node in self._nodes_in_match_order(plan):
            for rule in self.rules:
                if self._apply_rule(plan, node, rule):
                    # restart scan on any change (ref optimizer.rs:70-82)
                    return True
        return False

    def _apply_rule(self, plan: Plan, node: PlanNode, rule: Rule) -> bool:
        binding = _bind(rule.pattern(), node)
        if binding is None:
            return False
        result = RuleResult()
        rule.apply(binding, self.ctx, result)
        if not result.exprs:
            return False
        if len(result.exprs) > 1:
            raise ValueError(
                f"rewrite rule {rule.name} produced {len(result.exprs)} results; "
                "heuristic rules must return at most 1 (ref optimizer.rs:129-134)"
            )
        new_node = self._materialize(result.exprs[0].root)
        if new_node.semantic_eq(node):
            return False  # no-op rewrite; don't loop forever
        self._replace(plan, node, new_node)
        return True

    # ------------------------------------------------------------------
    def _materialize(self, n: OptExprNode) -> PlanNode:
        """OptExpression → PlanNode tree; handles are existing PlanNodes
        (ref optimizer.rs:149-175 'insert new node subtree')."""
        if n.is_handle:
            if not isinstance(n.handle, PlanNode):
                raise TypeError(f"heuristic handle must be PlanNode, got {n.handle!r}")
            return n.handle
        node = PlanNode(n.operator, [self._materialize(c) for c in n.inputs])
        self._derive_node_prop(node)
        return node

    def _replace(self, plan: Plan, old: PlanNode, new: PlanNode) -> None:
        if plan.root is old:
            plan.root = new
            return
        for node in plan.bfs_iterator():
            for i, c in enumerate(node.inputs):
                if c is old:
                    node.inputs[i] = new

    # ------------------------------------------------------------------
    def _derive_props(self, plan: Plan) -> None:
        for node in plan.nodes_bottom_up():
            self._derive_node_prop(node)

    def _derive_node_prop(self, node: PlanNode) -> None:
        """Eager logical-property derivation (ref optimizer.rs:209-212)."""
        op = node.operator
        input_props = tuple(c.logical_prop for c in node.inputs)
        if any(p is None for p in input_props):
            return
        try:
            if isinstance(op, LogicalScan):
                if self.ctx.catalog is None:
                    return
                node.logical_prop = op.derive_logical_prop(
                    input_props, catalog=self.ctx.catalog
                )
            elif hasattr(op, "derive_logical_prop"):
                node.logical_prop = op.derive_logical_prop(input_props)
        except KeyError:
            node.logical_prop = None


def _bind(pattern: Pattern, node: PlanNode) -> Optional[OptExpression]:
    """Single binding of pattern against the plan (ref
    ``heuristic/binding.rs:24-66``).  Returns an OptExpression whose
    matched interior nodes carry their operators and whose leaves (where
    the pattern stops) are handles to the underlying PlanNodes."""
    root = _bind_node(pattern, node)
    return OptExpression(root) if root is not None else None


def _bind_node(pattern: Pattern, node: PlanNode) -> Optional[OptExprNode]:
    if not pattern.matches_operator(node.operator):
        return None
    if pattern.children is None:
        # wildcard leaf: children become opaque handles
        return OptExprNode(
            operator=node.operator,
            inputs=[OptExprNode(handle=c) for c in node.inputs],
        )
    if len(pattern.children) != len(node.inputs):
        return None
    bound_children = []
    for cp, cn in zip(pattern.children, node.inputs):
        b = _bind_node(cp, cn)
        if b is None:
            return None
        bound_children.append(b)
    return OptExprNode(operator=node.operator, inputs=bound_children)
