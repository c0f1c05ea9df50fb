"""The three limit rewrite rules (ref ``dolomite/src/rules/limit.rs``).

* ``PushLimitOverProjectionRule`` — ``Limit(Projection(x)) →
  Projection(Limit(x))`` (``limit.rs:33-71``); Catalyst analog
  ``LimitPushDown``.
* ``RemoveLimitRule`` — ``Limit(a, Limit(b, x)) → Limit(min(a,b), x)``
  (``limit.rs:73-115``); Catalyst ``CombineLimits``.
* ``PushLimitToTableScanRule`` — ``Limit(n, Scan(t, l?)) →
  Scan(t, min(n, l))`` (``limit.rs:117-165``); DSv2
  ``SupportsPushDownLimit``.  At scale this is the difference between
  reading 100 TB and reading a few row groups.
"""

from __future__ import annotations

from dataclasses import replace

from ...operators.logical import (
    LogicalLimit,
    LogicalProjection,
    LogicalScan,
    LogicalUnion,
)
from ..pattern import Pattern, pattern_of
from ..rule import OptExpression, OptimizerContext, Rule, RulePromise, RuleResult
from ..utils import PatternBuilder

__all__ = [
    "PushLimitOverProjectionRule",
    "RemoveLimitRule",
    "PushLimitToTableScanRule",
    "PushLimitThroughUnionRule",
]


class PushLimitOverProjectionRule(Rule):
    name = "PushLimitOverProjectionRule"

    def pattern(self) -> Pattern:
        # Limit over Projection (ref limit.rs:21-25), built with the
        # TreeBuilder port (utils.rs:1-97)
        return PatternBuilder(LogicalLimit).leaf(LogicalProjection).end()

    def promise(self) -> RulePromise:
        return RulePromise.MEDIUM

    def apply(self, input: OptExpression, ctx: OptimizerContext, result: RuleResult) -> None:
        limit_node = input.root
        proj_node = limit_node.inputs[0]
        below = proj_node.inputs[0]  # handle
        result.add(
            OptExpression.op(
                proj_node.operator,
                OptExpression.op(limit_node.operator, below),
            )
        )


class RemoveLimitRule(Rule):
    name = "RemoveLimitRule"

    def pattern(self) -> Pattern:
        # Limit over Limit (ref limit.rs:16-20)
        return PatternBuilder(LogicalLimit).leaf(LogicalLimit).end()

    def promise(self) -> RulePromise:
        return RulePromise.HIGH

    def apply(self, input: OptExpression, ctx: OptimizerContext, result: RuleResult) -> None:
        outer = input.root.operator
        inner = input.root.inputs[0].operator
        if getattr(outer, "offset", 0) or getattr(inner, "offset", 0):
            return  # offsets don't compose by min(); leave both
        below = input.root.inputs[0].inputs[0]
        merged = LogicalLimit(min(outer.limit, inner.limit))
        result.add(OptExpression.op(merged, below))


class PushLimitToTableScanRule(Rule):
    name = "PushLimitToTableScanRule"

    def pattern(self) -> Pattern:
        # Limit over Scan (ref limit.rs:26-30)
        return PatternBuilder(LogicalLimit).leaf(LogicalScan).end()

    def promise(self) -> RulePromise:
        return RulePromise.HIGH

    def apply(self, input: OptExpression, ctx: OptimizerContext, result: RuleResult) -> None:
        limit_op = input.root.operator
        if getattr(limit_op, "offset", 0):
            return  # scans can't skip rows; keep the Limit node
        scan_op = input.root.inputs[0].operator
        new_limit = (
            min(limit_op.limit, scan_op.limit)
            if scan_op.limit is not None
            else limit_op.limit
        )
        result.add(OptExpression.op(replace(scan_op, limit=new_limit)))


class PushLimitThroughUnionRule(Rule):
    """``Limit(n, Union(c...)) → Limit(n, Union(Limit(n, c)...))`` —
    each branch produces at most n rows BEFORE the union, so at scale
    every input reads a few row groups instead of its whole table
    (Catalyst ``LimitPushDown`` through Union; absent in the reference).

    Only fires while some branch lacks a ≤ n limit (heuristic rewrite
    rules must reach a fixed point)."""

    name = "PushLimitThroughUnionRule"

    def pattern(self) -> Pattern:
        return pattern_of(LogicalLimit, children=(pattern_of(LogicalUnion),))

    def promise(self) -> RulePromise:
        return RulePromise.MEDIUM

    def apply(self, input: OptExpression, ctx: OptimizerContext, result: RuleResult) -> None:
        if getattr(input.root.operator, "offset", 0):
            return  # branches may not skip rows; the offset is global
        n = input.root.operator.limit
        union_node = input.root.inputs[0]

        def _limited(handle_node) -> bool:
            node = handle_node.handle
            op = getattr(node, "operator", None)
            if isinstance(op, LogicalLimit) and op.limit <= n:
                return True
            # a scan the limit already fused into counts too — else this
            # rule re-wraps it forever and the pass never reaches fixpoint
            return (
                isinstance(op, LogicalScan)
                and op.limit is not None
                and op.limit <= n
            )

        if all(_limited(c) for c in union_node.inputs):
            return  # fixed point
        new_children = [
            OptExpression.handle(c.handle)
            if _limited(c)
            else OptExpression.op(LogicalLimit(n), c)
            for c in union_node.inputs
        ]
        result.add(
            OptExpression.op(
                LogicalLimit(n),
                OptExpression.op(union_node.operator, *new_children),
            )
        )
