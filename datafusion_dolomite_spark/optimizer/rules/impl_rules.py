"""Implementation rules: logical → physical, one per operator.

The reference has exactly two (``Scan2TableScanRule``,
``rules/table_scan.rs:1-57``; ``Join2HashJoinRule`` in ``rules/join.rs``)
— cascades there literally cannot implement a plan containing Filter,
Projection or Limit.  SURVEY §2.2/§7 flags this as a gap NOT to copy, so
every logical operator here has an implementation rule, including the
extension operators (aggregate/sort/distinct/union) and the fused
Sort+Limit → TopK strategy.
"""

from __future__ import annotations

from ...operators import logical as L
from ...operators import physical as P
from ..pattern import Pattern, pattern_of
from ..rule import OptExpression, OptimizerContext, Rule, RulePromise, RuleResult

__all__ = [
    "Scan2TableScanRule",
    "Values2ValuesRule",
    "Filter2FilterRule",
    "Projection2ProjectionRule",
    "Limit2LimitRule",
    "Aggregate2HashAggregateRule",
    "Sort2SortRule",
    "SortLimit2TopKRule",
    "Distinct2DistinctRule",
    "Window2WindowRule",
    "Union2UnionRule",
    "Intersect2IntersectRule",
    "Except2ExceptRule",
    "IMPLEMENTATION_RULES",
]


class Scan2TableScanRule(Rule):
    """Ref ``rules/table_scan.rs:20-57``."""

    name = "Scan2TableScanRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalScan)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: L.LogicalScan = input.root.operator
        result.add(
            OptExpression.op(
                P.PhysicalTableScan(op.table_name, op.limit, op.filters, op.columns)
            )
        )


class Values2ValuesRule(Rule):
    """LogicalValues -> PhysicalValues (LocalRelation); leaf like
    Scan2TableScanRule above."""

    name = "Values2ValuesRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalValues)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: L.LogicalValues = input.root.operator
        result.add(
            OptExpression.op(P.PhysicalValues(op.rows, op.names, op.dtypes))
        )


class Filter2FilterRule(Rule):
    name = "Filter2FilterRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalFilter)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: L.LogicalFilter = input.root.operator
        result.add(
            OptExpression.op(
                P.PhysicalFilter(op.predicate, op.projected_columns),
                *input.root.inputs,
            )
        )


class Projection2ProjectionRule(Rule):
    name = "Projection2ProjectionRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalProjection)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: L.LogicalProjection = input.root.operator
        result.add(OptExpression.op(P.PhysicalProjection(op.exprs), *input.root.inputs))


class Limit2LimitRule(Rule):
    """The physical Limit the reference lacks (SURVEY §2.2)."""

    name = "Limit2LimitRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalLimit)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: L.LogicalLimit = input.root.operator
        result.add(
            OptExpression.op(P.PhysicalLimit(op.limit, op.offset), *input.root.inputs)
        )


class Aggregate2HashAggregateRule(Rule):
    name = "Aggregate2HashAggregateRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalAggregate)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: L.LogicalAggregate = input.root.operator
        result.add(
            OptExpression.op(
                P.PhysicalHashAggregate(
                    op.group_exprs, op.agg_exprs, op.mode, op.grouping_sets
                ),
                *input.root.inputs,
            )
        )


class Sort2SortRule(Rule):
    name = "Sort2SortRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalSort)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: L.LogicalSort = input.root.operator
        result.add(OptExpression.op(P.PhysicalSort(op.keys), *input.root.inputs))


class SortLimit2TopKRule(Rule):
    """Limit(Sort(x)) → TopK(x): per-partition heap + driver merge
    (Spark ``TakeOrderedAndProject``) instead of a global sort shuffle.
    The plan to pick when the input is 100 TB and k is small."""

    name = "SortLimit2TopKRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalLimit, children=(pattern_of(L.LogicalSort),))

    def promise(self) -> RulePromise:
        return RulePromise.HIGH

    def apply(self, input, ctx, result: RuleResult) -> None:
        limit_op: L.LogicalLimit = input.root.operator
        if getattr(limit_op, "offset", 0):
            return  # TopK keeps the first k — wrong rows under OFFSET
        sort_node = input.root.inputs[0]
        sort_op: L.LogicalSort = sort_node.operator
        result.add(
            OptExpression.op(
                P.PhysicalTopK(sort_op.keys, limit_op.limit), *sort_node.inputs
            )
        )


class Distinct2DistinctRule(Rule):
    name = "Distinct2DistinctRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalDistinct)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: L.LogicalDistinct = input.root.operator
        result.add(OptExpression.op(P.PhysicalDistinct(op.columns), *input.root.inputs))


class Window2WindowRule(Rule):
    name = "Window2WindowRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalWindow)

    def apply(self, input, ctx, result: RuleResult) -> None:
        op: L.LogicalWindow = input.root.operator
        result.add(
            OptExpression.op(P.PhysicalWindow(op.window_exprs), *input.root.inputs)
        )


class Union2UnionRule(Rule):
    name = "Union2UnionRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalUnion)

    def apply(self, input, ctx, result: RuleResult) -> None:
        result.add(
            OptExpression.op(
                P.PhysicalUnion(getattr(input.root.operator, "by_name", False)),
                *input.root.inputs,
            )
        )


class Intersect2IntersectRule(Rule):
    name = "Intersect2IntersectRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalIntersect)

    def apply(self, input, ctx, result: RuleResult) -> None:
        result.add(OptExpression.op(P.PhysicalIntersect(input.root.operator.all), *input.root.inputs))


class Except2ExceptRule(Rule):
    name = "Except2ExceptRule"

    def pattern(self) -> Pattern:
        return pattern_of(L.LogicalExcept)

    def apply(self, input, ctx, result: RuleResult) -> None:
        result.add(OptExpression.op(P.PhysicalExcept(input.root.operator.all), *input.root.inputs))


IMPLEMENTATION_RULES = [
    Scan2TableScanRule(),
    Values2ValuesRule(),
    Filter2FilterRule(),
    Projection2ProjectionRule(),
    Limit2LimitRule(),
    Aggregate2HashAggregateRule(),
    Sort2SortRule(),
    SortLimit2TopKRule(),
    Distinct2DistinctRule(),
    Window2WindowRule(),
    Union2UnionRule(),
    Intersect2IntersectRule(),
    Except2ExceptRule(),
]
