"""TreeBuilder port (``dolomite/src/utils.rs:1-97``): begin/leaf/end
fluent construction of Patterns and OptExpressions."""

from datafusion_dolomite_spark.operators.logical import (
    LogicalFilter,
    LogicalJoin,
    LogicalLimit,
    LogicalProjection,
    LogicalScan,
)
from datafusion_dolomite_spark.optimizer.pattern import any_pattern, pattern_of
from datafusion_dolomite_spark.optimizer.rule import OptExpression
from datafusion_dolomite_spark.optimizer.utils import (
    OptExprBuilder,
    PatternBuilder,
    TreeBuilder,
)


def test_generic_tree_builder_nests():
    # plain (node, children) tuples — the doctest shape of utils.rs
    make = lambda n, cs: (n, tuple(cs))  # noqa: E731
    tree = (
        TreeBuilder(make, "root")
        .begin("a")
        .leaf("a1")
        .leaf("a2")
        .end()
        .leaf("b")
        .end()
    )
    assert tree == ("root", (("a", (("a1", ()), ("a2", ()))), ("b", ())))


def test_pattern_builder_equivalent_to_pattern_of():
    built = PatternBuilder(LogicalLimit).leaf(LogicalProjection).end()
    direct = pattern_of(LogicalLimit, children=(pattern_of(LogicalProjection),))
    assert built.matches_operator(LogicalLimit(5))
    assert not built.matches_operator(LogicalScan("t"))
    assert len(built.children) == len(direct.children) == 1
    assert built.children[0].matches_operator(LogicalProjection(()))
    assert built.children[0].children is None  # wildcard below, like the ref


def test_pattern_builder_multi_level_and_any():
    p = (
        PatternBuilder(LogicalFilter)
        .begin(LogicalJoin)
        .leaf(LogicalScan)
        .leaf_any()
        .end()
        .end()
    )
    assert p.matches_operator(LogicalFilter(None))
    join_p = p.children[0]
    assert join_p.matches_operator(LogicalJoin(None, None))
    assert join_p.children[0].matches_operator(LogicalScan("x"))
    assert join_p.children[1].matches_operator(LogicalLimit(1))  # any


def test_opt_expr_builder_matches_direct_construction():
    built = (
        OptExprBuilder(LogicalLimit(10))
        .begin(LogicalProjection(()))
        .leaf_handle("group-0")
        .end()
        .end()
    )
    direct = OptExpression.op(
        LogicalProjection(()), OptExpression.handle("group-0")
    )
    assert isinstance(built, OptExpression)
    root = built.root
    assert isinstance(root.operator, LogicalLimit)
    proj = root.inputs[0]
    assert isinstance(proj.operator, LogicalProjection)
    assert proj.inputs[0].handle == "group-0"
    assert direct.root.operator == proj.operator


def test_limit_rules_still_golden(ctx):
    """The limit rules now build their patterns through PatternBuilder —
    the golden rewrites must be unchanged."""
    from datafusion_dolomite_spark import LogicalPlanBuilder, col
    from datafusion_dolomite_spark.optimizer.heuristic import HepOptimizer
    from datafusion_dolomite_spark.optimizer.rules.limit import (
        PushLimitOverProjectionRule,
        PushLimitToTableScanRule,
        RemoveLimitRule,
    )

    plan = (
        LogicalPlanBuilder()
        .scan("region")
        .projection([col("r_name")])
        .limit(5)
        .build()
    )
    out = HepOptimizer(
        [RemoveLimitRule(), PushLimitOverProjectionRule(), PushLimitToTableScanRule()],
        ctx,
    ).find_best_plan(plan)
    assert out.explain() == (
        "LogicalProjection { expr: [r_name] }\n"
        '└── LogicalScan { table_name: "region", limit: 5 }'
    )
