"""Heuristic optimizer + rewrite rules.

Tier-2 analog of the reference's YAML golden corpus
(``datafusion-dolomite-integration/resources/limit.yaml`` +
``rules/limit.rs:167-322`` unit tests): assert exact explain strings of
optimized plans.
"""

import pytest

from datafusion_dolomite_spark import JoinType, LogicalPlanBuilder, col, lit
from datafusion_dolomite_spark.optimizer.heuristic import HepOptimizer, MatchOrder
from datafusion_dolomite_spark.optimizer.rule import OptimizerContext
from datafusion_dolomite_spark.optimizer.rules.limit import (
    PushLimitOverProjectionRule,
    PushLimitToTableScanRule,
    RemoveLimitRule,
)
from datafusion_dolomite_spark.optimizer.rules.pushdown import PUSHDOWN_RULES
from datafusion_dolomite_spark.planner import default_rewrite_rules

LIMIT_RULES = [RemoveLimitRule(), PushLimitOverProjectionRule(), PushLimitToTableScanRule()]


def _opt(plan, ctx, rules=None):
    return HepOptimizer(rules or LIMIT_RULES, ctx).find_best_plan(plan)


# --- ported limit.yaml golden cases (resources/limit.yaml:1-11) -----------

def test_yaml_case_select_star(ctx):
    plan = (
        LogicalPlanBuilder()
        .scan("region")
        .projection([col("r_regionkey"), col("r_name")])
        .build()
    )
    assert _opt(plan, ctx).explain() == (
        "LogicalProjection { expr: [r_regionkey, r_name] }\n"
        '└── LogicalScan { table_name: "region" }'
    )


def test_yaml_case_select_star_limit_5(ctx):
    plan = (
        LogicalPlanBuilder()
        .scan("region")
        .projection([col("r_regionkey"), col("r_name")])
        .limit(5)
        .build()
    )
    # limit pushed below projection, fused into scan (limit.yaml case 2)
    assert _opt(plan, ctx).explain() == (
        "LogicalProjection { expr: [r_regionkey, r_name] }\n"
        '└── LogicalScan { table_name: "region", limit: 5 }'
    )


# --- rule unit tests (ref rules/limit.rs:167-322) -------------------------

def test_remove_limit_keeps_min(ctx):
    plan = LogicalPlanBuilder().scan("region").limit(10).limit(3).build()
    out = _opt(plan, ctx)
    assert out.explain() == 'LogicalScan { table_name: "region", limit: 3 }'


def test_remove_limit_outer_smaller(ctx):
    plan = LogicalPlanBuilder().scan("region").limit(3).limit(10).build()
    out = _opt(plan, ctx)
    assert out.explain() == 'LogicalScan { table_name: "region", limit: 3 }'


def test_push_limit_to_scan_merges_existing(ctx):
    plan = LogicalPlanBuilder().scan("region", limit=2).limit(7).build()
    out = _opt(plan, ctx)
    assert out.explain() == 'LogicalScan { table_name: "region", limit: 2 }'


def test_fixed_point_terminates(ctx):
    plan = (
        LogicalPlanBuilder()
        .scan("region")
        .projection([col("r_name")])
        .limit(5)
        .projection([col("r_name")])
        .limit(3)
        .build()
    )
    out = _opt(plan, ctx)
    # both limits pushed through both projections and fused: min(5,3)=3
    assert out.explain() == (
        "LogicalProjection { expr: [r_name] }\n"
        "└── LogicalProjection { expr: [r_name] }\n"
        '    └── LogicalScan { table_name: "region", limit: 3 }'
    )


# --- pushdown extension rules ---------------------------------------------

def test_filter_pushed_to_scan(ctx):
    plan = (
        LogicalPlanBuilder()
        .scan("lineitem")
        .filter(col("l_quantity").lt(lit(10.0)))
        .build()
    )
    out = _opt(plan, ctx, PUSHDOWN_RULES)
    assert out.explain() == (
        'LogicalScan { table_name: "lineitem", filters: [(l_quantity < 10.0)] }'
    )


def test_combine_filters_then_push(ctx):
    plan = (
        LogicalPlanBuilder()
        .scan("lineitem")
        .filter(col("l_quantity").lt(lit(10.0)))
        .filter(col("l_discount").gt(lit(0.01)))
        .build()
    )
    out = _opt(plan, ctx, PUSHDOWN_RULES)
    assert out.explain() == (
        'LogicalScan { table_name: "lineitem", '
        "filters: [(l_quantity < 10.0), (l_discount > 0.01)] }"
    )


def test_filter_split_through_join(ctx):
    plan = (
        LogicalPlanBuilder()
        .scan("customer")
        .join(
            LogicalPlanBuilder().scan("nation"),
            JoinType.INNER,
            col("c_nationkey").eq(col("n_nationkey")),
        )
        .filter(col("c_acctbal").gt(lit(100.0)).and_(col("n_name").eq(lit("NATION_3"))))
        .build()
    )
    out = _opt(plan, ctx, default_rewrite_rules())
    # each conjunct lands in its own side's scan
    assert out.explain() == (
        "LogicalJoin { join_type: Inner, expr: (c_nationkey = n_nationkey) }\n"
        '├── LogicalScan { table_name: "customer", filters: [(c_acctbal > 100.0)] }\n'
        '└── LogicalScan { table_name: "nation", filters: [(n_name = \'NATION_3\')] }'
    )


def test_filter_not_pushed_on_ambiguous_self_join_column(ctx):
    """Self-join: both sides expose the same column names, so pushing a
    conjunct that references them to one side would change semantics.
    The conjunct must stay ABOVE the join (ADVICE r1, pushdown.py)."""
    plan = (
        LogicalPlanBuilder()
        .scan("customer")
        .join(
            LogicalPlanBuilder().scan("customer"),
            JoinType.INNER,
            col("c_nationkey").eq(col("c_nationkey")),
        )
        .filter(col("c_acctbal").gt(lit(100.0)))
        .build()
    )
    out = _opt(plan, ctx, default_rewrite_rules())
    # the filter survives above the join; neither scan absorbed it
    text = out.explain()
    assert text.startswith("LogicalFilter"), text
    assert "filters: [(c_acctbal > 100.0)]" not in text


def test_projection_prunes_scan_columns(ctx):
    plan = (
        LogicalPlanBuilder()
        .scan("lineitem")
        .projection([col("l_orderkey"), col("l_quantity")])
        .build()
    )
    out = _opt(plan, ctx, default_rewrite_rules())
    assert out.explain() == (
        "LogicalProjection { expr: [l_orderkey, l_quantity] }\n"
        '└── LogicalScan { table_name: "lineitem", columns: [l_orderkey, l_quantity] }'
    )


def test_limit_pushed_through_union(ctx):
    """Limit(7, Union(region, nation)) → each branch limited, then the
    limits fuse into the scans (each input reads ≤ 7 rows)."""
    from datafusion_dolomite_spark.planner import default_rewrite_rules

    plan = (
        LogicalPlanBuilder()
        .scan("region")
        .union(LogicalPlanBuilder().scan("nation"))
        .limit(7)
        .build()
    )
    out = _opt(plan, ctx, default_rewrite_rules())
    txt = out.explain()
    assert txt.count("limit: 7") >= 3  # outer + fused into both scans
    assert 'LogicalScan { table_name: "region", limit: 7' in txt
    assert 'LogicalScan { table_name: "nation", limit: 7' in txt


def test_filter_pushed_through_aggregate(ctx):
    """Group-key conjunct moves below the agg (pre-shuffle); the
    agg-output conjunct (HAVING) stays above."""
    from datafusion_dolomite_spark.expr import Alias, Func

    plan = (
        LogicalPlanBuilder()
        .scan("lineitem")
        .aggregate(
            [col("l_returnflag")],
            [Alias(Func("count", ()), "n")],
        )
        .filter(col("l_returnflag").eq(lit("A")).and_(col("n").gt(lit(5))))
        .build()
    )
    out = _opt(plan, ctx, PUSHDOWN_RULES)
    lines = out.explain().splitlines()
    # Filter(n > 5) above Aggregate above Scan-with-fused-filter
    assert "(n > 5)" in lines[0]
    assert "LogicalAggregate" in lines[1]
    assert "l_returnflag = 'A'" in lines[2] or "l_returnflag = A" in lines[2]


def test_limit_not_reordered_with_filter(ctx):
    # Filter(Scan(limit)) must NOT push the filter into the scan
    plan = (
        LogicalPlanBuilder()
        .scan("lineitem", limit=100)
        .filter(col("l_quantity").lt(lit(10.0)))
        .build()
    )
    out = _opt(plan, ctx, default_rewrite_rules())
    assert "limit: 100" in out.explain()
    assert out.root.operator.operator_name() == "Filter"


def test_heuristic_rejects_multi_result_rule(ctx):
    from datafusion_dolomite_spark.optimizer.pattern import pattern_of
    from datafusion_dolomite_spark.optimizer.rule import OptExpression, Rule
    from datafusion_dolomite_spark.operators.logical import LogicalLimit

    class BadRule(Rule):
        name = "BadRule"

        def pattern(self):
            return pattern_of(LogicalLimit)

        def apply(self, input, ctx, result):
            result.add(OptExpression.op(LogicalLimit(1), *input.root.inputs))
            result.add(OptExpression.op(LogicalLimit(2), *input.root.inputs))

    plan = LogicalPlanBuilder().scan("region").limit(5).build()
    with pytest.raises(ValueError, match="at most 1"):
        HepOptimizer([BadRule()], ctx).find_best_plan(plan)


def test_filter_pushes_through_unnest(planner):
    from datafusion_dolomite_spark.expr import BinOp

    plan = (
        LogicalPlanBuilder()
        .scan("embeddings")
        .unnest("embedding")
        .filter(BinOp("and", col("label").eq(lit(1)), col("pos").lt(lit(8))))
        .projection([col("vec_id"), col("pos"), col("val")])
        .build()
    )
    out = planner.optimize_logical(plan).explain()
    # label conjunct reaches the scan; pos conjunct stays above the unnest
    assert "filters: [(label = 1)]" in out
    assert out.index("(pos < 8)") < out.index("LogicalUnnest")


def test_projection_prunes_unnest_input(planner):
    plan = (
        LogicalPlanBuilder()
        .scan("embeddings")
        .unnest("embedding")
        .projection([col("pos"), col("val")])
        .build()
    )
    out = planner.optimize_logical(plan).explain()
    assert 'columns: [embedding]' in out


def test_filter_pushes_through_asof_join(planner):
    from datafusion_dolomite_spark.expr import Alias, BinOp

    purch = (
        LogicalPlanBuilder()
        .scan("events")
        .filter(col("event_type").eq(lit("purchase")))
        .projection(
            [
                Alias(col("user_id"), "p_uid"),
                Alias(col("ts"), "p_ts"),
                Alias(col("value"), "pval"),
            ]
        )
    )
    plan = (
        LogicalPlanBuilder()
        .scan("events")
        .asof_join(purch, ["user_id"], ["p_uid"], "ts", "p_ts", ["pval"])
        .filter(BinOp("and", col("event_type").eq(lit("view")), col("pval").gt(lit(1.0))))
        .build()
    )
    out = planner.optimize_logical(plan).explain()
    # left-only conjunct reaches the left scan; carried-col conjunct stays above
    assert "filters: [(event_type = 'view')]" in out
    assert out.index("(pval > 1.0)") < out.index("LogicalAsofJoin")


def test_comma_join_becomes_equi_join(planner):
    """FROM a, b WHERE a.k = b.k — the cross join disappears; the WHERE
    equality lands in the join condition and single-sided filters reach
    their scans."""
    from datafusion_dolomite_spark.sql import parse_sql

    plan = parse_sql(
        "select c_name, n_name from customer, nation "
        "where c_nationkey = n_nationkey and c_acctbal > 5000",
        planner.catalog,
    )
    out = planner.optimize_logical(plan).explain()
    assert "(c_nationkey = n_nationkey)" in out.split("LogicalJoin")[1].split("\n")[0]
    assert "filters: [(c_acctbal > 5000)]" in out
    assert "true" not in out.lower() or "Lit(True)" not in out


def test_constant_folding(planner):
    from datafusion_dolomite_spark.expr import Alias, BinOp

    # 2*3 < c_acctbal folds to 6 < c_acctbal; TRUE-folding filter vanishes
    plan = (
        LogicalPlanBuilder()
        .scan("customer")
        .filter(BinOp("<", BinOp("*", lit(2), lit(3)), col("c_acctbal")))
        .filter(BinOp("or", lit(True), col("c_custkey").gt(lit(0))))
        .projection([col("c_custkey"), Alias(BinOp("+", lit(1), lit(2)), "three")])
        .build()
    )
    out = planner.optimize_logical(plan).explain()
    assert "(6 < c_acctbal)" in out or "filters: [(6 < c_acctbal)]" in out
    assert "(2 * 3)" not in out
    assert "or" not in out  # the always-true filter is gone
    assert "1 + 2" not in out and "three" in out
