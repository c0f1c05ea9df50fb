"""Property-based DIFFERENTIAL testing (absent in the reference —
SURVEY §5 'No property-based/randomized testing'): random plans run
twice, once through the full optimizer (heuristic + cascades) and once
executed raw — row sets must be identical.  Any rewrite that changes
semantics fails here even if no hand-written case covers it."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_dolomite_spark import LogicalPlanBuilder, col, lit
from datafusion_dolomite_spark.execute import to_spark
from datafusion_dolomite_spark.expr import Alias, BinOp, Func

# customer(c_custkey bigint, c_name, c_nationkey int, c_acctbal double,
#          c_mktsegment)
_NUM_COLS = ["c_custkey", "c_nationkey", "c_acctbal"]
_CMP = ["<", "<=", ">", ">=", "=", "!="]


@st.composite
def predicates(draw, depth=0):
    if depth < 2 and draw(st.booleans()):
        op = draw(st.sampled_from(["and", "or"]))
        return BinOp(
            op, draw(predicates(depth=depth + 1)), draw(predicates(depth=depth + 1))
        )
    c = draw(st.sampled_from(_NUM_COLS))
    v = draw(st.integers(min_value=-100, max_value=10000))
    return BinOp(draw(st.sampled_from(_CMP)), col(c), lit(float(v)))


@st.composite
def plans(draw):
    b = LogicalPlanBuilder().scan("customer")
    for _ in range(draw(st.integers(min_value=1, max_value=3))):
        b = b.filter(draw(predicates()))
    if draw(st.booleans()):
        b = b.projection([col("c_custkey"), col("c_nationkey"), col("c_acctbal")])
    if draw(st.booleans()):
        b = b.aggregate(
            [col("c_nationkey")],
            [
                Alias(Func("count", ()), "n"),
                Alias(Func("min", (col("c_custkey"),)), "min_k"),
            ],
        )
    return b.build()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=plans())
def test_optimized_equals_unoptimized(planner, plan):
    raw = sorted(
        tuple(r)
        for r in to_spark(plan, planner.spark, planner.catalog).collect()
    )
    opt = sorted(
        tuple(r)
        for r in planner.dataframe(plan).collect()
    )
    assert opt == raw


# -- joins + aggregation: the eager-aggregation / join-reorder /
# selectivity territory ------------------------------------------------

# orders(o_orderkey bigint, o_custkey bigint, o_orderstatus, o_totalprice
#        double, ...) ⋈ customer
_O_NUM = ["o_orderkey", "o_custkey"]
_C_NUM = ["c_custkey", "c_nationkey"]
_GROUPS = [
    ["c_nationkey"],
    ["o_orderstatus"],
    ["c_nationkey", "o_orderstatus"],
    [],
]
# exact-valued aggregates only (float sums are summation-order-dependent)
_AGGS = [
    Alias(Func("count", ()), "n"),
    Alias(Func("min", (col("o_orderkey"),)), "min_ok"),
    Alias(Func("max", (col("o_orderkey"),)), "max_ok"),
    Alias(Func("sum", (col("c_nationkey"),)), "sum_nk"),
    Alias(Func("max", (col("c_acctbal"),)), "max_bal"),
]


@st.composite
def join_agg_plans(draw):
    from datafusion_dolomite_spark import JoinType

    b = (
        LogicalPlanBuilder()
        .scan("orders")
        .join(
            LogicalPlanBuilder().scan("customer"),
            JoinType.INNER,
            col("o_custkey").eq(col("c_custkey")),
        )
    )
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        c = draw(st.sampled_from(_O_NUM + _C_NUM))
        v = draw(st.integers(min_value=-10, max_value=2000))
        b = b.filter(BinOp(draw(st.sampled_from(_CMP)), col(c), lit(float(v))))
    group = draw(st.sampled_from(_GROUPS))
    k = draw(st.integers(min_value=1, max_value=3))
    aggs = draw(
        st.lists(
            st.sampled_from(_AGGS), min_size=k, max_size=k, unique_by=lambda a: a.name
        )
    )
    return b.aggregate([col(g) for g in group], aggs).build()


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=join_agg_plans())
def test_join_agg_optimized_equals_unoptimized(planner, plan):
    """Full optimizer (filter-through-join pushdown, join strategy and
    order exploration, eager aggregation when it wins the cost race)
    against the raw plan."""
    raw = sorted(
        tuple(r)
        for r in to_spark(plan, planner.spark, planner.catalog).collect()
    )
    opt = sorted(tuple(r) for r in planner.dataframe(plan).collect())
    assert opt == raw


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=join_agg_plans())
def test_join_agg_eager_world_equals_raw(spark, catalog, plan):
    """Same property with broadcasts forbidden — the regime where
    EagerAggregationRule fires whenever legal, so the decomposed
    partial/final shape itself is under the differential."""
    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark.optimizer.cascades.cost import SparkCostModel

    qp = QueryPlanner(
        spark,
        catalog,
        cost_model=SparkCostModel(
            broadcast_row_threshold=1, broadcast_bytes_threshold=1
        ),
    )
    raw = sorted(tuple(r) for r in to_spark(plan, spark, catalog).collect())
    opt = sorted(tuple(r) for r in qp.dataframe(plan).collect())
    assert opt == raw
