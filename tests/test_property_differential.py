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
