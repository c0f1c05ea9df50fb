"""Unit tests for the expr IR and plan DAG (reference tier-1 analog:
``plan/mod.rs`` / ``plan/explain.rs`` inline tests)."""

from datafusion_dolomite_spark import (
    Alias,
    BinOp,
    Func,
    JoinType,
    LogicalPlanBuilder,
    col,
    lit,
)
from datafusion_dolomite_spark.plans.plan import PlanNode


def test_expr_hashable_and_eq():
    # memo dedup depends on stable hash/eq (ref memo.rs:713-719)
    a = col("c1").eq(col("c2"))
    b = col("c1").eq(col("c2"))
    assert a == b
    assert hash(a) == hash(b)
    assert a != col("c1").eq(col("c3"))
    s = {a, b}
    assert len(s) == 1


def test_expr_pretty():
    e = col("l_quantity").lt(lit(24)).and_(col("l_returnflag").eq(lit("R")))
    assert e.pretty() == "((l_quantity < 24) and (l_returnflag = 'R'))"


def test_conjuncts_flatten():
    e = col("a").eq(lit(1)).and_(col("b").eq(lit(2))).and_(col("c").eq(lit(3)))
    assert len(e.conjuncts()) == 3


def test_agg_func_flag():
    assert Func("sum", (col("x"),)).is_aggregate
    assert not Func("md5", (col("x"),)).is_aggregate


def test_builder_and_bfs_order():
    plan = (
        LogicalPlanBuilder()
        .scan("t1")
        .join(LogicalPlanBuilder().scan("t2"), JoinType.INNER, col("c1").eq(col("c2")))
        .limit(10)
        .build()
    )
    names = [n.operator.operator_name() for n in plan.bfs_iterator()]
    assert names == ["Limit", "Join", "Scan", "Scan"]


def test_semantic_eq_ignores_ids():
    # ref plan/mod.rs:54-63: PartialEq ignores id
    p1 = LogicalPlanBuilder().scan("t1").limit(5).build()
    p2 = LogicalPlanBuilder().scan("t1").limit(5).build()
    assert p1.root.id != p2.root.id
    assert p1.semantic_eq(p2)
    p3 = LogicalPlanBuilder().scan("t1").limit(6).build()
    assert not p1.semantic_eq(p3)


def test_explain_golden():
    # format mirrors ref plan/explain.rs:52-94 golden strings
    plan = (
        LogicalPlanBuilder()
        .scan("t1")
        .projection([col("f1"), col("f2")])
        .limit(5)
        .build()
    )
    assert plan.explain() == (
        "LogicalLimit { limit: 5 }\n"
        '└── LogicalProjection { expr: [f1, f2] }\n'
        '    └── LogicalScan { table_name: "t1" }'
    )


def test_explain_join_two_children():
    plan = (
        LogicalPlanBuilder()
        .scan("t1")
        .join(LogicalPlanBuilder().scan("t2"), JoinType.INNER, col("c1").eq(col("c2")))
        .build()
    )
    assert plan.explain() == (
        "LogicalJoin { join_type: Inner, expr: (c1 = c2) }\n"
        '├── LogicalScan { table_name: "t1" }\n'
        '└── LogicalScan { table_name: "t2" }'
    )


def test_equi_keys_extraction():
    from datafusion_dolomite_spark.operators.logical import LogicalJoin

    j = LogicalJoin(
        JoinType.INNER,
        col("a").eq(col("b")).and_(col("c").eq(col("d"))),
    )
    assert j.equi_keys() == (("a", "b"), ("c", "d"))
    j2 = LogicalJoin(JoinType.INNER, col("a").gt(col("b")))
    assert j2.equi_keys() is None


def test_window_frame_pretty_and_fields():
    from datafusion_dolomite_spark.expr import Func
    from datafusion_dolomite_spark.operators.logical import WindowExprDef

    w = WindowExprDef(
        Func("sum", ()), (), (), "s", frame=("rows", -6, 0)
    )
    assert "rows between 6 preceding and current row" in w.pretty()
    w2 = WindowExprDef(Func("sum", ()), (), (), "s", frame=("range", None, 0))
    assert "range between unbounded preceding and current row" in w2.pretty()
