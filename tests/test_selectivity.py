"""Predicate-aware selectivity (cost.py::_predicate_selectivity).

The footer min/max + ndv statistics turn pushed filters into real
cardinality reductions; the observable consequence is a JOIN STRATEGY
FLIP: a fact side too big to broadcast at full size earns the
broadcast once a selective filter shrinks its estimate below the byte
budget."""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark import JoinType, LogicalPlanBuilder, col, lit
from datafusion_dolomite_spark.expr import BinOp, Col, Lit
from datafusion_dolomite_spark.operators.properties import (
    ColumnStatistics,
    Statistics,
)
from datafusion_dolomite_spark.optimizer.cascades.cost import (
    _predicate_selectivity,
)

STATS = Statistics(
    row_count=1000.0,
    columns=(
        ("x", ColumnStatistics(ndv=100.0, min=0.0, max=100.0)),
        ("s", ColumnStatistics(ndv=50.0)),
    ),
)


def test_leaf_selectivities():
    # equality -> 1/ndv
    assert _predicate_selectivity(BinOp("=", Col("x"), Lit(5)), STATS) == pytest.approx(0.01)
    assert _predicate_selectivity(BinOp("=", Col("s"), Lit("a")), STATS) == pytest.approx(0.02)
    # range -> linear interpolation over [min, max]
    assert _predicate_selectivity(BinOp("<", Col("x"), Lit(25)), STATS) == pytest.approx(0.25)
    assert _predicate_selectivity(BinOp(">=", Col("x"), Lit(90)), STATS) == pytest.approx(0.10)
    # reversed literal-first form
    assert _predicate_selectivity(BinOp(">", Lit(25), Col("x")), STATS) == pytest.approx(0.25)
    # out-of-range clamps (never zero)
    assert _predicate_selectivity(BinOp("<", Col("x"), Lit(-5)), STATS) == pytest.approx(1e-4)
    assert _predicate_selectivity(BinOp("<", Col("x"), Lit(500)), STATS) == pytest.approx(1.0)
    # conjunction multiplies; unknown column falls back to 1/4
    both = BinOp("and", BinOp("<", Col("x"), Lit(50)), BinOp("=", Col("s"), Lit("a")))
    assert _predicate_selectivity(both, STATS) == pytest.approx(0.5 * 0.02)
    assert _predicate_selectivity(BinOp("<", Col("unknown"), Lit(3)), STATS) == pytest.approx(0.25)
    # no stats at all -> classic 1/4
    assert _predicate_selectivity(BinOp("<", Col("x"), Lit(25)), None) == pytest.approx(0.25)


def test_catalog_carries_footer_min_max(catalog):
    st = catalog.statistics("orders")
    cs = st.col("o_custkey")
    assert cs is not None and cs.min == 0.0 and cs.max == 149.0


def test_selective_filter_flips_join_to_broadcast(spark, catalog):
    """lineitem ⋈ orders with a byte budget that full-size orders
    exceeds: unfiltered -> no broadcast; with o_custkey <= 10 (~7% by
    interpolation) the shrunken estimate earns the broadcast."""
    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark.optimizer.cascades.cost import SparkCostModel

    ost = catalog.statistics("orders")
    full_bytes = ost.row_count * ost.avg_row_bytes
    qp = QueryPlanner(
        spark,
        catalog,
        cost_model=SparkCostModel(
            broadcast_row_threshold=1,
            broadcast_bytes_threshold=int(full_bytes * 0.4),
        ),
    )

    def plan(filtered: bool):
        right = LogicalPlanBuilder().scan("orders")
        if filtered:
            right = right.filter(col("o_custkey").le(lit(10)))
        return (
            LogicalPlanBuilder()
            .scan("lineitem")
            .join(right, JoinType.INNER, col("l_orderkey").eq(col("o_orderkey")))
            .build()
        )

    unfiltered = qp.explain(plan(False)).split("== Physical Plan ==")[1]
    assert "PhysicalBroadcastHashJoin" not in unfiltered, unfiltered
    filtered = qp.explain(plan(True)).split("== Physical Plan ==")[1]
    assert "PhysicalBroadcastHashJoin" in filtered, filtered
