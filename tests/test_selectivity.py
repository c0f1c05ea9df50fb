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


def test_histogram_range_selectivity_on_skew():
    """r9: an equi-height histogram reads the value DISTRIBUTION —
    90% of rows under 10 with a tail to 1e6 estimates `x < 10` at
    ~0.9, where min/max linear interpolation says ~1e-4 (1000x off)."""
    # edges: 29 of 32 bins inside [0, 10], 3 tail bins to 1e6
    edges = tuple(float(i) * 10.0 / 29.0 for i in range(30)) + (
        1_000.0, 100_000.0, 1_000_000.0,
    )
    skew = Statistics(
        row_count=1_000_000.0,
        columns=(
            ("x", ColumnStatistics(
                ndv=1000.0, min=0.0, max=1_000_000.0, histogram=edges,
            )),
        ),
    )
    sel = _predicate_selectivity(BinOp("<", Col("x"), Lit(10)), skew)
    assert 0.85 <= sel <= 0.95
    # flipped op is the complement
    sel_hi = _predicate_selectivity(BinOp(">=", Col("x"), Lit(10)), skew)
    assert sel + sel_hi == pytest.approx(1.0, abs=1e-6)
    # without the histogram, the SAME stats mislead by ~4 orders
    flat = Statistics(
        row_count=1_000_000.0,
        columns=(
            ("x", ColumnStatistics(ndv=1000.0, min=0.0, max=1_000_000.0)),
        ),
    )
    assert _predicate_selectivity(BinOp("<", Col("x"), Lit(10)), flat) < 1e-3
    # out-of-range clamps unchanged
    assert _predicate_selectivity(
        BinOp("<", Col("x"), Lit(-1)), skew
    ) == pytest.approx(1e-4)
    assert _predicate_selectivity(
        BinOp("<", Col("x"), Lit(2e6)), skew
    ) == pytest.approx(1.0)


def test_histogram_duplicate_edges_heavy_value():
    """A value heavy enough to span whole bins duplicates quantile
    edges; predicates land on the right side of the spike."""
    # 4 bins: 0 | 5 5 5 | 9 — value 5 holds ~half the rows
    edges = (0.0, 5.0, 5.0, 5.0, 9.0)
    st = Statistics(
        row_count=100.0,
        columns=(("x", ColumnStatistics(ndv=10.0, histogram=edges)),),
    )
    # everything strictly below the spike: at most the first bin
    assert _predicate_selectivity(
        BinOp("<", Col("x"), Lit(4.9)), st
    ) <= 0.25
    # at/above the spike: the three 5-bins count as passed
    assert _predicate_selectivity(
        BinOp("<=", Col("x"), Lit(5)), st
    ) >= 0.75


def test_catalog_builds_histograms(catalog):
    """The catalog's stats pass collects equi-height histograms for
    numeric columns (exact quantiles, ascending edges)."""
    st = catalog.statistics("orders")
    cs = st.col("o_custkey")
    h = cs.histogram
    assert len(h) == 33  # 32 bins + 1
    assert list(h) == sorted(h)
    assert h[0] == cs.min and h[-1] == cs.max
