"""Cardinality-estimate calibration: the cost model's row estimates
against ACTUAL row counts, on the shapes its decisions hinge on.

The reference never populates statistics (``derive_statistics`` is
``todo!()``); ours drive broadcast-vs-shuffle and eager-aggregation
choices, so their error must stay bounded.  Ranges reflect what each
estimator can honestly deliver: footer-interpolated range filters
within 2×, System-R equi-joins and ndv-product aggregates within 5×.
"""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark import JoinType, LogicalPlanBuilder, col, lit
from datafusion_dolomite_spark.expr import Alias, BinOp, Col, Func


def _estimate(planner, plan):
    """Row estimate for the plan root, derived the same way cascades
    does: fold _output_rows over the logical tree with catalog stats."""
    from datafusion_dolomite_spark.operators.properties import Statistics
    from datafusion_dolomite_spark.optimizer.cascades.cost import (
        _output_rows,
        _propagate_columns,
    )

    ctx = planner.ctx

    def walk(node) -> Statistics:
        child_stats = [walk(c) for c in node.inputs]
        rows = [s.row_count for s in child_stats]
        out = _output_rows(node.operator, rows, ctx, child_stats)
        return Statistics(
            row_count=out,
            columns=_propagate_columns(node.operator, child_stats, ctx, out),
        )

    return walk(plan.root).row_count


CASES = [
    # (name, plan builder, max allowed estimate/actual ratio either way)
    (
        "range_filter_scan",
        lambda: LogicalPlanBuilder()
        .scan("orders")
        .filter(col("o_custkey").le(lit(40)))
        .build(),
        2.0,
    ),
    (
        "equality_filter_scan",
        lambda: LogicalPlanBuilder()
        .scan("customer")
        .filter(col("c_nationkey").eq(lit(3)))
        .build(),
        2.5,
    ),
    (
        "fk_join",
        lambda: LogicalPlanBuilder()
        .scan("orders")
        .join(
            LogicalPlanBuilder().scan("customer"),
            JoinType.INNER,
            col("o_custkey").eq(col("c_custkey")),
        )
        .build(),
        5.0,
    ),
    (
        "group_by_ndv",
        lambda: LogicalPlanBuilder()
        .scan("orders")
        .aggregate(
            [Col("o_custkey")], [Alias(Func("count", ()), "n")]
        )
        .build(),
        5.0,
    ),
    (
        "filtered_join",
        lambda: LogicalPlanBuilder()
        .scan("orders")
        .filter(
            BinOp(
                "and",
                col("o_custkey").ge(lit(20)),
                col("o_custkey").le(lit(80)),
            )
        )
        .join(
            LogicalPlanBuilder().scan("customer"),
            JoinType.INNER,
            col("o_custkey").eq(col("c_custkey")),
        )
        .build(),
        5.0,
    ),
]


@pytest.mark.parametrize("name,mk,bound", CASES, ids=[c[0] for c in CASES])
def test_estimate_within_bound(planner, name, mk, bound):
    plan = mk()
    est = _estimate(planner, planner.optimize_logical(plan))
    actual = planner.dataframe(plan).count()
    assert actual > 0
    ratio = max(est / actual, actual / est)
    assert ratio <= bound, (
        f"{name}: estimated {est:.0f} vs actual {actual} "
        f"(x{ratio:.1f} > x{bound})"
    )
