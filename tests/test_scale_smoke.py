"""Scale-up smoke: replicate sf0.1 lineitem 8× (~4.8M rows) through the
engine's own Union operator and check plans + results hold.

Not a benchmark — a guard that nothing in the pipeline is O(n²),
driver-materializing, or partition-degenerate when the input grows.
"""

import os

import pytest

from datafusion_dolomite_spark import (
    Alias,
    Cast,
    Func,
    JoinType,
    LogicalPlanBuilder,
    QueryPlanner,
    col,
    lit,
)
from datafusion_dolomite_spark.expr import BinOp
from datafusion_dolomite_spark.sources.catalog import testdata_catalog as _make_catalog

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = 8


@pytest.fixture(scope="module")
def big_planner(spark):
    return QueryPlanner(spark, _make_catalog(SF_DIR))


def _replicated_lineitem():
    b = LogicalPlanBuilder().scan("lineitem")
    others = [LogicalPlanBuilder().scan("lineitem") for _ in range(REPLICAS - 1)]
    return b.union(*others)


def test_big_aggregate_scales_linearly(big_planner):
    plan = (
        _replicated_lineitem()
        .aggregate(
            [col("l_returnflag")],
            [
                Alias(Func("count", ()), "cnt"),
                Alias(
                    Cast(Func("sum", (Cast(col("l_quantity"), "decimal(12,2)"),)), "double"),
                    "qty",
                ),
            ],
        )
        .build()
    )
    big = {r["l_returnflag"]: (r["cnt"], r["qty"]) for r in big_planner.dataframe(plan).collect()}

    base_plan = (
        LogicalPlanBuilder()
        .scan("lineitem")
        .aggregate(
            [col("l_returnflag")],
            [
                Alias(Func("count", ()), "cnt"),
                Alias(
                    Cast(Func("sum", (Cast(col("l_quantity"), "decimal(12,2)"),)), "double"),
                    "qty",
                ),
            ],
        )
        .build()
    )
    base = {r["l_returnflag"]: (r["cnt"], r["qty"]) for r in big_planner.dataframe(base_plan).collect()}
    for k, (cnt, qty) in base.items():
        assert big[k][0] == cnt * REPLICAS
        assert abs(big[k][1] - qty * REPLICAS) < 1e-6


def test_big_join_still_broadcasts_dim(big_planner):
    import contextlib
    import io

    plan = (
        _replicated_lineitem()
        .join(
            LogicalPlanBuilder().scan("supplier"),
            JoinType.INNER,
            col("l_suppkey").eq(col("s_suppkey")),
        )
        .aggregate([col("s_nationkey")], [Alias(Func("count", ()), "n")])
        .build()
    )
    df = big_planner.dataframe(plan)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # the 4.8M-row fact side must not shuffle for the join itself:
    # supplier (6k rows) is broadcast
    assert "BroadcastHashJoin" in text
    assert df.count() == 25  # one row per nation key
