"""ASOF [LEFT] JOIN SQL surface (r9) — DuckDB's grammar lowered to the
engine's LogicalAsofJoin (reference has inner equi joins only,
``dolomite/src/operator/join.rs``; the as-of operator is north-star
time-series surface, this adds its SQL front door).

Plain ASOF JOIN is INNER (unmatched left rows drop — DuckDB's
default); ASOF LEFT JOIN keeps them with NULLs.  The ON condition is
equality conjuncts plus exactly one ``l.ts >= r.ts``."""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark.sources.catalog import Catalog
from datafusion_dolomite_spark.sql import SqlError, parse_sql


@pytest.fixture(scope="module")
def qp(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("asof")
    spark.createDataFrame(
        [(1, 10), (1, 25), (1, 3), (2, 8)], "k bigint, t bigint"
    ).coalesce(1).write.parquet(str(base / "l"))
    spark.createDataFrame(
        [(1, 5, 100), (1, 20, 200), (2, 9, 300)],
        "k2 bigint, rt bigint, rv bigint",
    ).coalesce(1).write.parquet(str(base / "r"))
    cat = Catalog()
    cat.register("lt", str(base / "l"))
    cat.register("rt_tab", str(base / "r"))
    return QueryPlanner(spark, cat)


def test_asof_inner(qp):
    got = sorted(
        (r["k"], r["t"], r["rv"])
        for r in qp.sql(
            "select k, t, rv from lt asof join rt_tab "
            "on k = k2 and t >= rt"
        ).collect()
    )
    # (1,3) has no rt<=3 → dropped; (1,10)→rt5; (1,25)→rt20; (2,8) no
    # rt<=8 for k=2 (rt=9 is later) → dropped
    assert got == [(1, 10, 100), (1, 25, 200)]


def test_asof_left_outer(qp):
    got = sorted(
        (r["k"], r["t"], r["rv"])
        for r in qp.sql(
            "select k, t, rv from lt asof left join rt_tab "
            "on k = k2 and t >= rt"
        ).collect()
    )
    assert got == [
        (1, 3, None), (1, 10, 100), (1, 25, 200), (2, 8, None),
    ]


def test_asof_reversed_inequality_normalizes(qp):
    got = qp.sql(
        "select k, t, rv from lt asof join rt_tab "
        "on k2 = k and rt <= t order by t"
    ).collect()
    assert [(r["t"], r["rv"]) for r in got] == [(10, 100), (25, 200)]


def test_asof_rejects_bad_shapes(qp):
    with pytest.raises(SqlError, match="exactly one ts inequality"):
        parse_sql(
            "select k from lt asof join rt_tab "
            "on k = k2 and t >= rt and t >= rt",
            qp.catalog,
        )
    with pytest.raises(SqlError, match="needs a ts inequality"):
        parse_sql(
            "select k from lt asof join rt_tab on k = k2",
            qp.catalog,
        )


def test_asof_tolerance(qp):
    """``l.ts - r.ts <= N``: inclusive tolerance — matches farther back
    drop (inner) / null out (left outer)."""
    got = sorted(
        (r["t"], r["rv"])
        for r in qp.sql(
            "select t, rv from lt asof join rt_tab "
            "on k = k2 and t >= rt and t - rt <= 5"
        ).collect()
    )
    # (1,10)→rt5 diff 5 ✓ inclusive; (1,25)→rt20 diff 5 ✓
    assert got == [(10, 100), (25, 200)]
    got = sorted(
        (r["t"], r["rv"])
        for r in qp.sql(
            "select t, rv from lt asof join rt_tab "
            "on k = k2 and t >= rt and t - rt <= 4"
        ).collect()
    )
    assert got == []  # both matches are exactly 5 back
    outer = sorted(
        (r["t"], r["rv"])
        for r in qp.sql(
            "select t, rv from lt asof left join rt_tab "
            "on k = k2 and t >= rt and t - rt <= 4"
        ).collect()
    )
    assert outer == [(3, None), (8, None), (10, None), (25, None)]


def test_asof_tolerance_must_match_ts_pair(qp):
    with pytest.raises(SqlError, match="SAME timestamp"):
        parse_sql(
            "select k from lt asof join rt_tab "
            "on k = k2 and t >= rt and rv - rt <= 5",
            qp.catalog,
        )


# -- directions (r10): forward / strict / nearest -----------------------


def test_asof_forward(qp):
    """``t <= rt``: smallest rt >= t matches (forward inclusive)."""
    got = sorted(
        (r["k"], r["t"], r["rv"])
        for r in qp.sql(
            "select k, t, rv from lt asof join rt_tab "
            "on k = k2 and t <= rt"
        ).collect()
    )
    # (1,3)→rt5; (1,10)→rt20; (1,25) nothing ahead → drop; (2,8)→rt9
    assert got == [(1, 3, 100), (1, 10, 200), (2, 8, 300)]


def test_asof_forward_outer_with_tolerance(qp):
    got = sorted(
        (r["t"], r["rv"])
        for r in qp.sql(
            "select t, rv from lt asof left join rt_tab "
            "on k = k2 and t <= rt and rt - t <= 2"
        ).collect()
    )
    # forward gaps: 3→5 diff 2 ✓, 10→20 diff 10 ✗, 25 none, 8→9 diff 1 ✓
    assert got == [(3, 100), (8, 300), (10, None), (25, None)]


def test_asof_nearest(qp):
    got = sorted(
        (r["k"], r["t"], r["rv"])
        for r in qp.sql(
            "select k, t, rv from lt asof nearest join rt_tab "
            "on k = k2 and t >= rt"
        ).collect()
    )
    # (1,3): only forward rt5 → 100; (1,10): back diff 5 < fwd diff 10
    # → 100; (1,25): only backward rt20 → 200; (2,8): only fwd rt9 → 300
    assert got == [(1, 3, 100), (1, 10, 100), (1, 25, 200), (2, 8, 300)]


@pytest.fixture(scope="module")
def qp_eq(spark, tmp_path_factory):
    """Equal-timestamp rows — the strict/tie cases."""
    base = tmp_path_factory.mktemp("asof_eq")
    spark.createDataFrame(
        [(1, 10), (1, 15)], "k bigint, t bigint"
    ).coalesce(1).write.parquet(str(base / "l"))
    spark.createDataFrame(
        [(1, 10, 111), (1, 5, 55), (1, 20, 222)],
        "k2 bigint, rt bigint, rv bigint",
    ).coalesce(1).write.parquet(str(base / "r"))
    cat = Catalog()
    cat.register("lt", str(base / "l"))
    cat.register("rt_tab", str(base / "r"))
    return QueryPlanner(spark, cat)


def test_asof_backward_strict(qp_eq):
    got = sorted(
        (r["t"], r["rv"])
        for r in qp_eq.sql(
            "select t, rv from lt asof join rt_tab on k = k2 and t > rt"
        ).collect()
    )
    # strict: (1,10) skips rt=10, takes rt=5
    assert got == [(10, 55), (15, 111)]


def test_asof_forward_strict(qp_eq):
    got = sorted(
        (r["t"], r["rv"])
        for r in qp_eq.sql(
            "select t, rv from lt asof join rt_tab on k = k2 and t < rt"
        ).collect()
    )
    # strict: (1,10) skips rt=10, takes rt=20
    assert got == [(10, 222), (15, 222)]


def test_asof_nearest_tie_takes_backward(qp_eq):
    got = sorted(
        (r["t"], r["rv"])
        for r in qp_eq.sql(
            "select t, rv from lt asof nearest join rt_tab "
            "on k = k2 and t >= rt"
        ).collect()
    )
    # (1,10): exact match rt=10 → 111; (1,15): back diff 5 (rt10) ties
    # fwd diff 5 (rt20) → backward wins → 111
    assert got == [(10, 111), (15, 111)]


def test_asof_nearest_tolerance(qp_eq):
    got = sorted(
        (r["t"], r["rv"])
        for r in qp_eq.sql(
            "select t, rv from lt asof nearest left join rt_tab "
            "on k = k2 and t >= rt and t - rt <= 3"
        ).collect()
    )
    # (1,10): diff 0 ✓; (1,15): both sides diff 5 > 3 → NULL
    assert got == [(10, 111), (15, None)]
