"""Interval OVERLAP join (r10): ``l_lo <= r_hi AND r_lo <= l_hi``
joins auto-lower to LogicalIntervalOverlapJoin — bucketed equi-join
with the dedup-free MEET-AT rule (pair kept only in the bucket of
``greatest(l_lo, r_lo)``) and the two-level skew legs.  The
interval×interval companion of the point-in-interval range join;
written plainly, Spark nested-loops it."""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark.sources.catalog import Catalog
from datafusion_dolomite_spark.sql import parse_sql


@pytest.fixture(scope="module")
def qp(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ovl")
    spark.createDataFrame(
        [(i, i % 5, i * 50, i * 50 + 80) for i in range(200)],
        "a bigint, g bigint, s1 bigint, e1 bigint",
    ).coalesce(1).write.parquet(str(base / "la"))
    spark.createDataFrame(
        [(j, j % 5, j * 130, j * 130 + 100) for j in range(40)],
        "b bigint, g2 bigint, s2 bigint, e2 bigint",
    ).coalesce(1).write.parquet(str(base / "rb"))
    cat = Catalog()
    cat.register("la", str(base / "la"))
    cat.register("rb", str(base / "rb"))
    return QueryPlanner(spark, cat)


def _expected(strict_lr=False, strict_rl=False, keyed=False):
    out = []
    for i in range(200):
        for j in range(40):
            if keyed and i % 5 != j % 5:
                continue
            lr = (
                i * 50 < j * 130 + 100
                if strict_lr
                else i * 50 <= j * 130 + 100
            )
            rl = (
                j * 130 < i * 50 + 80
                if strict_rl
                else j * 130 <= i * 50 + 80
            )
            if lr and rl:
                out.append((i, j))
    return sorted(out)


def _spine(qp, sql):
    return qp.explain(parse_sql(sql, qp.catalog))


def test_overlap_lowers_and_matches(qp):
    sql = "select a, b from la join rb on s1 <= e2 and s2 <= e1"
    assert "LogicalIntervalOverlapJoin" in _spine(qp, sql)
    got = sorted((r["a"], r["b"]) for r in qp.sql(sql).collect())
    assert got == _expected()


def test_overlap_strict_bounds(qp):
    sql = "select a, b from la join rb on s1 < e2 and s2 < e1"
    assert "LogicalIntervalOverlapJoin" in _spine(qp, sql)
    got = sorted((r["a"], r["b"]) for r in qp.sql(sql).collect())
    assert got == _expected(strict_lr=True, strict_rl=True)


def test_overlap_with_equi_keys(qp):
    sql = (
        "select a, b from la join rb "
        "on g = g2 and s1 <= e2 and s2 <= e1"
    )
    assert "LogicalIntervalOverlapJoin" in _spine(qp, sql)
    got = sorted((r["a"], r["b"]) for r in qp.sql(sql).collect())
    assert got == _expected(keyed=True)


def test_overlap_skewed_giant_interval(spark, tmp_path):
    """A domain-spanning interval on either side routes through the
    coarse legs; results stay exact and dedup-free."""
    base = tmp_path
    lrows = [(i, i * 100, i * 100 + 150) for i in range(100)] + [
        (900, 0, 200_000)  # giant left interval
    ]
    rrows = [(j, j * 500, j * 500 + 200) for j in range(40)] + [
        (800, 0, 200_000)  # giant right interval
    ]
    spark.createDataFrame(
        lrows, "a bigint, s1 bigint, e1 bigint"
    ).coalesce(1).write.parquet(str(base / "la"))
    spark.createDataFrame(
        rrows, "b bigint, s2 bigint, e2 bigint"
    ).coalesce(1).write.parquet(str(base / "rb"))
    cat = Catalog()
    cat.register("la", str(base / "la"))
    cat.register("rb", str(base / "rb"))
    qp = QueryPlanner(spark, cat)
    sql = "select a, b from la join rb on s1 <= e2 and s2 <= e1"
    got = sorted((r["a"], r["b"]) for r in qp.sql(sql).collect())
    exp = sorted(
        (a, b)
        for a, s1, e1 in lrows
        for b, s2, e2 in rrows
        if s1 <= e2 and s2 <= e1
    )
    assert got == exp


def test_point_in_interval_still_goes_to_range_join(qp):
    """The shared-left-column shape stays RangeJoinFromConditionRule's
    territory — overlap only fires on four distinct bound columns."""
    sql = "select a, b from la join rb on s1 >= s2 and s1 <= e2"
    spine = _spine(qp, sql)
    assert "LogicalIntervalOverlapJoin" not in spine
    assert "RangeJoin" in spine


def test_broadcast_strategy_for_tiny_interval_side(spark, tmp_path):
    """r10: both overlap strategies enter the memo; the cost model
    picks BROADCAST for a tiny right side (no explode, no left
    shuffle) and BUCKETED once the interval side grows — the same race
    as the range join's pair.  Results identical either way."""
    from pyspark.sql import functions as F

    base = tmp_path
    spark.createDataFrame(
        [(i, i * 50, i * 50 + 80) for i in range(500)],
        "a bigint, s1 bigint, e1 bigint",
    ).coalesce(1).write.parquet(str(base / "la"))
    spark.createDataFrame(
        [(j, j * 130, j * 130 + 100) for j in range(10)],
        "b bigint, s2 bigint, e2 bigint",
    ).coalesce(1).write.parquet(str(base / "rb"))
    cat = Catalog()
    cat.register("la", str(base / "la"))
    cat.register("rb", str(base / "rb"))
    qp = QueryPlanner(spark, cat)
    sql = "select a, b from la join rb on s1 <= e2 and s2 <= e1"
    assert "PhysicalBroadcastOverlapJoin" in _spine(qp, sql)
    got = sorted((r["a"], r["b"]) for r in qp.sql(sql).collect())
    exp = sorted(
        (i, j)
        for i in range(500)
        for j in range(10)
        if i * 50 <= j * 130 + 100 and j * 130 <= i * 50 + 80
    )
    assert got == exp


def test_left_only_filter_pushes_below_overlap(qp):
    """Left-only conjuncts commute with the overlap join (each left
    row's matches are independent of other left rows) — the filter
    must sit BELOW the join in the optimized plan, reaching the scan
    before the explode/shuffle."""
    sql = (
        "select a, b from la join rb on s1 <= e2 and s2 <= e1 "
        "where a < 50"
    )
    spine = _spine(qp, sql)
    logical = spine.split("== Physical Plan ==")[0]
    join_pos = logical.index("LogicalIntervalOverlapJoin")
    filt_pos = logical.index("a < 50")
    assert filt_pos > join_pos, (
        "left-only filter should appear BELOW the overlap join:\n"
        + logical
    )
    got = sorted((r["a"], r["b"]) for r in qp.sql(sql).collect())
    assert got == [p for p in _expected() if p[0] < 50]


def test_skew_legs_stats_gated(qp, spark, tmp_path):
    """r11 (VERDICT r10 item 4): constant-width derived intervals are
    PROVEN short (affine bounds over one base column, same scale), so
    the plan is the single fine leg — no classification filters, no
    coarse-leg unions.  Unprovable sides keep the four-leg insurance."""
    # derived constant-width intervals → fine-only (both sides sized
    # past the broadcast race so the BUCKETED strategy wins and the
    # leg structure is observable)
    base0 = tmp_path
    spark.createDataFrame(
        [(i, i * 7) for i in range(3000)], "a bigint, s1 bigint"
    ).coalesce(1).write.parquet(str(base0 / "lw"))
    spark.createDataFrame(
        [(j, j * 11) for j in range(2000)], "b bigint, s2 bigint"
    ).coalesce(1).write.parquet(str(base0 / "rw"))
    cat0 = Catalog()
    cat0.register("lw", str(base0 / "lw"))
    cat0.register("rw", str(base0 / "rw"))
    qp0 = QueryPlanner(spark, cat0)
    df = qp0.sql(
        "select a, b from "
        "(select a, s1 as lo, s1 + 80 as hi from lw) "
        "join (select b, s2 as lo2, s2 + 100 as hi2 from rw) "
        "on lo <= hi2 and lo2 <= hi"
    )
    phys = df._jdf.queryExecution().executedPlan().toString()
    if "BroadcastNestedLoopJoin" not in phys:
        assert "Union" not in phys  # gated: the single fine leg
    got = sorted((r["a"], r["b"]) for r in df.collect())
    assert got == sorted(
        (i, j)
        for i in range(3000)
        for j in range(2000)
        if i * 7 <= j * 11 + 100 and j * 11 <= i * 7 + 80
    )
    # independent bound columns with a domain-spanning width bound →
    # the insurance stays (same shape test_overlap_skewed_giant_interval
    # checks for correctness)
    base = tmp_path
    spark.range(100_000).selectExpr(
        "id as a",
        "case when id = 99999 then 0 else id * 100 end as s1",
        "case when id = 99999 then 20000000 else id * 100 + 150 end as e1",
    ).coalesce(1).write.parquet(str(base / "la2"))
    spark.range(100_000).selectExpr(
        "id as b", "id * 500 as s2", "id * 500 + 200 as e2"
    ).coalesce(1).write.parquet(str(base / "rb2"))
    cat = Catalog()
    cat.register("la2", str(base / "la2"))
    cat.register("rb2", str(base / "rb2"))
    qp2 = QueryPlanner(spark, cat)
    df2 = qp2.sql("select a, b from la2 join rb2 on s1 <= e2 and s2 <= e1")
    phys2 = df2._jdf.queryExecution().executedPlan().toString()
    # correctness of the four-leg shape is pinned by
    # test_overlap_skewed_giant_interval; here only the leg structure
    assert "Union" in phys2
