"""Prepared-DataFrame cache (r14): repeated pure-relational plans are
served as the SAME unresolved-DataFrame handle; anything stateful
(catalog mutations, file rewrites, impure-lowering operators) misses or
bypasses.  The cache holds plan HANDLES only — execution always
recomputes from the parquet inputs."""

import os
import shutil

import pytest

from datafusion_dolomite_spark import LogicalPlanBuilder, QueryPlanner, col
from datafusion_dolomite_spark.sources.catalog import (
    testdata_catalog as _catalog_for,
)
from datafusion_dolomite_spark.sql import parse_sql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from datafusion_dolomite_spark.session import get_spark

    s = get_spark("test-prepared-df-cache", cpus=4)
    yield s


def _plan():
    return (
        LogicalPlanBuilder()
        .scan("nation")
        .filter(col("n_regionkey").eq(1))
        .projection([col("n_name")])
        .build()
    )


def test_pure_plan_served_as_same_handle(spark):
    qp = QueryPlanner(spark, _catalog_for(SF))
    d1 = qp.dataframe(_plan())
    d2 = qp.dataframe(_plan())
    assert d1 is d2
    assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, d2.collect()))


def test_sql_gensym_reset_makes_repeat_parses_identical(spark):
    qp = QueryPlanner(spark, _catalog_for(SF))
    sql = (
        "select n_name from nation where n_nationkey in "
        "(select c_nationkey from customer where c_acctbal > 0) "
        "or exists (select 1 from supplier where s_nationkey = n_nationkey)"
    )
    p1, p2 = parse_sql(sql, qp.catalog), parse_sql(sql, qp.catalog)
    assert p1.explain() == p2.explain()
    d1, d2 = qp.sql(sql), qp.sql(sql)
    assert d1 is d2


def test_catalog_mutation_invalidates(spark, tmp_path):
    qp = QueryPlanner(spark, _catalog_for(SF))
    d1 = qp.dataframe(_plan())
    # any registration changes the fingerprint -> miss (fresh handle)
    qp.catalog.register("nation_copy", os.path.join(SF, "nation.parquet"))
    d2 = qp.dataframe(_plan())
    assert d1 is not d2
    assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, d2.collect()))


def test_file_rewrite_invalidates(spark, tmp_path):
    work = tmp_path / "t.parquet"
    shutil.copy(os.path.join(SF, "nation.parquet"), work)
    qp = QueryPlanner(spark, _catalog_for(SF))
    qp.catalog.register("twork", str(work))
    plan = (
        LogicalPlanBuilder().scan("twork").projection([col("n_name")]).build()
    )
    d1 = qp.dataframe(plan)
    n1 = len(d1.collect())
    # rewrite the backing file -> stamp changes -> fresh handle
    spark.read.parquet(str(work)).limit(5).write.mode("overwrite").parquet(
        str(tmp_path / "t2.parquet")
    )
    shutil.rmtree(work, ignore_errors=True)
    os.remove(work) if os.path.exists(work) else None
    shutil.copytree(str(tmp_path / "t2.parquet"), str(work))
    d2 = qp.dataframe(plan)
    assert d1 is not d2
    assert len(d2.collect()) == 5 and n1 > 5


def test_impure_lowering_bypasses(spark):
    qp = QueryPlanner(spark, _catalog_for(SF))
    sql = (
        "with recursive r(n) as (select 1 union all select n + 1 from r "
        "where n < 3) select * from r"
    )
    d1, d2 = qp.sql(sql), qp.sql(sql)
    # recursive CTE lowering runs per-iteration jobs -> never cached
    assert d1 is not d2
    assert sorted(map(tuple, d1.collect())) == [(1,), (2,), (3,)]
