"""Logical SQL views (r8): CREATE [OR REPLACE] VIEW / DROP VIEW /
SHOW VIEWS.  A view stores SQL TEXT and re-parses at each reference
(late binding) — the reference inlines the view's plan subtree, so
filters and column pruning push straight through into the underlying
scans.  Views persist in ``<warehouse>/_views.json`` across sessions
(like the DML version log)."""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark.sources.catalog import Catalog


@pytest.fixture()
def qp(spark, tmp_path):
    cat = Catalog(warehouse=str(tmp_path / "wh"))
    spark.createDataFrame(
        [(i, i % 5, i * 10) for i in range(100)],
        "k bigint, g bigint, v bigint",
    ).write.parquet(str(tmp_path / "t0"))
    cat.register("t", str(tmp_path / "t0"))
    return QueryPlanner(spark, cat)


def test_view_basic_and_pushdown(qp):
    qp.sql("create view big as select k, g, v from t where v >= 500").count()
    rows = qp.sql(
        "select g, cast(count(*) as bigint) as n from big "
        "where g = 2 group by g"
    ).collect()
    assert [(r["g"], r["n"]) for r in rows] == [(2, 10)]
    # the reference inlines the subtree: the filter reaches the scan
    df = qp.sql("select k from big where g = 2")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(g)" in plan


def test_view_over_view_and_late_binding(qp):
    qp.sql("create view a as select k, v from t where k < 50").count()
    qp.sql("create view b as select * from a where k >= 40").count()
    assert qp.sql("select * from b").count() == 10
    # late binding: replacing a changes what b sees
    qp.sql("create or replace view a as select k, v from t where k < 45").count()
    assert qp.sql("select * from b").count() == 5


def test_view_with_cte_body_and_cte_shadowing(qp):
    qp.sql(
        "create view w as with s as (select k from t where k < 3) "
        "select * from s"
    ).count()
    assert qp.sql("select * from w").count() == 3
    # a CTE named like a view shadows it
    assert (
        qp.sql(
            "with w as (select k from t where k < 7) select * from w"
        ).count()
        == 7
    )


def test_view_ddl_guards(qp):
    qp.sql("create view g1 as select k from t").count()
    with pytest.raises(Exception, match="already exists"):
        qp.sql("create view g1 as select v from t")
    with pytest.raises(Exception, match="collides"):
        qp.sql("create view t as select k from t")
    with pytest.raises(Exception, match="does not exist"):
        qp.sql("drop view nope")
    qp.sql("drop view if exists nope").count()  # no error
    qp.sql("drop view g1").count()
    names = {r["view"] for r in qp.sql("show views").collect()}
    assert "g1" not in names


def test_view_cycle_errors_at_query_time(qp):
    qp.sql("create view c1 as select k from t").count()
    qp.sql("create view c2 as select k from c1").count()
    # the replace creates a c1↔c2 cycle; validation can't see it (c1 is
    # invisible to its own definition), so the parser's nesting bound
    # catches it at query time
    qp.sql("create or replace view c1 as select k from c2").count()
    with pytest.raises(Exception, match="nesting|cycle"):
        qp.sql("select k from c1").count()


def test_views_persist_across_planners(qp, spark):
    qp.sql("create view pv as select g, v from t where v > 0").count()
    cat2 = Catalog(warehouse=qp.catalog.warehouse_root())
    cat2.register("t", qp.catalog.path("t"))
    qp2 = QueryPlanner(spark, cat2)
    assert qp2.sql("select * from pv").count() == 99
    got = {(r["view"]) for r in qp2.sql("show views").collect()}
    assert got == {"pv"}
