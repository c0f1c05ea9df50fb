"""WITH RECURSIVE — iterative fixpoint CTEs (r6).

Spark has no native recursive CTE; the engine parses the standard
syntax (``WITH RECURSIVE name(cols) AS (base UNION [ALL] step)``) into
a ``LogicalRecursiveCTE`` operator and iterates semi-naively at
execution: UNION feeds only the NEW distinct rows forward (Postgres
working-table semantics — cyclic graphs terminate), UNION ALL feeds the
previous iteration and stops when it comes back empty, ``max_iter``
guards runaways.  DuckDB runs the SAME SQL natively — the differential
oracle for every case here.
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark import testdata_catalog as _tc
from datafusion_dolomite_spark.sql import SqlError, parse_sql

from .conftest import SF_DIR_ORACLE


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR_ORACLE}/{t}.parquet')"
        )
    return con


@pytest.fixture()
def qp(spark):
    return QueryPlanner(spark, _tc(SF_DIR_ORACLE))


def _both(qp, ddb, sql):
    got = sorted(tuple(r) for r in qp.sql(sql).collect())
    want = sorted(tuple(r) for r in ddb.execute(sql).fetchall())
    assert got == want, (got[:5], want[:5])
    return got


def test_union_all_series(qp, ddb):
    _both(
        qp,
        ddb,
        "with recursive seq(n) as ("
        "  select n from (values (1)) as t0(n) "
        "  union all select n + 1 from seq where n < 20) "
        "select count(*) as c, cast(sum(n) as bigint) as s from seq",
    )


def test_union_distinct_graph_closure(qp, ddb):
    """Nations reachable by repeatedly following regionkey→nationkey —
    a cyclic relation; UNION's new-rows-only semantics terminates."""
    _both(
        qp,
        ddb,
        "with recursive r(k) as ("
        "  select n_nationkey as k from nation where n_nationkey = 0 "
        "  union select n_nationkey as k from nation join r "
        "  on n_regionkey = k) "
        "select count(*) as c, cast(sum(k) as bigint) as s from r",
    )


def test_recursive_result_joins_base_tables(qp, ddb):
    _both(
        qp,
        ddb,
        "with recursive seq(n) as ("
        "  select n from (values (0)) as t0(n) "
        "  union all select n + 1 from seq where n < 24) "
        "select r_name, count(*) as n_nations from seq "
        "join nation on n_nationkey = n "
        "join region on n_regionkey = r_regionkey group by r_name",
    )


def test_base_referencing_cte_rejected(qp):
    with pytest.raises(SqlError):
        parse_sql(
            "with recursive r(k) as ("
            "  select k from r union all select k from r) "
            "select * from r",
            qp.catalog,
        )


def test_non_union_body_rejected(qp):
    with pytest.raises(SqlError):
        parse_sql(
            "with recursive r(k) as (select 1 as k from nation) "
            "select * from r",
            qp.catalog,
        )


def test_max_iter_guard(spark):
    """A step that never empties trips the depth guard instead of
    looping forever."""
    from datafusion_dolomite_spark.execute import to_spark
    from datafusion_dolomite_spark.operators.extensions import (
        LogicalCTERef,
        LogicalRecursiveCTE,
    )
    from datafusion_dolomite_spark.operators.logical import LogicalValues
    from datafusion_dolomite_spark.plans.plan import Plan, PlanNode

    base = PlanNode(LogicalValues(((1,),), ("n",), ("bigint",)), [])
    step = PlanNode(LogicalCTERef("r", ("n",)), [])
    plan = Plan(
        PlanNode(
            LogicalRecursiveCTE("r", ("n",), distinct=False, max_iter=3),
            [base, step],
        )
    )
    cat = _tc(SF_DIR_ORACLE)
    with pytest.raises(RuntimeError, match="max_iter"):
        to_spark(plan, spark, cat).collect()
