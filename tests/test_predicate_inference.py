"""Transitive predicate inference across inner equi-joins (r6).

``customer.c_custkey < K ⋈ orders ON c_custkey = o_custkey`` must not
scan all of orders: under the equi-condition every surviving pair has
equal keys, so the literal predicate maps to the other side and the
pushdown rules drive it into THAT scan too — where parquet
``PushedFilters``, partition pruning and footer min/max file skipping
all see it.  ``InferJoinKeyPredicateRule`` (optimizer/rules/pushdown.py)
runs in the Hep fixed point, so multi-hop chains (nation → supplier →
customer) converge in as many passes as hops.
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_dolomite_spark.operators.logical import LogicalScan
from datafusion_dolomite_spark.sql import parse_sql

from .conftest import SF_DIR_ORACLE


def _scan_filters(plan) -> dict:
    """table name → pretty-printed scan filters, walked over the tree."""
    out = {}

    def walk(node):
        op = node.operator
        if isinstance(op, LogicalScan):
            out[op.table_name] = [f.pretty() for f in (op.filters or ())]
        for c in node.inputs:
            walk(c)

    walk(plan.root)
    return out


def test_single_hop_infers_onto_other_scan(planner, catalog):
    q = (
        "select count(*) as n from customer "
        "join orders on c_custkey = o_custkey where c_custkey < 500"
    )
    logical = planner.optimize_logical(parse_sql(q, catalog))
    filters = _scan_filters(logical)
    assert "(c_custkey < 500)" in filters["customer"]
    assert "(o_custkey < 500)" in filters["orders"]


def test_multi_hop_chain_converges(planner, catalog):
    """nation's key filter reaches supplier AND customer through two
    equi-hops — the Hep fixed point carries it one join per pass."""
    q = (
        "select count(*) as n from customer "
        "join supplier on c_nationkey = s_nationkey "
        "join nation on s_nationkey = n_nationkey "
        "where n_nationkey < 10"
    )
    logical = planner.optimize_logical(parse_sql(q, catalog))
    filters = _scan_filters(logical)
    assert "(n_nationkey < 10)" in filters["nation"]
    assert "(s_nationkey < 10)" in filters["supplier"]
    assert "(c_nationkey < 10)" in filters["customer"]


def test_non_key_predicates_do_not_travel(planner, catalog):
    """Only JOIN-KEY predicates map across; a filter on a non-key
    column stays on its own side."""
    q = (
        "select count(*) as n from customer "
        "join orders on c_custkey = o_custkey where c_acctbal > 0.0"
    )
    logical = planner.optimize_logical(parse_sql(q, catalog))
    filters = _scan_filters(logical)
    assert any("c_acctbal" in f for f in filters["customer"])
    assert not any("c_acctbal" in f or "acctbal" in f for f in filters["orders"])


def test_outer_joins_excluded(planner, catalog):
    """LEFT JOIN must NOT receive inferred filters: pre-filtering the
    preserved side would drop rows the outer join must keep."""
    q = (
        "select count(*) as n from customer "
        "left join orders on c_custkey = o_custkey where c_custkey < 100"
    )
    logical = planner.optimize_logical(parse_sql(q, catalog))
    filters = _scan_filters(logical)
    assert not any("o_custkey < 100" in f for f in filters.get("orders", []))


@pytest.mark.parametrize(
    "q",
    [
        "select count(*) as n, sum(o_orderkey) as s from customer "
        "join orders on c_custkey = o_custkey where c_custkey < 500",
        "select count(*) as n from customer "
        "join supplier on c_nationkey = s_nationkey "
        "join nation on s_nationkey = n_nationkey where n_nationkey < 10",
        "select count(*) as n from customer join orders "
        "on c_custkey = o_custkey where c_custkey != 7 and c_custkey >= 100",
        "select count(*) as n from customer join orders "
        "on c_custkey = o_custkey where o_custkey = 42",
    ],
)
def test_inference_preserves_semantics(spark, q):
    """Engine result (with inference) must equal DuckDB (no inference)
    at the oracle sf — =, !=, range, and reverse-direction cases."""
    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark import testdata_catalog as _tc

    cat = _tc(SF_DIR_ORACLE)
    qp = QueryPlanner(spark, cat)
    con = duckdb.connect()
    for t in ("customer", "orders", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR_ORACLE}/{t}.parquet')"
        )
    got = [int(x) for x in qp.sql(q).collect()[0]]
    want = [int(x) for x in con.execute(q).fetchone()]
    assert got == want
