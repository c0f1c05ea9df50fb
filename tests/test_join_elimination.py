"""Redundant LEFT-join elimination (r6).

``Projection(LeftJoin(L, R))`` drops the join when the projection never
touches R and the join key pins a DECLARED-unique column of R: a left
join preserves every L row, and a unique right key means at most one
match — the join changes nothing the projection can see.  This is the
join culling that makes denormalized views cheap: querying two columns
of a ten-dimension view scans one table.

Uniqueness comes ONLY from declared constraints
(``Catalog.register_unique_key`` — metastore-style); approximate ndv is
never trusted, because a wrong uniqueness guess silently duplicates
rows.  INNER joins are never eliminated (an unmatched or NULL FK row
would wrongly survive).
"""

from __future__ import annotations

import duckdb

from datafusion_dolomite_spark import QueryPlanner
from datafusion_dolomite_spark import testdata_catalog as _tc
from datafusion_dolomite_spark.sql import parse_sql

from .conftest import SF_DIR_ORACLE


def _has_join(text: str) -> bool:
    return "Join" in text


def test_unused_unique_left_join_eliminated(planner, catalog):
    q = (
        "select c_name, c_acctbal from customer "
        "left join nation on c_nationkey = n_nationkey"
    )
    logical = planner.optimize_logical(parse_sql(q, catalog))
    txt = logical.explain()
    assert not _has_join(txt), txt
    assert "nation" not in txt, txt


def test_right_column_reference_keeps_join(planner, catalog):
    q = (
        "select c_name, n_name from customer "
        "left join nation on c_nationkey = n_nationkey"
    )
    assert _has_join(planner.optimize_logical(parse_sql(q, catalog)).explain())


def test_non_unique_key_keeps_join(planner, catalog):
    """orders.o_custkey is NOT unique — each customer matches many
    orders, so the left join duplicates rows and must stay."""
    q = "select c_name from customer left join orders on c_custkey = o_custkey"
    assert _has_join(planner.optimize_logical(parse_sql(q, catalog)).explain())


def test_inner_join_never_eliminated(planner, catalog):
    """INNER join drops unmatched / NULL-FK rows — eliminating it would
    wrongly keep them, so uniqueness alone is not enough."""
    q = "select c_name from customer join nation on c_nationkey = n_nationkey"
    assert _has_join(planner.optimize_logical(parse_sql(q, catalog)).explain())


def test_undeclared_key_keeps_join(spark):
    """Same plan shape, but a catalog WITHOUT the unique declaration:
    the rule must not fire — constraints are opt-in, not inferred."""
    from datafusion_dolomite_spark.sources.catalog import Catalog
    import os

    cat = Catalog(
        {
            t: os.path.join(SF_DIR_ORACLE, f"{t}.parquet")
            for t in ("customer", "nation")
        }
    )
    qp = QueryPlanner(spark, cat)
    q = (
        "select c_name, c_acctbal from customer "
        "left join nation on c_nationkey = n_nationkey"
    )
    assert _has_join(qp.optimize_logical(parse_sql(q, cat)).explain())


def test_elimination_preserves_semantics(spark):
    cat = _tc(SF_DIR_ORACLE)
    qp = QueryPlanner(spark, cat)
    q = (
        "select c_name, c_acctbal from customer "
        "left join nation on c_nationkey = n_nationkey"
    )
    con = duckdb.connect()
    for t in ("customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR_ORACLE}/{t}.parquet')"
        )
    got = sorted(tuple(r) for r in qp.sql(q).collect())
    want = sorted(con.execute(q).fetchall())
    assert got == want
