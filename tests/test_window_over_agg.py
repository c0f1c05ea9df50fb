"""Window functions over GROUP BY output (sql.py's lift-then-lower
path): aggregate calls anywhere in the select list, window arguments,
partition/order keys, or HAVING are lifted into aggregate outputs, then
windows are lowered over the aggregate's result."""

from __future__ import annotations

import duckdb
import pytest

from datafusion_dolomite_spark.sql import SqlError, parse_sql

SF = "/root/testdata/sf0.001"

CASES = [
    "SELECT o_orderstatus, count(*) AS n, "
    "rank() OVER (ORDER BY count(*) DESC) AS r "
    "FROM orders GROUP BY o_orderstatus",
    "SELECT c_nationkey, c_mktsegment, count(*) AS n, "
    "row_number() OVER (PARTITION BY c_nationkey "
    "ORDER BY count(*) DESC, c_mktsegment) AS rnk "
    "FROM customer GROUP BY c_nationkey, c_mktsegment",
    "SELECT event_type, "
    "cast(sum(cast(floor(value*100) as bigint)) as bigint) AS cents, "
    "rank() OVER (ORDER BY sum(cast(floor(value*100) as bigint)) DESC) AS r "
    "FROM events GROUP BY event_type HAVING count(*) > 2",
    # share-of-total: window AGGREGATE over a group aggregate
    "SELECT o_orderpriority, count(*) AS n, "
    "cast(floor(count(*) * 1000 / sum(count(*)) OVER ()) as bigint) AS permille "
    "FROM orders GROUP BY o_orderpriority",
    # QUALIFY over aggregation via the select-list window alias
    "SELECT c_nationkey, count(*) AS n, "
    "rank() OVER (ORDER BY count(*) DESC) AS r "
    "FROM customer GROUP BY c_nationkey QUALIFY r <= 3",
    # HAVING then QUALIFY, window living only inside QUALIFY
    "SELECT c_nationkey, count(*) AS n FROM customer GROUP BY c_nationkey "
    "HAVING count(*) > 2 "
    "QUALIFY row_number() OVER (ORDER BY count(*) DESC, c_nationkey) <= 5",
    # top-k per group by aggregate (the group-wise top-n idiom)
    "SELECT c_nationkey, c_mktsegment, count(*) AS n FROM customer "
    "GROUP BY c_nationkey, c_mktsegment "
    "QUALIFY row_number() OVER (PARTITION BY c_nationkey "
    "ORDER BY count(*) DESC, c_mktsegment) <= 3",
    # -- r12: windows over ROLLUP/CUBE/GROUPING SETS output ---------
    # share-of-total per rollup level (subtotal rows carry NULL keys
    # and partition like any other row, identically in DuckDB)
    "SELECT o_orderstatus AS st, o_orderpriority AS pr, count(*) AS n, "
    "cast(floor(100.0 * count(*) / "
    "     sum(count(*)) OVER (PARTITION BY o_orderstatus)) AS bigint) AS share "
    "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)",
    # rank over CUBE output
    "SELECT o_orderstatus AS st, o_orderpriority AS pr, count(*) AS n, "
    "rank() OVER (ORDER BY count(*) DESC) AS rnk "
    "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)",
    # GROUPING() in select, window partition, and HAVING over sets
    "SELECT o_orderstatus AS st, "
    "cast(grouping(o_orderstatus) AS bigint) AS g, count(*) AS n, "
    "rank() OVER (PARTITION BY grouping(o_orderstatus) "
    "ORDER BY count(*) DESC, o_orderstatus NULLS LAST) AS rnk "
    "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), ())",
    # plain GROUPING() select item over rollup (no window)
    "SELECT o_orderstatus AS st, "
    "cast(grouping(o_orderstatus) AS bigint) AS g, count(*) AS n "
    "FROM orders GROUP BY ROLLUP (o_orderstatus) "
    "HAVING grouping(o_orderstatus) = 0 OR count(*) > 10",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("orders", "customer", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("q", CASES, ids=range(len(CASES)))
def test_window_over_group_by_matches_duckdb(planner, ddb, q):
    def _k(rows):
        # rollup subtotal rows carry NULL keys — None-safe sort
        return sorted(tuple((v is None, v) for v in r) for r in rows)

    got = _k(map(tuple, planner.sql(q).collect()))
    want = _k(ddb.execute(q).fetchall())
    assert got == want and got, q


def test_plan_shape_window_above_aggregate(planner, catalog):
    plan = planner.optimize_logical(parse_sql(CASES[0], catalog))
    text = plan.explain()
    assert text.index("LogicalWindow") < text.index("LogicalAggregate"), text


def test_rollup_with_window_parses(catalog):
    # rejected until r11; r12 extends lift-then-lower to grouping sets
    plan = parse_sql(
        "SELECT o_orderstatus, count(*) AS n, "
        "rank() OVER (ORDER BY count(*)) AS r "
        "FROM orders GROUP BY ROLLUP (o_orderstatus)",
        catalog,
    )
    text = plan.explain()
    assert text.index("LogicalWindow") < text.index("LogicalAggregate")
    assert "rollup" in text.lower()
