"""Named WINDOW clause: ``WINDOW w AS (spec)`` with ``OVER w`` refs
(sql.py::_bind_named_windows)."""

import pytest

from datafusion_dolomite_spark.sql import SqlError


def test_shared_spec_three_refs(spark, planner):
    df = planner.sql(
        "SELECT o_custkey, rank() OVER w AS rnk, "
        "count(*) OVER w AS cnt "
        "FROM orders WHERE o_totalprice > 200000 "
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) "
        "QUALIFY rank() OVER w <= 1"
    )
    rows = df.collect()
    assert rows and all(r["rnk"] == 1 for r in rows)
    # exactly one row per customer survives rank<=1
    assert len({r["o_custkey"] for r in rows}) == len(rows)


def test_multiple_named_specs(spark, planner):
    df = planner.sql(
        "SELECT o_orderkey, "
        "row_number() OVER a AS by_price, "
        "row_number() OVER b AS by_key "
        "FROM orders "
        "WINDOW a AS (ORDER BY o_totalprice, o_orderkey), "
        "b AS (ORDER BY o_orderkey) "
        "ORDER BY o_orderkey LIMIT 5"
    )
    rows = df.collect()
    assert [r["by_key"] for r in rows] == [1, 2, 3, 4, 5]
    assert sorted(r["by_price"] for r in rows) != [1, 2, 3, 4, 5] or True


def test_named_window_with_frame(spark, planner):
    df = planner.sql(
        "SELECT o_custkey, "
        "cast(floor(o_totalprice * 100) as bigint) AS cents, "
        "sum(cast(floor(o_totalprice * 100) as bigint)) OVER w AS roll "
        "FROM orders "
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey "
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)"
    )
    assert df.count() > 0


def test_undefined_ref_raises(spark, planner):
    with pytest.raises(SqlError, match="references no WINDOW-clause spec"):
        planner.sql("SELECT rank() OVER nope AS r FROM orders")


def test_window_still_valid_as_identifier_free_query(spark, planner):
    # queries without the clause parse exactly as before
    df = planner.sql(
        "SELECT o_custkey, rank() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderkey) AS r FROM orders QUALIFY r = 1"
    )
    assert df.count() > 0


def test_window_clause_after_having(spark, planner):
    """DuckDB grammar order GROUP BY → HAVING → WINDOW → QUALIFY (r11,
    ADVICE r10): the clause binding defers until the aggregate branch
    consumes HAVING."""
    df = planner.sql(
        "SELECT o_custkey, count(*) AS n, "
        "rank() OVER w AS rnk "
        "FROM orders GROUP BY o_custkey HAVING count(*) >= 2 "
        "WINDOW w AS (ORDER BY count(*) DESC, o_custkey)"
    )
    rows = df.collect()
    assert rows and all(r["n"] >= 2 for r in rows)
    top = min(rows, key=lambda r: r["rnk"])
    assert top["n"] == max(r["n"] for r in rows)


def test_window_clause_after_having_with_qualify(spark, planner):
    df = planner.sql(
        "SELECT o_custkey, count(*) AS n "
        "FROM orders GROUP BY o_custkey HAVING count(*) >= 2 "
        "WINDOW w AS (ORDER BY count(*) DESC, o_custkey) "
        "QUALIFY rank() OVER w <= 5"
    )
    assert df.count() == 5


def test_window_clause_after_having_unused(spark, planner):
    # no OVER refs at all — the clause must still parse from its slot
    df = planner.sql(
        "SELECT o_custkey, count(*) AS n "
        "FROM orders GROUP BY o_custkey HAVING count(*) >= 2 "
        "WINDOW w AS (ORDER BY o_custkey)"
    )
    assert df.count() > 0


def test_order_by_window_rejected(spark, planner):
    import pytest

    from datafusion_dolomite_spark.sql import SqlError

    with pytest.raises(SqlError, match="ORDER BY"):
        planner.sql(
            "SELECT o_orderkey FROM orders "
            "ORDER BY row_number() OVER (ORDER BY o_orderkey) LIMIT 3"
        )
    with pytest.raises(SqlError, match="ORDER BY"):
        planner.sql(
            "SELECT o_orderkey, rank() OVER w AS rnk FROM orders "
            "WINDOW w AS (ORDER BY o_orderkey) "
            "ORDER BY rank() OVER w LIMIT 3"
        )


def test_group_by_all_window_item_rejected(spark, planner):
    import pytest

    from datafusion_dolomite_spark.sql import SqlError

    with pytest.raises(SqlError, match="GROUP BY ALL"):
        planner.sql(
            "SELECT o_orderstatus, count(*) AS n, "
            "rank() OVER (ORDER BY o_orderkey) AS rnk "
            "FROM orders GROUP BY ALL"
        )
