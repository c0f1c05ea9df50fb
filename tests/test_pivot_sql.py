"""SQL PIVOT / UNPIVOT FROM-clause operators (sql.py::_pivot_item)."""

import pytest

from datafusion_dolomite_spark.sql import SqlError


def test_unpivot_roundtrip(spark, planner):
    df = planner.sql(
        "SELECT o_orderkey, k, v FROM "
        "(SELECT o_orderkey, o_custkey AS a, o_orderkey * 2 AS b FROM orders) "
        "UNPIVOT (v FOR k IN (a, b))"
    )
    rows = df.collect()
    n_orders = planner.sql("SELECT count(*) AS n FROM orders").collect()[0]["n"]
    assert len(rows) == 2 * n_orders
    assert {r["k"] for r in rows} == {"a", "b"}


def test_unpivot_no_shuffle(spark, planner):
    df = planner.sql(
        "SELECT o_orderkey, k, v FROM "
        "(SELECT o_orderkey, o_custkey AS a, o_orderkey * 2 AS b FROM orders) "
        "UNPIVOT (v FOR k IN (a, b))"
    )
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in phys  # map-only melt


def test_pivot_equals_case_aggregate(spark, planner):
    # project the input first: PIVOT groups by EVERY remaining column
    got = planner.sql(
        "SELECT o_custkey, f, o FROM "
        "(SELECT o_custkey, o_orderstatus, o_orderkey FROM orders) "
        "PIVOT (count(o_orderkey) FOR o_orderstatus IN ('F' AS f, 'O' AS o))"
    )
    want = planner.sql(
        "SELECT o_custkey, "
        "count(CASE WHEN o_orderstatus = 'F' THEN o_orderkey ELSE NULL END) AS f, "
        "count(CASE WHEN o_orderstatus = 'O' THEN o_orderkey ELSE NULL END) AS o "
        "FROM orders GROUP BY o_custkey"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_pivot_default_cell_names(spark, planner):
    df = planner.sql(
        "SELECT o_custkey FROM orders "
        "PIVOT (max(o_totalprice) FOR o_orderstatus IN ('F', 'O'))"
    )
    # unnamed cells take the literal's string form as the column name
    inner = planner.sql(
        "SELECT * FROM orders "
        "PIVOT (max(o_totalprice) FOR o_orderstatus IN ('F', 'O'))"
    )
    assert "F" in inner.columns and "O" in inner.columns
    assert df.count() > 0


def test_pivot_alias_register(spark, planner):
    df = planner.sql(
        "SELECT p.o_custkey, p.f FROM orders "
        "PIVOT (count(o_orderkey) FOR o_orderstatus IN ('F' AS f)) AS p"
    )
    assert df.count() > 0


def test_pivot_in_list_requires_literals(spark, planner):
    with pytest.raises(SqlError, match="literals"):
        planner.sql(
            "SELECT * FROM orders "
            "PIVOT (count(o_orderkey) FOR o_orderstatus IN (o_custkey))"
        )


def test_unpivot_excludes_nulls_by_default(spark, planner):
    """Standard SQL / DuckDB UNPIVOT drops rows whose value cell is
    NULL (r11, ADVICE r10): Spark's raw ``DataFrame.unpivot`` keeps
    them, so the executor filters — the same string now means the same
    thing on both engines.  ``INCLUDE NULLS`` opts back in."""
    base = (
        "SELECT k, nm, vl FROM "
        "(SELECT c_custkey AS k, c_custkey AS a, "
        " cast(CASE WHEN c_custkey % 2 = 0 THEN c_custkey END AS bigint) AS b "
        " FROM customer WHERE c_custkey <= 10) "
    )
    out = planner.sql(base + "UNPIVOT (vl FOR nm IN (a, b))").collect()
    # custkeys 0..10: the 5 odd ones have NULL b → those rows drop;
    # all 11 a rows stay
    assert len(out) == 11 + 6
    assert all(r.vl is not None for r in out)
    kept = planner.sql(
        base + "UNPIVOT INCLUDE NULLS (vl FOR nm IN (a, b))"
    ).collect()
    assert len(kept) == 22
    assert sum(1 for r in kept if r.vl is None) == 5


def test_unpivot_mixed_types_rejected(spark, planner):
    with pytest.raises(Exception, match="share one type"):
        planner.sql(
            "SELECT * FROM orders UNPIVOT (v FOR k IN (o_custkey, o_orderstatus))"
        ).collect()


def test_group_by_all(spark, planner):
    got = planner.sql(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n "
        "FROM orders GROUP BY ALL"
    )
    want = planner.sql(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n "
        "FROM orders GROUP BY o_orderstatus, o_orderpriority"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_group_by_all_requires_plain_item(spark, planner):
    with pytest.raises(SqlError, match="non-aggregate"):
        planner.sql("SELECT count(*) AS n FROM orders GROUP BY ALL")


def test_order_by_all_desc_limit(spark, planner):
    got = planner.sql(
        "SELECT o_orderstatus AS s, count(*) AS n FROM orders "
        "GROUP BY ALL ORDER BY ALL DESC LIMIT 2"
    ).collect()
    want = planner.sql(
        "SELECT o_orderstatus AS s, count(*) AS n FROM orders "
        "GROUP BY o_orderstatus ORDER BY s DESC, n DESC LIMIT 2"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_distinct_on_argmax(spark, planner):
    got = planner.sql(
        "SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice "
        "FROM orders ORDER BY o_custkey, o_totalprice DESC, o_orderkey"
    ).collect()
    # one row per customer; it must be that customer's argmax order
    per_cust = {}
    for r in planner.sql(
        "SELECT o_custkey, o_orderkey, o_totalprice FROM orders"
    ).collect():
        cand = (-r.o_totalprice, r.o_orderkey)
        if r.o_custkey not in per_cust or cand < per_cust[r.o_custkey][0]:
            per_cust[r.o_custkey] = (cand, r.o_orderkey)
    assert {(r.o_custkey, r.o_orderkey) for r in got} == {
        (c, k) for c, (_, k) in per_cust.items()
    }


def test_distinct_on_nonoutput_key_rejected(spark, planner):
    with pytest.raises(SqlError, match="must be output columns"):
        planner.sql(
            "SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey "
            "FROM orders ORDER BY o_custkey, o_totalprice DESC"
        )


def test_distinct_on_requires_order_by(spark, planner):
    with pytest.raises(SqlError, match="requires an ORDER BY"):
        planner.sql("SELECT DISTINCT ON (o_custkey) o_custkey FROM orders")


def test_star_exclude_prunes_scan(spark, planner):
    df = planner.sql(
        "SELECT * EXCLUDE (o_orderdate, o_totalprice, o_orderpriority) "
        "FROM orders"
    )
    assert df.columns == ["o_orderkey", "o_custkey", "o_orderstatus"]
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "o_orderdate" not in phys.split("ReadSchema")[1][:200]


def test_star_exclude_unknown_column(spark, planner):
    with pytest.raises(SqlError, match="unknown"):
        planner.sql("SELECT * EXCLUDE (nope) FROM orders")


def test_star_replace_keeps_position(spark, planner):
    df = planner.sql(
        "SELECT * REPLACE (o_orderkey * 2 AS o_orderkey) FROM orders "
        "ORDER BY o_orderkey LIMIT 3"
    )
    rows = df.collect()
    assert df.columns[0] == "o_orderkey"
    assert all(r.o_orderkey % 2 == 0 for r in rows)


def test_filter_clause_equals_case(spark, planner):
    got = planner.sql(
        "SELECT o_orderstatus, count(*) FILTER (WHERE o_totalprice > 100000) AS n, "
        "min(o_orderkey) FILTER (WHERE o_orderkey > 10) AS mn "
        "FROM orders GROUP BY o_orderstatus"
    )
    want = planner.sql(
        "SELECT o_orderstatus, "
        "count(CASE WHEN o_totalprice > 100000 THEN 1 ELSE NULL END) AS n, "
        "min(CASE WHEN o_orderkey > 10 THEN o_orderkey ELSE NULL END) AS mn "
        "FROM orders GROUP BY o_orderstatus"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_filter_clause_global_aggregate(spark, planner):
    r = planner.sql(
        "SELECT count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f, "
        "count(*) AS n FROM orders"
    ).collect()[0]
    assert 0 < r["n_f"] < r["n"]


def test_filter_keyword_still_an_identifier(spark, planner):
    # 'filter' as a plain column alias must keep working
    df = planner.sql("SELECT o_orderkey AS filter FROM orders LIMIT 3")
    assert df.columns == ["filter"]
