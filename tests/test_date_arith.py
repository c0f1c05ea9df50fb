"""DATE/TIMESTAMP literals + INTERVAL arithmetic (sql.py::_date_arith):
lowered to timestamp_add, whose semantics match DuckDB's native
interval arithmetic (clamping, time preservation, DATE -> midnight
TIMESTAMP) — the cross-engine check lives in test_entry_oracle
(q_sql_date_arith); these pin semantics and the error surface."""

import datetime

import pytest

from datafusion_dolomite_spark.sql import SqlError


def test_month_clamping(planner):
    rows = planner.sql(
        "select date '1995-01-31' + interval 1 month as m, "
        "date '1996-02-29' + interval '1' year as y, "
        "date '1995-03-31' - interval 1 month as b"
    ).collect()
    assert rows[0]["m"] == datetime.datetime(1995, 2, 28)
    assert rows[0]["y"] == datetime.datetime(1997, 2, 28)
    assert rows[0]["b"] == datetime.datetime(1995, 2, 28)


def test_time_preserved_on_timestamps(planner):
    rows = planner.sql(
        "select timestamp '1995-01-31 10:30:00' + interval 1 month as m, "
        "timestamp '1995-01-01 23:00:00' + interval 2 hour as h"
    ).collect()
    assert rows[0]["m"] == datetime.datetime(1995, 2, 28, 10, 30)
    assert rows[0]["h"] == datetime.datetime(1995, 1, 2, 1, 0)


def test_interval_commutes_and_week(planner):
    rows = planner.sql(
        "select interval 2 week + date '1995-01-01' as w"
    ).collect()
    assert rows[0]["w"] == datetime.datetime(1995, 1, 15)


def test_tpch_window_idiom_pushes_down(planner):
    df = planner.sql(
        "select count(*) as n from lineitem "
        "where l_shipdate >= date '1995-01-01' "
        "and l_shipdate < date '1995-01-01' + interval '3' month"
    )
    assert df.collect()[0]["n"] > 0
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in phys and "l_shipdate" in phys.split(
        "PushedFilters"
    )[1][:200]


def test_interval_outside_arithmetic_rejected(planner):
    with pytest.raises(SqlError, match="INTERVAL"):
        planner.sql("select interval 3 day as x from orders")
    with pytest.raises(SqlError, match="INTERVAL"):
        planner.sql(
            "select count(*) as n from orders "
            "where o_orderdate > interval 3 day - date '1995-01-01'"
        )
    with pytest.raises(SqlError, match="unit"):
        planner.sql(
            "select date '1995-01-01' + interval 3 fortnight as x"
        )
    # ADVICE r11: the marker must not escape through non-additive
    # operators either — parse-time SqlError, never a deep raw error
    for bad in (
        "select interval 3 day * 2 as x",
        "select 2 * interval 3 day as x",
        "select interval 3 day::text as x",
        "select (interval 3 day) as x",
        "select 1 as x where interval 1 day > interval 2 day",
        "select (interval 1 day) and true as x",
    ):
        with pytest.raises(SqlError, match="INTERVAL"):
            planner.sql(bad)


def test_interval_plus_interval_merges(planner):
    """INTERVAL ± INTERVAL (r12): components merge into DuckDB's
    (months, days, seconds) triple and apply coarse-to-fine in ONE
    month-level add — chained clamping would diverge at month ends."""
    rows = planner.sql(
        "select date '2024-01-31' + (interval 1 month + interval 1 month) as m2, "
        "date '2024-01-31' + interval 1 month + interval 1 month as chained, "
        "date '1995-01-31' + (interval 1 quarter + interval 1 month) as q4, "
        "date '1995-01-15' + (interval 1 month + interval 3 day) as mixed, "
        "date '1995-03-15' - (interval 1 month + interval 10 day) as sub, "
        "date '1995-01-15' + (interval 2 month - interval 40 day) as neg"
    ).collect()
    r = rows[0]
    assert r["m2"] == datetime.datetime(2024, 3, 31)  # one 2-month add
    assert r["chained"] == datetime.datetime(2024, 3, 29)  # two clamps
    assert r["q4"] == datetime.datetime(1995, 5, 31)
    assert r["mixed"] == datetime.datetime(1995, 2, 18)
    assert r["sub"] == datetime.datetime(1995, 2, 5)
    assert r["neg"] == datetime.datetime(1995, 2, 3)


def test_group_order_by_ordinals(planner):
    # standard SQL ordinals — DuckDB and Spark resolve identically
    got = planner.sql(
        "select o_orderstatus, o_orderpriority, count(*) as n "
        "from orders group by 1, 2 order by 1, 2 limit 5"
    ).collect()
    want = planner.sql(
        "select o_orderstatus, o_orderpriority, count(*) as n "
        "from orders group by o_orderstatus, o_orderpriority "
        "order by o_orderstatus, o_orderpriority limit 5"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    got2 = planner.sql(
        "select o_orderstatus as s, count(*) as n from orders "
        "group by 1 order by 2 desc, 1 limit 2"
    ).collect()
    want2 = planner.sql(
        "select o_orderstatus as s, count(*) as n from orders "
        "group by o_orderstatus order by n desc, s limit 2"
    ).collect()
    assert [tuple(r) for r in got2] == [tuple(r) for r in want2]


def test_ordinal_out_of_range(planner):
    import pytest

    from datafusion_dolomite_spark.sql import SqlError

    with pytest.raises(SqlError, match="out of range"):
        planner.sql("select o_orderstatus from orders group by 3")
    with pytest.raises(SqlError, match="out of range"):
        planner.sql(
            "select o_orderstatus from orders order by 2 limit 1"
        )
    with pytest.raises(SqlError, match="aggregate"):
        planner.sql(
            "select count(*) as n from orders group by 1"
        )


def test_group_by_select_alias(planner):
    # DuckDB rule: a GROUP BY name no input column carries resolves to
    # the select-item alias; real columns take precedence
    got = planner.sql(
        "select upper(o_orderstatus) as st, count(*) as n "
        "from orders group by st order by st"
    ).collect()
    want = planner.sql(
        "select upper(o_orderstatus) as st, count(*) as n "
        "from orders group by upper(o_orderstatus) order by st"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_union_by_name_and_distinct_aggs(planner):
    rows = planner.sql(
        "select n_name as a, n_nationkey as k from nation "
        "where n_nationkey < 3 "
        "union all by name "
        "select n_regionkey as r, n_name as a, n_nationkey as k "
        "from nation where n_nationkey < 2"
    )
    assert rows.columns == ["a", "k", "r"]
    got = rows.collect()
    assert len(got) == 5
    assert sum(1 for r in got if r["r"] is None) == 3  # null-filled side
    # distinct union by name dedups over the unified schema
    d = planner.sql(
        "select n_nationkey as k from nation where n_nationkey < 3 "
        "union by name "
        "select n_nationkey as k, n_regionkey as r from nation "
        "where n_nationkey < 3"
    ).collect()
    assert len(d) == 6  # (k, NULL) and (k, r) rows are distinct
    agg = planner.sql(
        "select cast(sum(distinct o_custkey) as bigint) as sd, "
        "min(distinct o_orderkey) as mn from orders"
    ).collect()[0]
    exact = planner.sql(
        "select cast(sum(k) as bigint) as sd from "
        "(select distinct o_custkey as k from orders)"
    ).collect()[0]
    assert agg["sd"] == exact["sd"] and agg["mn"] == 0


def test_distinct_unsupported_aggregate_rejected(planner):
    import pytest

    from datafusion_dolomite_spark.sql import SqlError

    with pytest.raises(SqlError, match="DISTINCT"):
        planner.sql("select avg(distinct o_totalprice) as a from orders")


def test_ungrouped_select_item_clean_error(planner):
    import pytest

    from datafusion_dolomite_spark.sql import SqlError

    with pytest.raises(SqlError, match="outside the GROUP BY"):
        planner.sql(
            "select o_orderstatus as k0, o_orderpriority as k1, "
            "count(*) as n from orders "
            "group by grouping sets ((o_orderpriority), ())"
        )
    with pytest.raises(SqlError, match="outside the GROUP BY"):
        planner.sql(
            "select o_orderstatus, o_custkey, count(*) as n "
            "from orders group by o_orderstatus"
        )
    # expressions over grouped columns stay legal
    assert planner.sql(
        "select upper(o_orderstatus) as u, count(*) as n "
        "from orders group by o_orderstatus"
    ).count() > 0


def test_string_agg_requires_order_by(planner):
    import pytest

    from datafusion_dolomite_spark.sql import SqlError

    with pytest.raises(SqlError, match="ORDER BY"):
        planner.sql(
            "select string_agg(n_name, ',') as s from nation"
        )
    with pytest.raises(SqlError, match="string_agg"):
        planner.sql(
            "select sum(n_nationkey order by n_name) as s from nation"
        )


def test_string_agg_ordered_values(planner):
    rows = planner.sql(
        "select string_agg(n_name, ',' order by n_nationkey) as s "
        "from nation where n_nationkey < 4"
    ).collect()
    names = [
        r.n_name
        for r in planner.sql(
            "select n_name, n_nationkey from nation "
            "where n_nationkey < 4 order by n_nationkey"
        ).collect()
    ]
    assert rows[0]["s"] == ",".join(names)


def test_string_agg_desc_tiebreak_and_null_keys(planner):
    """ADVICE r11: DESC must NOT flip the value tiebreak (ties stay
    value-ASC) and NULL sort keys go LAST in both directions (DuckDB's
    default null order)."""
    # every nation in a region shares the key → pure tie: value-ASC
    asc_s = planner.sql(
        "select string_agg(n_name, ',' order by n_regionkey) as s "
        "from nation where n_regionkey = 1"
    ).collect()[0]["s"]
    desc_s = planner.sql(
        "select string_agg(n_name, ',' order by n_regionkey desc) as s "
        "from nation where n_regionkey = 1"
    ).collect()[0]["s"]
    assert asc_s == desc_s == ",".join(sorted(asc_s.split(",")))
    # NULL keys last, then value-ASC among them
    s = planner.sql(
        "select string_agg(n_name, ',' order by case when n_nationkey < 3 "
        "then null else n_nationkey end) as s from nation "
        "where n_nationkey < 6"
    ).collect()[0]["s"]
    assert s.split(",") == [
        "NATION_3", "NATION_4", "NATION_5",
        "NATION_0", "NATION_1", "NATION_2",
    ]
    # multi-key ORDER BY (r12): tied first key totalized by the second
    m = planner.sql(
        "select string_agg(n_name, ',' order by n_regionkey, "
        "n_nationkey desc) as s from nation where n_regionkey = 1"
    ).collect()[0]["s"]
    ref = [
        r.n_name
        for r in planner.sql(
            "select n_name from nation where n_regionkey = 1 "
            "order by n_nationkey desc"
        ).collect()
    ]
    assert m == ",".join(ref)


def test_columns_regex_star(planner):
    df = planner.sql(
        "select columns('quantity|discount'), l_orderkey as k "
        "from lineitem where l_orderkey < 5"
    )
    assert df.columns == ["l_quantity", "l_discount", "k"]
    assert df.count() > 0

    import pytest

    from datafusion_dolomite_spark.sql import SqlError

    with pytest.raises(SqlError, match="top-level"):
        planner.sql("select min(columns('l_.*key')) as m from lineitem")
    with pytest.raises(SqlError, match="matched no"):
        planner.sql("select columns('zzz') from lineitem")


def test_describe_table(planner):
    rows = planner.sql("describe nation").collect()
    assert [(r.col_name, r.data_type) for r in rows] == [
        ("n_nationkey", "int"),
        ("n_name", "string"),
        ("n_regionkey", "int"),
    ]
    assert planner.sql("DESC TABLE region").count() == 2


def test_sql_idiom_batch(planner):
    """Simple CASE, EXTRACT, ::cast, SUBSTRING FROM/FOR, POSITION,
    ILIKE, IS [NOT] DISTINCT FROM, JOIN USING — DuckDB cross-checks run
    in the r11 idiom probe; these pin the lowerings."""
    r = planner.sql(
        "select case o_orderstatus when 'F' then 1 when 'O' then 2 "
        "else 0 end as s, count(*) as n from orders group by s"
    ).collect()
    assert {row.s for row in r} <= {0, 1, 2}
    r = planner.sql(
        "select extract(year from o_orderdate) as y from orders limit 1"
    ).collect()
    assert 1990 <= r[0].y <= 2000
    r = planner.sql(
        "select (o_totalprice * 100)::bigint as cents, "
        "substring(o_orderpriority from 1 for 2) as p, "
        "position('-' in o_orderpriority) as pos "
        "from orders where o_orderkey = 1"
    ).collect()[0]
    assert isinstance(r.cents, int) and len(r.p) == 2 and r.pos == 2
    a = planner.sql(
        "select count(*) as n from orders "
        "where o_orderpriority ilike '%URGENT%'"
    ).collect()[0].n
    b = planner.sql(
        "select count(*) as n from orders "
        "where lower(o_orderpriority) like '%urgent%'"
    ).collect()[0].n
    assert a == b > 0
    # null-safe: NULL is not distinct from NULL
    r = planner.sql(
        "select count(*) as n from orders "
        "where nullif(o_orderstatus, o_orderstatus) "
        "is not distinct from null"
    ).collect()[0].n
    assert r == planner.sql("select count(*) as n from orders").collect()[0].n
    # JOIN USING keeps one key copy
    df = planner.sql(
        "select n_name, r_name from nation join "
        "(select r_regionkey as n_regionkey, r_name from region) r "
        "using (n_regionkey)"
    )
    assert df.columns == ["n_name", "r_name"]
    assert df.count() == 25
    # expression group keys with string-literal args (the aliased-key
    # executor fix)
    r = planner.sql(
        "select concat(o_orderstatus, '-') as s, count(*) as n "
        "from orders group by s"
    ).collect()
    assert all(row.s.endswith("-") for row in r)


def test_full_right_join_using(planner):
    """r12: RIGHT/FULL JOIN USING — the USING output column is
    COALESCE(left, right), so non-matching rows from either side keep
    their key."""
    rows = planner.sql(
        "select k, a, b from "
        "(select n_nationkey as k, count(*) as a from nation "
        " where n_nationkey < 10 group by n_nationkey) x "
        "full join "
        "(select n_nationkey as k, count(*) as b from nation "
        " where n_nationkey >= 5 group by n_nationkey) y using (k)"
    ).collect()
    got = {r.k: (r.a, r.b) for r in rows}
    assert set(got) == set(range(25))
    assert got[3] == (1, None) and got[20] == (None, 1) and got[7] == (1, 1)
    right = planner.sql(
        "select k, a from "
        "(select n_nationkey as k, count(*) as a from nation "
        " where n_nationkey < 10 group by n_nationkey) x "
        "right join "
        "(select n_nationkey as k from nation "
        " where n_nationkey >= 5) y using (k)"
    ).collect()
    assert {r.k for r in right} == set(range(5, 25))


def test_tablesample_deterministic(planner):
    """r12: TABLESAMPLE is a pure function of the data — the same n
    rows on every run; PERCENT is the hash-bucket share."""
    a = sorted(r.c_custkey for r in planner.sql(
        "select c_custkey from customer tablesample (10 rows)"
    ).collect())
    b = sorted(r.c_custkey for r in planner.sql(
        "select c_custkey from customer tablesample (10 rows)"
    ).collect())
    assert a == b and len(a) == 10
    # the selected set is the smallest-hash prefix: 5 rows ⊂ 10 rows
    c = sorted(r.c_custkey for r in planner.sql(
        "select c_custkey from customer tablesample (5 rows)"
    ).collect())
    assert set(c) <= set(a)
    n_all = planner.sql("select count(*) as n from customer").collect()[0].n
    n_pct = planner.sql(
        "select count(*) as n from customer tablesample (30 percent)"
    ).collect()[0].n
    assert 0 < n_pct < n_all
    from datafusion_dolomite_spark.sql import SqlError
    with pytest.raises(SqlError, match="ROWS|PERCENT"):
        planner.sql("select 1 as x from customer tablesample (10 bananas)")


def test_join_using_missing_column_rejected(planner):
    import pytest

    from datafusion_dolomite_spark.sql import SqlError

    with pytest.raises(SqlError, match="both"):
        planner.sql(
            "select n_name from nation join region using (n_regionkey)"
        )
