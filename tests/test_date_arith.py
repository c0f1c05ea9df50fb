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
