"""LATERAL derived tables (sql.py::_lateral_join /
_decorrelate_lateral): top-N-per-group via inner-side windows,
correlated aggregates via group-by-key joins — never a per-outer-row
re-execution or a cartesian.  DuckDB cross-checks live in
tests/test_entry_oracle.py (q_sql_lateral / q_sql_lateral_agg run the
same string on both engines); these tests pin semantics and the error
surface."""

import re

import pytest

from datafusion_dolomite_spark.sql import SqlError


def _rows(planner, sql):
    return sorted(tuple(r) for r in planner.sql(sql).collect())


def test_topn_per_group(planner):
    rows = planner.sql(
        "select n_nationkey, t.c_custkey from nation, lateral ("
        "  select c_custkey from customer where c_nationkey = n_nationkey"
        "  order by c_acctbal desc, c_custkey limit 3) t"
    ).collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r["n_nationkey"], []).append(r["c_custkey"])
    assert all(len(v) <= 3 for v in per_key.values())
    # replay one group imperatively
    ref = planner.sql(
        "select c_custkey from customer where c_nationkey = 3 "
        "order by c_acctbal desc, c_custkey limit 3"
    ).collect()
    assert sorted(per_key[3]) == sorted(r["c_custkey"] for r in ref)


def test_topn_offset(planner):
    got = _rows(
        planner,
        "select n_nationkey, t.c_custkey from nation, lateral ("
        "  select c_custkey from customer where c_nationkey = n_nationkey"
        "  order by c_acctbal desc, c_custkey limit 2 offset 1) t",
    )
    ref = _rows(
        planner,
        "select n_nationkey, t.c_custkey from nation, lateral ("
        "  select c_custkey from customer where c_nationkey = n_nationkey"
        "  order by c_acctbal desc, c_custkey limit 3) t",
    )
    top1 = _rows(
        planner,
        "select n_nationkey, t.c_custkey from nation, lateral ("
        "  select c_custkey from customer where c_nationkey = n_nationkey"
        "  order by c_acctbal desc, c_custkey limit 1) t",
    )
    assert sorted(got + top1) == sorted(ref)


def test_global_aggregate_keeps_zero_match_rows(planner):
    rows = planner.sql(
        "select c_custkey, s.n from customer, lateral ("
        "  select count(*) as n from orders"
        "  where o_custkey = c_custkey and o_totalprice > 450000"
        ") s where c_custkey <= 100"
    ).collect()
    # every customer row survives (aggregate subquery always yields 1 row)
    assert len(rows) == planner.sql(
        "select c_custkey from customer where c_custkey <= 100"
    ).count()
    # TPC-H: ~1/3 of custkeys have no orders → count coalesces to 0
    assert any(r["n"] == 0 for r in rows)
    assert all(r["n"] is not None for r in rows)


def test_grouped_aggregate_drops_empty_groups(planner):
    rows = planner.sql(
        "select c_custkey, s.st, s.n from customer, lateral ("
        "  select o_orderstatus as st, count(*) as n from orders"
        "  where o_custkey = c_custkey group by o_orderstatus"
        ") s where c_custkey <= 100"
    ).collect()
    # grouped aggregate over zero matches yields zero rows — INNER join
    keys_with_orders = {
        r["o_custkey"]
        for r in planner.sql(
            "select o_custkey from orders where o_custkey <= 100"
        ).collect()
    }
    assert {r["c_custkey"] for r in rows} == keys_with_orders


def test_left_join_lateral_on_true(planner):
    rows = planner.sql(
        "select n_nationkey, t.c_custkey from nation left join lateral ("
        "  select c_custkey from customer"
        "  where c_nationkey = n_nationkey and c_acctbal > 9990"
        "  order by c_acctbal desc, c_custkey limit 1) t on true"
    ).collect()
    assert len({r["n_nationkey"] for r in rows}) == 25
    assert any(r["c_custkey"] is None for r in rows)


def test_uncorrelated_lateral(planner):
    rows = planner.sql(
        "select n_name, t.mx from nation, lateral "
        "(select max(r_regionkey) as mx from region) t"
    ).collect()
    assert len(rows) == 25 and all(r["mx"] == 4 for r in rows)


def test_no_cartesian_no_nlj(planner):
    df = planner.sql(
        "select n_nationkey, t.c_custkey from nation, lateral ("
        "  select c_custkey from customer where c_nationkey = n_nationkey"
        "  order by c_acctbal desc, c_custkey limit 3) t"
    )
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys
    # the top-N lowers to ONE window exchange on the correlation key
    assert "row_number" in phys


def test_output_collision_rejected(planner):
    with pytest.raises(SqlError, match="collide"):
        planner.sql(
            "select n_name from nation, lateral ("
            "  select n_name from nation n2 where n2.n_regionkey = n_regionkey"
            ") x"
        )


def test_limit_without_order_rejected(planner):
    with pytest.raises(SqlError, match="ORDER BY"):
        planner.sql(
            "select n_name, t.c_custkey from nation, lateral ("
            "  select c_custkey from customer"
            "  where c_nationkey = n_nationkey limit 3) t"
        )


def test_correlation_outside_where_rejected(planner):
    with pytest.raises(SqlError, match="WHERE conjuncts"):
        planner.sql(
            "select n.n_name, t.x from nation n, lateral ("
            "  select c_custkey + n.n_nationkey as x from customer limit 1"
            ") t"
        )


def test_full_join_lateral_rejected(planner):
    with pytest.raises(SqlError, match="INNER and LEFT"):
        planner.sql(
            "select n_name from nation full join lateral ("
            "  select c_custkey from customer where c_nationkey = n_nationkey"
            "  order by c_custkey limit 1) t on true"
        )


def test_distinct_in_lateral(planner):
    # per-outer-key distinct: dedup over (outputs + correlation keys)
    got = planner.sql(
        "select n_nationkey, t.seg from nation, lateral ("
        "  select distinct c_mktsegment as seg from customer"
        "  where c_nationkey = n_nationkey) t"
    ).collect()
    pairs = {(r.n_nationkey, r.seg) for r in got}
    assert len(pairs) == len(got)  # deduped per key
    ref = planner.sql(
        "select distinct c_nationkey as k, c_mktsegment as seg "
        "from customer"
    ).collect()
    assert pairs == {(r.k, r.seg) for r in ref}


def test_distinct_limit_in_lateral(planner):
    # LIMIT applies AFTER the per-key DISTINCT (SQL evaluation order)
    got = planner.sql(
        "select n_nationkey, t.seg from nation, lateral ("
        "  select distinct c_mktsegment as seg from customer"
        "  where c_nationkey = n_nationkey "
        "  order by seg limit 2) t"
    ).collect()
    per_key = {}
    for r in got:
        per_key.setdefault(r.n_nationkey, []).append(r.seg)
    assert all(len(set(v)) == len(v) <= 2 for v in per_key.values())
    ref = planner.sql(
        "select distinct c_mktsegment as seg from customer "
        "where c_nationkey = 3 order by seg limit 2"
    ).collect()
    assert sorted(per_key[3]) == sorted(r.seg for r in ref)
    # sort keys must bind to the DISTINCT output
    with pytest.raises(SqlError, match="select-list columns"):
        planner.sql(
            "select n_nationkey, t.seg from nation, lateral ("
            "  select distinct c_mktsegment as seg from customer"
            "  where c_nationkey = n_nationkey "
            "  order by c_acctbal limit 2) t"
        )


def test_distinct_hidden_extras(planner):
    # ADVICE r11 → r13 (VERDICT r12 item 3): DISTINCT + correlated
    # non-equality conjunct whose inner column is NOT in the output
    # would duplicate visible tuples if deduped below the join; now
    # supported via POST-join dedup over (outer rowid, output columns)
    got = planner.sql(
        "select n_nationkey, t.seg from nation, lateral ("
        "  select distinct c_mktsegment as seg from customer"
        "  where c_nationkey = n_nationkey"
        "  and c_acctbal > n_nationkey * 100) t"
    ).collect()
    ref = planner.sql(
        "select distinct c_nationkey as k, c_mktsegment as seg "
        "from customer, nation "
        "where c_nationkey = n_nationkey and c_acctbal > n_nationkey * 100"
    ).collect()
    assert {(r.n_nationkey, r.seg) for r in got} == {
        (r.k, r.seg) for r in ref
    } and len(got) == len(ref)
    # ...DISTINCT + LIMIT in that shape is still cleanly rejected
    # (ranking would have to run after the post-join dedup; the
    # general LIMIT-with-extras guard fires first)
    with pytest.raises(SqlError, match="inner_col = outer_col"):
        planner.sql(
            "select n_nationkey, t.seg from nation, lateral ("
            "  select distinct c_mktsegment as seg from customer"
            "  where c_nationkey = n_nationkey"
            "  and c_acctbal > n_nationkey * 100 "
            "  order by seg limit 2) t"
        )
    # ... but a hidden extra mirrored by a visible bare-column alias is
    # functionally determined by the output tuple — allowed and exact
    got = planner.sql(
        "select n_nationkey, t.seg, t.bal from nation, lateral ("
        "  select distinct c_mktsegment as seg, c_acctbal as bal "
        "  from customer where c_nationkey = n_nationkey"
        "  and c_acctbal > n_nationkey * 100) t"
    ).collect()
    ref = planner.sql(
        "select distinct c_nationkey as k, c_mktsegment as seg, "
        "c_acctbal as bal from customer, nation "
        "where c_nationkey = n_nationkey and c_acctbal > n_nationkey * 100"
    ).collect()
    assert {(r.n_nationkey, r.seg, r.bal) for r in got} == {
        (r.k, r.seg, r.bal) for r in ref
    } and len(got) == len(ref)


def test_with_in_subqueries(planner):
    # WITH scoped to derived tables / LATERAL / scalar / IN subqueries
    got = planner.sql(
        "select k, n from (with base as (select c_nationkey as k "
        "from customer) select k, count(*) as n from base group by k) t"
    )
    assert got.count() == 25
    lat = planner.sql(
        "with big as (select c_custkey as k, c_acctbal as b, "
        "c_nationkey as nk from customer) "
        "select n_nationkey, t.k2 from nation, lateral ("
        "select k as k2 from big where nk = n_nationkey "
        "order by b desc, k limit 2) t"
    )
    assert lat.count() == 50
    # an inner WITH shadows, then the outer binding restores
    sh = planner.sql(
        "with x as (select 1 as a) select a, (select b from "
        "(with x as (select 2 as b) select b from x) t2) as inner_b from x"
    ).collect()
    assert [tuple(r) for r in sh] == [(1, 2)]
