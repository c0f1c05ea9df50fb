"""SQL join-strategy hints (r6): ``/*+ BROADCAST(t) | MERGE(t) |
SHUFFLE_HASH(t) */`` pin the strategy for the join whose side IS the
named relation (schema-subset binding — a scan of it, possibly filtered
or pruned).  The user's word beats the cost model, including the
broadcast byte budget; suppression is binding-aware, so a hint that
cannot apply (no equi keys, wrong join type, relation not a bare side)
leaves the race untouched and a join can never lose all its
implementations.  Comments (``--`` and ``/* */``) are stripped by the
same pass."""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark.operators import physical as P
from datafusion_dolomite_spark.sql import parse_sql

BASE = "select count(*) as n from lineitem join supplier on l_suppkey = s_suppkey"


def _join_ops(plan):
    out = []

    def walk(n):
        if isinstance(
            n.operator,
            (P.PhysicalHashJoin, P.PhysicalBroadcastHashJoin, P.PhysicalSortMergeJoin),
        ):
            out.append(n)
        for c in n.inputs:
            walk(c)

    walk(plan.root)
    return out


def _scan_tables(node):
    out = set()

    def walk(n):
        if isinstance(n.operator, P.PhysicalTableScan):
            out.add(n.operator.table_name)
        for c in n.inputs:
            walk(c)

    walk(node)
    return out


def _optimized(planner, catalog, sql):
    return planner.optimize(parse_sql(sql, catalog))


def test_merge_hint_pins_smj(planner, catalog):
    q = BASE.replace("select", "select /*+ MERGE(supplier) */", 1)
    (j,) = _join_ops(_optimized(planner, catalog, q))
    assert isinstance(j.operator, P.PhysicalSortMergeJoin)
    assert j.operator.forced


def test_shuffle_hash_hint_pins_hash_join(planner, catalog):
    q = BASE.replace("select", "select /*+ SHUFFLE_HASH(supplier) */", 1)
    (j,) = _join_ops(_optimized(planner, catalog, q))
    assert type(j.operator) is P.PhysicalHashJoin
    assert j.operator.forced


def test_broadcast_hint_overrides_budget_and_commutes(planner, catalog):
    """BROADCAST(lineitem): the fact side the byte budget would refuse
    must still end up as the broadcast BUILD side (commutation brings
    it to the right)."""
    q = BASE.replace("select", "select /*+ BROADCAST(lineitem) */", 1)
    (j,) = _join_ops(_optimized(planner, catalog, q))
    assert isinstance(j.operator, P.PhysicalBroadcastHashJoin)
    assert "lineitem" in _scan_tables(j.inputs[1])  # build side


def test_unbound_hint_leaves_race_alone(planner, catalog):
    """A hint naming a relation not in the query binds nothing; the
    cost race decides as usual."""
    q = BASE.replace("select", "select /*+ MERGE(part) */", 1)
    (j,) = _join_ops(_optimized(planner, catalog, q))
    assert not getattr(j.operator, "forced", False)


def test_hints_do_not_change_results(planner, catalog, spark):
    plain = planner.sql(BASE).collect()
    for hint in ("BROADCAST(supplier)", "MERGE(supplier)", "SHUFFLE_HASH(supplier)"):
        q = BASE.replace("select", f"select /*+ {hint} */", 1)
        assert planner.sql(q).collect() == plain


def test_plain_comments_stripped(planner):
    rows = planner.sql(
        "select count(*) as n -- line comment\n"
        "from nation /* block\ncomment */ where n_nationkey < 5"
    ).collect()
    assert rows[0]["n"] == 5
