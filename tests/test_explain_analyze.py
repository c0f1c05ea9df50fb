"""EXPLAIN ANALYZE (r6): per-operator estimated vs actual rows."""

from __future__ import annotations

import re

from datafusion_dolomite_spark.sql import parse_sql


def test_annotations_and_root_count(planner, catalog):
    q = (
        "select n_name, count(*) as n from customer "
        "join nation on c_nationkey = n_nationkey group by n_name"
    )
    text = planner.explain_analyze(parse_sql(q, catalog))
    lines = text.splitlines()
    # every operator line carries an est/act annotation
    assert all(re.search(r"\[rows est=\d+ act=", ln) for ln in lines), text
    # root actual equals the query's real row count
    root_act = int(re.search(r"act=(\d+)", lines[0]).group(1))
    assert root_act == planner.sql(q).count()
    # the scans show the real table cardinalities
    assert re.search(r'"nation" \}\s+\[rows est=25 act=25', text)


def test_estimates_differ_from_actuals_on_filters(planner, catalog):
    """A filtered scan shows the MODELED selectivity next to reality —
    the diff EXPLAIN ANALYZE exists to expose."""
    q = "select count(*) as n from customer where c_acctbal > 0.0"
    text = planner.explain_analyze(parse_sql(q, catalog))
    m = re.search(r"filters.*\[rows est=(\d+) act=(\d+)", text)
    assert m, text
    est, act = int(m.group(1)), int(m.group(2))
    assert act > 0 and est > 0  # both populated; exact equality not required


def test_sql_front_door(planner):
    rows = planner.sql(
        "explain analyze select count(*) as n from region"
    ).collect()
    assert any("act=" in r["plan"] for r in rows)


def test_recursive_step_annotated_dash(planner, catalog):
    """The step inside a recursive CTE cannot execute standalone (its
    CTE ref binds only inside the fixpoint) — annotated act=-, the rest
    of the plan still profiles."""
    q = (
        "with recursive seq(n) as ("
        "  select n from (values (1)) as t0(n) "
        "  union all select n + 1 from seq where n < 5) "
        "select count(*) as c from seq"
    )
    text = planner.explain_analyze(parse_sql(q, catalog))
    assert "act=-" in text, text
    assert re.search(r"^PhysicalHashAggregate.*act=1 ", text), text
