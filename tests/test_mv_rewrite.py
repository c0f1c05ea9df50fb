"""RewriteAggOnMaterializedViewRule: aggregate queries answered from a
registered rollup, with exact-expression matching as the safety gate."""

from __future__ import annotations

import os

import pytest

from datafusion_dolomite_spark import LogicalPlanBuilder, QueryPlanner, col, lit
from datafusion_dolomite_spark.expr import Alias, BinOp, Cast, Col, Func, Lit
from datafusion_dolomite_spark.optimizer.rules.mv import MaterializedView

CENTS = Cast(Func("floor", (BinOp("*", Col("value"), Lit(100)),)), "bigint")


@pytest.fixture(scope="module")
def mv_qp(spark, tmp_path_factory):
    from datafusion_dolomite_spark.sources.catalog import testdata_catalog

    cat = testdata_catalog("/root/testdata/sf0.001")
    qp = QueryPlanner(spark, cat)
    mv_plan = (
        LogicalPlanBuilder()
        .scan("events")
        .aggregate(
            [Col("event_type"), Col("user_id")],
            [
                Alias(Func("count", ()), "n"),
                Alias(Func("sum", (CENTS,)), "sum_cents"),
                Alias(Func("max", (Col("value"),)), "max_value"),
            ],
        )
        .build()
    )
    dest = str(tmp_path_factory.mktemp("mv") / "events_mv")
    qp.dataframe(mv_plan).write.mode("overwrite").parquet(dest)
    cat.register("events_mv", dest)
    cat.register_materialized_view(
        MaterializedView(
            name="events_mv",
            source_table="events",
            group_cols=("event_type", "user_id"),
            agg_defs=(
                ("n", Func("count", ())),
                ("sum_cents", Func("sum", (CENTS,))),
                ("max_value", Func("max", (Col("value"),))),
            ),
        )
    )
    return QueryPlanner(spark, cat)


def _agg_plan(filters=None, aggs=None, group=("event_type",)):
    b = LogicalPlanBuilder().scan("events")
    if filters is not None:
        b = b.filter(filters)
    return b.aggregate(
        [Col(g) for g in group],
        list(
            aggs
            or [
                Alias(Func("count", ()), "n_events"),
                Alias(Func("sum", (CENTS,)), "cents"),
            ]
        ),
    ).build()


def test_rewrites_to_mv_scan(mv_qp):
    phys = mv_qp.explain(_agg_plan()).split("== Physical Plan ==")[1]
    assert '"events_mv"' in phys and '"events" }' not in phys, phys
    assert "sum(n) as n_events" in phys and "sum(sum_cents) as cents" in phys


def test_group_col_filter_survives_on_mv(mv_qp):
    plan = _agg_plan(filters=col("event_type").eq(lit("click")))
    phys = mv_qp.explain(plan).split("== Physical Plan ==")[1]
    assert '"events_mv"' in phys, phys
    assert "event_type = 'click'" in phys.replace('"', "'")


def test_non_mv_column_filter_blocks_rewrite(mv_qp):
    plan = _agg_plan(filters=col("value").gt(lit(10.0)))
    phys = mv_qp.explain(plan).split("== Physical Plan ==")[1]
    assert '"events_mv"' not in phys, phys


def test_unmatched_agg_expression_blocks_rewrite(mv_qp):
    # sum(value) was never materialized (only max(value) and the cents
    # sum) — expression-equality matching must refuse
    plan = _agg_plan(aggs=[Alias(Func("sum", (Col("value"),)), "s")])
    phys = mv_qp.explain(plan).split("== Physical Plan ==")[1]
    assert '"events_mv"' not in phys, phys


def test_min_over_max_partial_blocks_rewrite(mv_qp):
    # min(value) does not recombine from a max partial
    plan = _agg_plan(aggs=[Alias(Func("min", (Col("value"),)), "m")])
    phys = mv_qp.explain(plan).split("== Physical Plan ==")[1]
    assert '"events_mv"' not in phys, phys


def test_create_materialized_view_sql_roundtrip(spark):
    """CREATE MATERIALIZED VIEW through the SQL front door: the sink
    derives MV metadata from its own aggregate, later SQL queries
    rewrite onto it, and re-CREATE never reads the table it is about to
    overwrite."""
    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark.sources.catalog import testdata_catalog
    from datafusion_dolomite_spark.sql import parse_sql

    cat = testdata_catalog("/root/testdata/sf0.001")
    qp = QueryPlanner(spark, cat)
    ddl = (
        "CREATE MATERIALIZED VIEW mv_t AS "
        "SELECT event_type, user_id, count(*) AS n, "
        "sum(cast(floor(value * 100) as bigint)) AS sum_cents "
        "FROM events GROUP BY event_type, user_id"
    )
    qp.sql(ddl).count()
    q = (
        "SELECT event_type, count(*) AS n_events, "
        "sum(cast(floor(value * 100) as bigint)) AS cents "
        "FROM events GROUP BY event_type"
    )
    phys = qp.explain(parse_sql(q, cat)).split("== Physical Plan ==")[1]
    assert '"mv_t"' in phys, phys
    first = sorted(map(tuple, qp.sql(q).collect()))
    qp.sql(ddl).count()  # re-create: must not self-read
    assert sorted(map(tuple, qp.sql(q).collect())) == first and first


def test_drop_materialized_view(spark):
    """DROP MATERIALIZED VIEW removes the metadata: the very next query
    plans against the base table again."""
    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark.sources.catalog import testdata_catalog
    from datafusion_dolomite_spark.sql import parse_sql

    cat = testdata_catalog("/root/testdata/sf0.001")
    qp = QueryPlanner(spark, cat)
    qp.sql(
        "CREATE MATERIALIZED VIEW mv_drop AS "
        "SELECT event_type, user_id, count(*) AS n "
        "FROM events GROUP BY event_type, user_id"
    ).count()
    q = "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    assert '"mv_drop"' in qp.explain(parse_sql(q, cat))
    shown = [r["name"] for r in qp.sql("SHOW MATERIALIZED VIEWS").collect()]
    assert "mv_drop" in shown
    qp.sql("DROP MATERIALIZED VIEW mv_drop")
    assert '"mv_drop"' not in qp.explain(parse_sql(q, cat))
    shown = [r["name"] for r in qp.sql("SHOW MATERIALIZED VIEWS").collect()]
    assert "mv_drop" not in shown


def test_create_mv_with_where_stays_plain_table(spark):
    """A filtered definition is NOT a whole-table rollup — it must
    persist as a plain table and never capture later queries."""
    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark.sources.catalog import testdata_catalog
    from datafusion_dolomite_spark.sql import parse_sql

    cat = testdata_catalog("/root/testdata/sf0.001")
    qp = QueryPlanner(spark, cat)
    qp.sql(
        "CREATE MATERIALIZED VIEW mv_clicks AS "
        "SELECT event_type, user_id, count(*) AS n FROM events "
        "WHERE event_type = 'click' GROUP BY event_type, user_id"
    ).count()
    q = "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    phys = qp.explain(parse_sql(q, cat)).split("== Physical Plan ==")[1]
    assert '"mv_clicks"' not in phys, phys


def test_cost_picks_smallest_applicable_mv(spark, tmp_path):
    """Two MVs match the same query (fine: (event_type, user_id), coarse:
    (event_type)); both alternatives enter the memo and the cost model
    must choose the coarser (5-row) one."""
    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark.sources.catalog import testdata_catalog

    cat = testdata_catalog("/root/testdata/sf0.001")
    qp0 = QueryPlanner(spark, cat)
    for name, keys in (
        ("mv_fine", [Col("event_type"), Col("user_id")]),
        ("mv_coarse", [Col("event_type")]),
    ):
        plan = (
            LogicalPlanBuilder()
            .scan("events")
            .aggregate(
                keys,
                [
                    Alias(Func("count", ()), "n"),
                    Alias(Func("sum", (CENTS,)), "sum_cents"),
                ],
            )
            .build()
        )
        dest = str(tmp_path / name)
        qp0.dataframe(plan).write.mode("overwrite").parquet(dest)
        cat.register(name, dest)
        cat.register_materialized_view(
            MaterializedView(
                name=name,
                source_table="events",
                group_cols=tuple(k.name for k in keys),
                agg_defs=(
                    ("n", Func("count", ())),
                    ("sum_cents", Func("sum", (CENTS,))),
                ),
            )
        )
    qp = QueryPlanner(spark, cat)
    q = (
        LogicalPlanBuilder()
        .scan("events")
        .aggregate(
            [Col("event_type")],
            [
                Alias(Func("count", ()), "n_events"),
                Alias(Func("sum", (CENTS,)), "cents"),
            ],
        )
        .build()
    )
    phys = qp.explain(q).split("== Physical Plan ==")[1]
    assert '"mv_coarse"' in phys and '"mv_fine"' not in phys, phys
    got = sorted(map(tuple, qp.dataframe(q).collect()))
    want = sorted(
        map(
            tuple,
            QueryPlanner(
                spark, testdata_catalog("/root/testdata/sf0.001")
            ).dataframe(q).collect(),
        )
    )
    assert got == want and got


def test_avg_recombines_from_sum_and_count_partials(spark, tmp_path):
    """avg(x) rewrites only when the MV stored BOTH sum(x) and count(x)
    (count(*) does not qualify — NULLs must stay excluded)."""
    import math

    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark.sources.catalog import testdata_catalog

    cat = testdata_catalog("/root/testdata/sf0.001")
    qp0 = QueryPlanner(spark, cat)
    val = Col("value")
    mv_plan = (
        LogicalPlanBuilder()
        .scan("events")
        .aggregate(
            [Col("event_type"), Col("user_id")],
            [
                Alias(Func("sum", (val,)), "s_val"),
                Alias(Func("count", (val,)), "c_val"),
            ],
        )
        .build()
    )
    dest = str(tmp_path / "avg_mv")
    qp0.dataframe(mv_plan).write.mode("overwrite").parquet(dest)
    cat.register("avg_mv", dest)
    cat.register_materialized_view(
        MaterializedView(
            name="avg_mv",
            source_table="events",
            group_cols=("event_type", "user_id"),
            agg_defs=(
                ("s_val", Func("sum", (val,))),
                ("c_val", Func("count", (val,))),
            ),
        )
    )
    qp = QueryPlanner(spark, cat)
    q = (
        LogicalPlanBuilder()
        .scan("events")
        .aggregate(
            [Col("event_type")], [Alias(Func("avg", (val,)), "avg_val")]
        )
        .build()
    )
    phys = qp.explain(q).split("== Physical Plan ==")[1]
    assert '"avg_mv"' in phys and "(sum(s_val) / sum(c_val))" in phys, phys
    got = {r[0]: r[1] for r in qp.dataframe(q).collect()}
    want = {
        r[0]: r[1]
        for r in QueryPlanner(spark, testdata_catalog("/root/testdata/sf0.001"))
        .dataframe(q)
        .collect()
    }
    assert set(got) == set(want) and got
    for k in got:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), k


def test_sketch_mv_reaggregation(spark, tmp_path):
    """approx_count_distinct answered by UNIONING stored HLL sketches
    (the Druid-style re-aggregable rollup): the rewritten plan scans the
    MV, and the estimate lands within the sketch's error class of the
    exact distinct count."""
    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark.sources.catalog import testdata_catalog

    cat = testdata_catalog("/root/testdata/sf0.001")
    qp0 = QueryPlanner(spark, cat)
    mv_plan = (
        LogicalPlanBuilder()
        .scan("events")
        .aggregate(
            [Col("event_type"), Col("user_id")],
            [
                Alias(Func("count", ()), "n"),
                Alias(Func("hll_sketch_agg", (Col("event_id"),)), "ev_sketch"),
            ],
        )
        .build()
    )
    dest = str(tmp_path / "sk_mv")
    qp0.dataframe(mv_plan).write.mode("overwrite").parquet(dest)
    cat.register("sk_mv", dest)
    cat.register_materialized_view(
        MaterializedView(
            name="sk_mv",
            source_table="events",
            group_cols=("event_type", "user_id"),
            agg_defs=(
                ("n", Func("count", ())),
                ("ev_sketch", Func("hll_sketch_agg", (Col("event_id"),))),
            ),
            sketch_rewrite=True,
        )
    )
    qp = QueryPlanner(spark, cat)
    q = (
        LogicalPlanBuilder()
        .scan("events")
        .aggregate(
            [Col("event_type")],
            [
                Alias(Func("count", ()), "n_events"),
                Alias(
                    Func("approx_count_distinct", (Col("event_id"),)),
                    "approx_ids",
                ),
            ],
        )
        .build()
    )
    phys = qp.explain(q).split("== Physical Plan ==")[1]
    assert '"sk_mv"' in phys and "hll_union_agg" in phys, phys
    import pyspark.sql.functions as F

    exact = {
        r[0]: r[1]
        for r in spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy("event_type")
        .agg(F.count_distinct("event_id"))
        .collect()
    }
    for r in qp.dataframe(q).collect():
        assert abs(r["approx_ids"] - exact[r["event_type"]]) <= max(
            0.15 * exact[r["event_type"]], 3
        ), r


def test_join_view_subtree_matching(spark):
    """Denormalized MV over a JOIN: a coarser aggregate over the SAME
    normalized join subtree rewrites onto it (semantic_eq matching);
    a filtered variant of the query does not match."""
    from datafusion_dolomite_spark import QueryPlanner
    from datafusion_dolomite_spark.sources.catalog import testdata_catalog
    from datafusion_dolomite_spark.sql import parse_sql

    cat = testdata_catalog("/root/testdata/sf0.001")
    qp = QueryPlanner(spark, cat)
    qp.sql(
        "CREATE MATERIALIZED VIEW mv_join AS "
        "SELECT c_nationkey, o_orderstatus, count(*) AS n, "
        "sum(cast(floor(o_totalprice) as bigint)) AS total "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_nationkey, o_orderstatus"
    ).count()
    q = (
        "SELECT c_nationkey, count(*) AS n_orders, "
        "cast(sum(cast(floor(o_totalprice) as bigint)) as bigint) AS total "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_nationkey"
    )
    phys = qp.explain(parse_sql(q, cat)).split("== Physical Plan ==")[1]
    assert '"mv_join"' in phys and "Join" not in phys, phys
    got = sorted(map(tuple, qp.sql(q).collect()))
    # base-plan answer from a planner that has no MVs registered
    want = sorted(
        map(tuple, QueryPlanner(spark, testdata_catalog(
            "/root/testdata/sf0.001")).sql(q).collect())
    )
    assert got == want and got
    # an extra WHERE changes the subtree -> no match
    q2 = (
        "SELECT c_nationkey, count(*) AS n FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE o_orderstatus = 'F' GROUP BY c_nationkey"
    )
    phys2 = qp.explain(parse_sql(q2, cat)).split("== Physical Plan ==")[1]
    assert '"mv_join"' not in phys2, phys2


def test_mv_answers_match_base_table(spark, mv_qp, planner):
    plan = _agg_plan(
        aggs=[
            Alias(Func("count", ()), "n_events"),
            Alias(Func("sum", (CENTS,)), "cents"),
            Alias(Func("max", (Col("value"),)), "mx"),
        ]
    )
    got = sorted(map(tuple, mv_qp.dataframe(plan).collect()))
    want = sorted(map(tuple, planner.dataframe(plan).collect()))
    assert got == want and got
