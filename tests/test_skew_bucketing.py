"""Skew-salted aggregation + bucketed co-located joins."""

import contextlib
import io
import os

import pytest

from datafusion_dolomite_spark import LogicalPlanBuilder, col


def _plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_aggregate_matches_plain(planner, spark):
    from pyspark.sql import functions as F

    from datafusion_dolomite_spark.functions.skew import salted_aggregate

    df = planner.dataframe(LogicalPlanBuilder().scan("events").build())
    salted = salted_aggregate(
        df,
        ["event_type"],
        [("count", "*", "n"), ("sum", "user_id", "uid_sum"),
         ("min", "event_id", "min_id"), ("max", "event_id", "max_id")],
        n_salts=16,
    )
    plain = df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("uid_sum"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )
    got = sorted(tuple(r) for r in salted.collect())
    want = sorted(tuple(r) for r in plain.collect())
    assert got == want


def test_salted_aggregate_rejects_non_decomposable(planner):
    from datafusion_dolomite_spark.functions.skew import salted_aggregate

    df = planner.dataframe(LogicalPlanBuilder().scan("events").build())
    with pytest.raises(ValueError, match="not decomposable"):
        salted_aggregate(df, ["event_type"], [("avg", "value", "a")])


def test_bucketed_join_avoids_shuffle(planner, spark, tmp_path):
    """Two tables bucketed on the join key join WITHOUT any shuffle
    exchange — the co-located join layout for repeated large-large joins
    (bucket once, join many times for free)."""
    warehouse_db = "bucketdemo"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (f"{warehouse_db}_orders", f"{warehouse_db}_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # in-memory metastore forgets tables between sessions but the
        # warehouse dir survives — remove stale locations too
        import shutil

        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)

    orders = planner.dataframe(LogicalPlanBuilder().scan("orders").build())
    lineitem = planner.dataframe(
        LogicalPlanBuilder()
        .scan("lineitem", columns=["l_orderkey", "l_quantity"])
        .build()
    )
    from datafusion_dolomite_spark.sources.sinks import write_bucketed_table

    write_bucketed_table(
        orders, f"{warehouse_db}_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"]
    )
    write_bucketed_table(
        lineitem,
        f"{warehouse_db}_lineitem",
        ["l_orderkey"],
        8,
        sort_by=["l_orderkey"],
    )

    a = spark.table(f"{warehouse_db}_orders")
    b = spark.table(f"{warehouse_db}_lineitem")
    joined = a.hint("merge").join(b, a["o_orderkey"] == b["l_orderkey"])
    text = _plan_text(joined)
    assert "SortMergeJoin" in text
    assert "Exchange" not in text  # co-located: zero shuffle
    assert joined.count() > 0
    spark.sql(f"DROP TABLE IF EXISTS {warehouse_db}_orders")
    spark.sql(f"DROP TABLE IF EXISTS {warehouse_db}_lineitem")
