"""PushFilterThroughWindowRule: QUALIFY conjuncts on partition keys run
below the window (and fuse into the scan); window-output conjuncts stay
above."""

from __future__ import annotations

from datafusion_dolomite_spark.sql import parse_sql

Q = (
    "SELECT c_nationkey, c_custkey, "
    "row_number() OVER (PARTITION BY c_nationkey "
    "ORDER BY c_acctbal DESC, c_custkey) AS rnk "
    "FROM customer QUALIFY rnk <= 2 AND c_nationkey < 10"
)


def test_partition_key_conjunct_reaches_the_scan(planner, catalog):
    plan = planner.optimize_logical(parse_sql(Q, catalog))
    text = plan.explain()
    # pushed all the way into the scan's fused filters...
    assert 'LogicalScan { table_name: "customer", filters: [(c_nationkey < 10)]' in text
    # ...while the window-output conjunct stays above the window
    above, below = text.split("LogicalWindow", 1)
    assert "rnk <= 2" in above and "c_nationkey < 10" not in above
    assert "c_nationkey < 10" in below


def test_mixed_qualify_results_unchanged(spark, planner):
    got = sorted(map(tuple, planner.sql(Q).collect()))
    # reference: compute without QUALIFY, filter in Spark directly
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    want = sorted(
        map(
            tuple,
            c.withColumn("rnk", F.row_number().over(w))
            .filter("rnk <= 2 AND c_nationkey < 10")
            .select("c_nationkey", "c_custkey", "rnk")
            .collect(),
        )
    )
    assert got == want and got


def test_order_only_window_blocks_pushdown(planner, catalog):
    """No PARTITION BY — no conjunct is partition-constant, nothing may
    move below the window."""
    q = (
        "SELECT c_custkey, "
        "row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rnk "
        "FROM customer QUALIFY rnk <= 5 AND c_custkey < 100"
    )
    text = planner.optimize_logical(parse_sql(q, catalog)).explain()
    _, below = text.split("LogicalWindow", 1)
    assert "c_custkey < 100" not in below
