"""Driver contract for the spark-graft builder (PySpark target).

Every query here runs through the FULL engine pipeline:
builder → logical Plan → HepOptimizer (rewrites) → CascadesOptimizer
(cost-based implementation) → ``to_spark`` → DataFrame.  The matching
``oracle_sql()`` entry is ANSI SQL DuckDB runs over the same parquet.

Determinism rules used throughout (the driver hash-compares values):
* no bare LIMIT over multi-row inputs unless preceded by a total order
  with a unique tie-break (or the limit exceeds the table size);
* float SUMs go through ``decimal`` casts on BOTH sides so accumulation
  is exact and engine-independent, then cast back to double;
* every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_dolomite_spark import (
    Alias,
    Cast,
    Func,
    JoinType,
    LogicalPlanBuilder,
    QueryPlanner,
    col,
    lit,
)
from datafusion_dolomite_spark.expr import BinOp, SortKey
from datafusion_dolomite_spark.sources.catalog import testdata_catalog


def _planner(spark: SparkSession, sf_dir: str) -> QueryPlanner:
    return QueryPlanner(spark, testdata_catalog(sf_dir))


def _dec(e):
    return Cast(e, "decimal(12,2)")


def _dsum(e, name):
    """Exact decimal sum surfaced as double (same value in DuckDB)."""
    return Alias(Cast(Func("sum", (e,)), "double"), name)


# ---------------------------------------------------------------------------
# Core relational operators (SURVEY §2.1 parity surface)
# ---------------------------------------------------------------------------

def q_scan_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan with fused limit (deterministic: limit ≥ region's 5 rows;
    exercises PushLimitToTableScanRule end-to-end)."""
    plan = LogicalPlanBuilder().scan("region").limit(100).build()
    return _planner(spark, sf_dir).dataframe(plan)


def q_filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = (
        LogicalPlanBuilder()
        .scan("lineitem")
        .filter(col("l_quantity").lt(lit(5.0)))
        .projection(
            [
                col("l_orderkey"),
                col("l_linenumber"),
                col("l_quantity"),
                Alias(
                    BinOp(
                        "*",
                        _dec(col("l_extendedprice")),
                        BinOp("-", _dec(lit(1)), _dec(col("l_discount"))),
                    ).cast("double"),
                    "disc_price",
                ),
            ]
        )
        .build()
    )
    return _planner(spark, sf_dir).dataframe(plan)


def q_join3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation ⋈ region with a selective filter — exercises the
    cost model's broadcast decision on both dims."""
    plan = (
        LogicalPlanBuilder()
        .scan("customer")
        .join(
            LogicalPlanBuilder().scan("nation"),
            JoinType.INNER,
            col("c_nationkey").eq(col("n_nationkey")),
        )
        .join(
            LogicalPlanBuilder().scan("region"),
            JoinType.INNER,
            col("n_regionkey").eq(col("r_regionkey")),
        )
        .filter(col("c_acctbal").gt(lit(9000.0)))
        .projection([col("c_custkey"), col("c_name"), col("n_name"), col("r_name")])
        .build()
    )
    return _planner(spark, sf_dir).dataframe(plan)


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (pricing summary report) — aggregate extension."""
    disc = BinOp("-", _dec(lit(1)), _dec(col("l_discount")))
    taxp = BinOp("+", _dec(lit(1)), _dec(col("l_tax")))
    plan = (
        LogicalPlanBuilder()
        .scan("lineitem")
        .filter(col("l_shipdate").le(lit("1998-09-02")))
        .aggregate(
            [col("l_returnflag"), col("l_linestatus")],
            [
                _dsum(_dec(col("l_quantity")), "sum_qty"),
                _dsum(_dec(col("l_extendedprice")), "sum_base_price"),
                _dsum(BinOp("*", _dec(col("l_extendedprice")), disc), "sum_disc_price"),
                _dsum(
                    BinOp("*", BinOp("*", _dec(col("l_extendedprice")), disc), taxp),
                    "sum_charge",
                ),
                Alias(Func("count", ()), "count_order"),
            ],
        )
        .build()
    )
    return _planner(spark, sf_dir).dataframe(plan)


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort+Limit fused to TopK (TakeOrderedAndProject, no global sort)."""
    plan = (
        LogicalPlanBuilder()
        .scan("customer")
        .sort([SortKey(col("c_acctbal"), asc=False), SortKey(col("c_custkey"))])
        .limit(10)
        .projection([col("c_custkey"), col("c_name"), col("c_acctbal")])
        .build()
    )
    return _planner(spark, sf_dir).dataframe(plan)


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = (
        LogicalPlanBuilder()
        .scan("customer")
        .projection([col("c_mktsegment")])
        .distinct()
        .build()
    )
    return _planner(spark, sf_dir).dataframe(plan)


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers having an order over 300k."""
    plan = (
        LogicalPlanBuilder()
        .scan("customer")
        .join(
            LogicalPlanBuilder()
            .scan("orders")
            .filter(col("o_totalprice").gt(lit(300000.0))),
            JoinType.LEFT_SEMI,
            col("c_custkey").eq(col("o_custkey")),
        )
        .projection([col("c_custkey"), col("c_name")])
        .build()
    )
    return _planner(spark, sf_dir).dataframe(plan)


def q_agg_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation: lineitem ⋈ supplier ⋈ nation, grouped."""
    plan = (
        LogicalPlanBuilder()
        .scan("lineitem")
        .join(
            LogicalPlanBuilder().scan("supplier"),
            JoinType.INNER,
            col("l_suppkey").eq(col("s_suppkey")),
        )
        .join(
            LogicalPlanBuilder().scan("nation"),
            JoinType.INNER,
            col("s_nationkey").eq(col("n_nationkey")),
        )
        .aggregate(
            [col("n_name")],
            [
                _dsum(
                    BinOp(
                        "*",
                        _dec(col("l_extendedprice")),
                        BinOp("-", _dec(lit(1)), _dec(col("l_discount"))),
                    ),
                    "revenue",
                ),
                Alias(Func("count", ()), "n_items"),
            ],
        )
        .build()
    )
    return _planner(spark, sf_dir).dataframe(plan)


def q_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events rollup — exact aggregates only (count/min/max)."""
    plan = (
        LogicalPlanBuilder()
        .scan("events")
        .aggregate(
            [col("event_type")],
            [
                Alias(Func("count", ()), "n_events"),
                Alias(Func("min", (col("value"),)), "min_value"),
                Alias(Func("max", (col("value"),)), "max_value"),
                Alias(Func("count_distinct", (col("user_id"),)), "n_users"),
            ],
        )
        .build()
    )
    return _planner(spark, sf_dir).dataframe(plan)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_join3(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_scan_limit": q_scan_limit,
        "q_filter_projection": q_filter_projection,
        "q_join3": q_join3,
        "q_tpch_q1": q_tpch_q1,
        "q_topk": q_topk,
        "q_distinct": q_distinct,
        "q_semi_join": q_semi_join,
        "q_agg_join": q_agg_join,
        "q_events_by_type": q_events_by_type,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q_scan_limit": "SELECT r_regionkey, r_name FROM region LIMIT 100",
        "q_filter_projection": """
            SELECT l_orderkey, l_linenumber, l_quantity,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                        AS DOUBLE) AS disc_price
            FROM lineitem WHERE l_quantity < 5.0
        """,
        "q_join3": """
            SELECT c_custkey, c_name, n_name, r_name
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE c_acctbal > 9000.0
        """,
        "q_tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                        AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                            * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))
                        AS DOUBLE) AS sum_charge,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q_topk": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10
        """,
        "q_distinct": "SELECT DISTINCT c_mktsegment FROM customer",
        "q_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (
                SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
        """,
        "q_agg_join": """
            SELECT n_name,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                        AS DOUBLE) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q_events_by_type": """
            SELECT event_type, COUNT(*) AS n_events,
                   MIN(value) AS min_value, MAX(value) AS max_value,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
    }
