"""datafusion_dolomite_spark — a PySpark-native rebuild of the
capabilities of ``datafusion-contrib/datafusion-dolomite``.

The reference is an experimental query-optimizer framework for DataFusion
(heuristic fixed-point + Cascades CBO; see SURVEY.md).  This package is
the same idea re-expressed Spark-first: a Python logical-plan IR + the
two optimizer frameworks, with Apache Spark playing the executor role
DataFusion plays there — plus the extended operator surface (aggregates,
sorts, dedup, similarity search, text analysis, multimodal plumbing) the
reference lacks.

Quick start::

    from datafusion_dolomite_spark import (
        LogicalPlanBuilder, QueryPlanner, col, lit, testdata_catalog,
    )
    from datafusion_dolomite_spark.session import get_spark

    spark = get_spark()
    catalog = testdata_catalog("/root/testdata/sf0.001")
    plan = (
        LogicalPlanBuilder()
        .scan("lineitem")
        .filter(col("l_quantity").lt(10.0))
        .projection([col("l_orderkey"), col("l_quantity")])
        .limit(5)
        .build()
    )
    df = QueryPlanner(spark, catalog).dataframe(plan)
"""

from .expr import Alias, BinOp, Cast, Col, Func, Lit, SortKey, col, lit
from .operators.logical import JoinType
from .planner import QueryPlanner, default_cascades_rules, default_rewrite_rules
from .plans.plan import LogicalPlanBuilder, Plan, PlanNode
from .sources.catalog import Catalog, testdata_catalog

__version__ = "0.1.0"

__all__ = [
    "Alias",
    "BinOp",
    "Cast",
    "Col",
    "Func",
    "Lit",
    "SortKey",
    "col",
    "lit",
    "JoinType",
    "QueryPlanner",
    "default_cascades_rules",
    "default_rewrite_rules",
    "LogicalPlanBuilder",
    "Plan",
    "PlanNode",
    "Catalog",
    "testdata_catalog",
]
