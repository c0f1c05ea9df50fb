"""Cost-raced embedding normalize/truncate/quantize (VERDICT r6 item 6).

``LogicalEmbedQuantize`` has two physical strategies: HOF-lambda SQL
(JVM, interpreted per element) and Arrow-batched numpy (one vectorized
pass, pays the Python worker/transfer overhead once).  The cost model
charges rows x dim at each strategy's rate, so the race flips on real
size: embeddings (500 x 64) pick pandas, a tiny 4-dim table keeps SQL.
Both strategies produce BIT-IDENTICAL output (the numpy norm reproduces
the SQL fold's left-to-right IEEE order) — pinned by exact equality.
"""

from __future__ import annotations

import pytest

from datafusion_dolomite_spark import LogicalPlanBuilder, QueryPlanner
from datafusion_dolomite_spark import testdata_catalog as _testdata_catalog
from datafusion_dolomite_spark.operators.extensions import (
    PhysicalEmbedQuantizePandas,
    PhysicalEmbedQuantizeSql,
)
from datafusion_dolomite_spark.sources.catalog import Catalog

from .conftest import SF_DIR_ORACLE


def _root(plan):
    return plan.root.operator


def _plan(table, dim):
    return (
        LogicalPlanBuilder()
        .scan(table)
        .embed_quantize("vec_id", "embedding", prefix_dim=min(16, dim), dim=dim)
        .build()
    )


def test_embeddings_flip_to_pandas(spark):
    qp = QueryPlanner(spark, _testdata_catalog(SF_DIR_ORACLE))
    phys = qp.optimize(_plan("embeddings", 64))
    assert isinstance(_root(phys), PhysicalEmbedQuantizePandas), phys.explain()


@pytest.fixture(scope="module")
def tiny_cat(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("tinyvec")
    rows = [(i, [float(i + j) / 10.0 for j in range(4)]) for i in range(100)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(str(base / "tiny"))
    cat = Catalog()
    cat.register("tiny", str(base / "tiny"))
    return cat


def test_tiny_table_stays_sql(spark, tiny_cat):
    """100 rows x 4 dims: the Python worker overhead outweighs the
    interpreted-lambda cost — SQL must win (no blanket pandas)."""
    qp = QueryPlanner(spark, tiny_cat)
    phys = qp.optimize(_plan("tiny", 4))
    assert isinstance(_root(phys), PhysicalEmbedQuantizeSql), phys.explain()


def test_strategies_bit_identical(spark):
    """The two strategies must agree EXACTLY — including the norm's
    floor(x*1e6) digit, which only survives if the numpy path replays
    the SQL fold's operation order."""
    from datafusion_dolomite_spark.functions.embedding import (
        embed_quantize_pandas,
        embed_quantize_sql,
    )

    df = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    a = sorted(map(tuple, embed_quantize_sql(df, "vec_id", "embedding", 16).collect()))
    b = sorted(map(tuple, embed_quantize_pandas(df, "vec_id", "embedding", 16).collect()))
    assert a == b and len(a) == df.count()
