"""Size-derived parallelism (r13 optimization, guide §2).

``ensure_min_parallelism(df, rows=...)`` derives its partition target
from the known corpus size instead of blindly fanning tiny inputs out
to every core — and, symmetrically, folds an over-partitioned tiny
input down with a narrow coalesce.  Results must be bit-identical
either way (everything downstream of the guard is keyed or
order-independent).
"""

from pyspark.sql import functions as F

from datafusion_dolomite_spark.functions._parallel import ensure_min_parallelism


def test_rows_hint_caps_fanout(spark):
    one = spark.range(0, 100, 1, 1).select(F.col("id"))
    out = ensure_min_parallelism(one, rows=100)
    # 100 rows / 512 per part -> 1 partition, NOT defaultParallelism
    assert out.rdd.getNumPartitions() == 1


def test_rows_hint_coalesces_down(spark):
    wide = spark.range(0, 1000, 1, 8).select(F.col("id"))
    out = ensure_min_parallelism(wide, rows=1000)
    # ceil(1000/512) = 2 target; 8 > 2*2 -> narrow coalesce to 2
    assert out.rdd.getNumPartitions() == 2


def test_rows_hint_scales_up_with_corpus(spark):
    one = spark.range(0, 100, 1, 1).select(F.col("id"))
    out = ensure_min_parallelism(one, rows=10_000_000)
    # huge corpus -> full session parallelism (cluster shape unchanged)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_no_hint_behaviour_unchanged(spark):
    one = spark.range(0, 100, 1, 1).select(F.col("id"))
    out = ensure_min_parallelism(one)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    wide = spark.range(0, 100, 1, spark.sparkContext.defaultParallelism)
    assert (
        ensure_min_parallelism(wide).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_knn_results_partition_independent(spark):
    """knn_brute with/without the corpus_rows hint returns identical
    rows — the guard only moves partition boundaries, never values."""
    from datafusion_dolomite_spark.functions.similarity import knn_brute

    df = spark.range(0, 256, 1, 8).select(
        F.col("id").alias("vid"),
        F.expr(
            "transform(sequence(0, 15), d -> "
            "cast(pmod(id * 31 + d * 7, 97) as double) / 97.0D)"
        ).alias("vec"),
    )
    base = sorted(
        tuple(r)
        for r in knn_brute(df, "vid", "vec", n_queries=4, k=5).collect()
    )
    hinted = sorted(
        tuple(r)
        for r in knn_brute(
            df, "vid", "vec", n_queries=4, k=5, corpus_rows=256
        ).collect()
    )
    assert base == hinted
