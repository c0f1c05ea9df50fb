"""Parallelism guard for compute-heavy map stages.

Small parquet inputs (single row group) scan as ONE partition, so an
explode/score pipeline placed directly above the scan serializes on one
core no matter how many the session has — AQE only re-plans the stages
AFTER the first shuffle.  ``ensure_min_parallelism`` repartitions the
(narrow) pre-projection only when the input's partition count is below
the session's parallelism.  At cluster scale, where inputs arrive with
thousands of partitions, the condition is false and this is a no-op —
the guard never introduces a shuffle of already-distributed data.
"""

from __future__ import annotations

__all__ = ["ensure_min_parallelism"]


def ensure_min_parallelism(df):
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current < target:
        return df.repartition(target)
    return df
