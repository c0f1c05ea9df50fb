"""Parallelism guard for compute-heavy map stages.

Small parquet inputs (single row group) scan as ONE partition, so an
explode/score pipeline placed directly above the scan serializes on one
core no matter how many the session has — AQE only re-plans the stages
AFTER the first shuffle.  ``ensure_min_parallelism`` repartitions the
(narrow) pre-projection only when the input's partition count is below
the session's parallelism.  At cluster scale, where inputs arrive with
thousands of partitions, the condition is false and this is a no-op —
the guard never introduces a shuffle of already-distributed data.

``rows`` (r13 optimization, guide §2 — derive partitioning from input
size, not a constant): callers that KNOW the corpus row count (catalog
statistics, an explicit synthetic-corpus size) pass it, and the target
becomes ``ceil(rows / rows_per_part)`` capped at the session's
parallelism — a 2k-vector recall gate then runs its dozens of
Arrow/shuffle stages on a handful of partitions instead of paying
(cores × stages) task+Arrow round-trips for 64-row batches, while a
billion-row corpus still fans out to every core.  When the input
arrives MORE partitioned than the size warrants, a narrow ``coalesce``
(no shuffle) folds it down.  Row-to-partition placement is never
semantically visible to these pipelines (all downstream folds are
keyed or order-independent), so results are bit-identical either way.
"""

from __future__ import annotations

__all__ = ["ensure_min_parallelism"]


def ensure_min_parallelism(df, rows=None, rows_per_part: int = 512):
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if rows is not None and rows > 0:
        target = max(1, min(target, (int(rows) + rows_per_part - 1) // rows_per_part))
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current < target:
        return df.repartition(target)
    if rows is not None and rows > 0 and current > 2 * target:
        # narrow fold-down: tiny corpora otherwise pay per-task overhead
        # on every downstream non-shuffle stage (AQE only coalesces the
        # post-shuffle ones)
        return df.coalesce(target)
    return df
